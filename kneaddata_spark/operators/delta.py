"""Snapshot-delta operators: diff two corpus snapshots into
added / removed / changed rows.

The production shape for a continuously-refreshed training corpus: each
crawl/ingest cycle produces a new snapshot, and every downstream stage
(dedup index refresh, re-embedding, re-scoring) wants only the DELTA,
not a full recompute. The reference's closest analog is the
update_temp_output_files bookkeeping (utilities.py:407-442) that tracks
which intermediate files changed between stages — here lifted to
row-level content diffing.

Scale shape: each side is reduced to (id, md5-of-payload) BEFORE the
join, so only ids + 32-char hashes shuffle (Catalyst prunes the payload
columns out of the scan — verified in the plan audit). The full-outer
join is a plain equi-join on id: with both snapshots stored bucketed by
id (the incremental_dedup bucketBy(h) pattern, plan-proven in
tests/test_operators.py::test_incremental_dedup_bucketed_seen_side_no_exchange)
it is exchange-free; unbucketed it is one sort-merge shuffle per side.
Unchanged rows — the overwhelming majority at 100 TB — are filtered
before anything is emitted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ASCII unit separator: unambiguous payload-column delimiter (a payload
# value containing the separator would otherwise alias a column split)
_SEP = "\x1f"


def _content_hash(payload_cols: "tuple[str, ...]"):
    return F.md5(F.concat_ws(_SEP, *[F.col(c).cast("string") for c in payload_cols]))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    payload_cols: "tuple[str, ...]" = ("text",),
    include_unchanged: bool = False,
) -> DataFrame:
    """(id, change) for change in {'added','removed','changed'}
    (+ 'unchanged' when include_unchanged): rows only in `new` are
    added, only in `old` are removed, in both with differing
    md5(payload) are changed.

    md5 over concat_ws(US, payload...) is portable to the DuckDB oracle
    verbatim; casting payload columns to string keeps the hash stable
    across numeric widths.
    """
    o = old.select(F.col(id_col), _content_hash(payload_cols).alias("__oh"))
    n = new.select(F.col(id_col), _content_hash(payload_cols).alias("__nh"))
    j = o.join(n, id_col, "full_outer")
    change = (
        F.when(F.col("__oh").isNull(), F.lit("added"))
        .when(F.col("__nh").isNull(), F.lit("removed"))
        .when(F.col("__oh") != F.col("__nh"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(F.col(id_col), change.alias("change"))
    if not include_unchanged:
        out = out.where(F.col("change") != "unchanged")
    return out


def snapshot_diff_counts(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    payload_cols: "tuple[str, ...]" = ("text",),
) -> DataFrame:
    """One row per change kind with its count — the delta dashboard
    number (and a cheap pre-flight: a 'removed' spike on a corpus that
    only ever grows is an upstream-ingest alarm before any downstream
    stage runs)."""
    return (
        snapshot_diff(old, new, id_col, payload_cols, include_unchanged=True)
        .groupBy("change")
        .agg(F.count("*").cast("long").alias("n"))
    )


def distribution_drift(
    a: DataFrame,
    b: DataFrame,
    value_expr: str,
    bucket_width: int = 8,
    max_buckets: int = 64,
) -> DataFrame:
    """Ingest drift monitor: compare an integer statistic's distribution
    between two corpus snapshots as per-bucket cumulative permilles —
    max(abs_diff_permille) over the output IS the (integer,
    bucket-quantized) Kolmogorov-Smirnov statistic, the alarm a
    continuous-ingest pipeline watches ("today's crawl suddenly skews
    short"). Snapshot-family sibling of snapshot_diff: diff answers WHAT
    changed row-wise, this answers whether the SHAPE changed.

    Scale shape: each snapshot reduces to a <= max_buckets-row histogram
    in ONE combinable agg (the only corpus-sized pass; persist_tracked so
    the downstream self-join does not rescan either corpus); cumulative
    sums via the triangular broadcast self-join over the tiny bucket
    frame (the threshold_sweep pattern — never a global running-total
    window); totals ride as a broadcast 1-row frame. Integer permille
    throughout (div discipline). Evaluating the CDF gap only at observed
    buckets is exact: both CDFs are step functions whose jumps all lie
    in the observed-bucket union.

    Output: (bucket, n_a, n_b, cum_a_permille, cum_b_permille,
    abs_diff_permille), bucket = least(value div bucket_width,
    max_buckets - 1).
    """
    from .caching import persist_tracked

    def hist(df, alias):
        return (
            df.select(
                F.expr(
                    f"least(cast(({value_expr}) as bigint) div {int(bucket_width)}, "
                    f"{int(max_buckets) - 1})"
                ).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias(alias))
        )

    h = persist_tracked(
        hist(a, "n_a")
        .join(hist(b, "n_b"), "bucket", "full_outer")
        .fillna(0, ["n_a", "n_b"])
    )
    h2 = h.select(
        F.col("bucket").alias("__b2"),
        F.col("n_a").alias("__a2"),
        F.col("n_b").alias("__b2n"),
    )
    cum = (
        h.join(F.broadcast(h2), F.col("__b2") <= F.col("bucket"))
        .groupBy("bucket", "n_a", "n_b")
        .agg(
            F.sum("__a2").cast("long").alias("cum_a"),
            F.sum("__b2n").cast("long").alias("cum_b"),
        )
    )
    tot = h.groupBy().agg(
        F.sum("n_a").cast("long").alias("__ta"), F.sum("n_b").cast("long").alias("__tb")
    )
    return (
        cum.join(F.broadcast(tot))
        .select(
            "bucket",
            "n_a",
            "n_b",
            F.expr("cum_a * 1000 div __ta").alias("cum_a_permille"),
            F.expr("cum_b * 1000 div __tb").alias("cum_b_permille"),
            F.expr(
                "abs(cum_a * 1000 div __ta - cum_b * 1000 div __tb)"
            ).alias("abs_diff_permille"),
        )
    )


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_col: str,
) -> DataFrame:
    """MERGE INTO semantics (the Iceberg/Delta upsert) as a plain
    DataFrame op: rows of ``updates`` replace same-key rows of ``target``
    (matched -> UPDATE), new keys append (not matched -> INSERT), all
    other target rows pass through untouched. The corpus-maintenance verb
    snapshot_diff's output feeds: applying re-transcriptions, corrected
    labels, or re-scored QC columns without a full rewrite. Schemas must
    match (unionByName enforces it).

    Duplicate keys: ``updates`` must be key-unique (raise-by-count is the
    caller's contract — a window dedup here would silently pick one); a
    key-unique updates frame guarantees output key-cardinality ==
    |target keys ∪ update keys|.

    Scale shape: one left_anti equi-join (target minus touched keys) +
    union — the update side is typically a tiny fraction of the corpus,
    so AQE broadcasts it and the TARGET NEVER SHUFFLES; with both sides
    bucketed by key (the incremental_dedup pattern) even the anti-join is
    exchange-free. The atomic publish (stage + directory swap) is
    maintenance.compact_small_files' machinery; this operator is the
    row-semantics half.
    """
    untouched = target.join(
        updates.select(F.col(key_col)).distinct(), key_col, "left_anti"
    )
    return untouched.unionByName(updates)
