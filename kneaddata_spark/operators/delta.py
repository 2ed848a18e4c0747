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
