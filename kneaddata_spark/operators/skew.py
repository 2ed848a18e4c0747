"""Skew handling — the north_rule's "explicit salting for skewed
language/codec buckets" as first-class operators.

The clip corpus is deliberately skewed (en≈58% of langs, pcm_s16le≈52% of
codecs; synth.py LANG_P/CODEC_P), mirroring real web corpora. Two tools:

- ``salted_join``: equi-join a skewed fact table to a small dimension
  without one reducer owning the hot key: the fact side gets a random-but-
  deterministic salt in [0, n_salts); the dim side is exploded n_salts
  ways; the join key becomes (key, salt), splitting each hot key across
  n_salts reducers. Result identical to the plain join (oracle-checked).
  At broadcast-able dim sizes prefer broadcast(dim) — salting is for when
  BOTH the dim is too big to broadcast AND keys are skewed (else AQE's
  skew-join handles sort-merge skew automatically; this operator is the
  explicit, planner-independent form).
- ``salted_group_count``: two-phase aggregation by a skewed key with an
  explicit salt (partial per (key, salt), then final per key). Spark's
  hash aggregation already does map-side partial combine; the explicit
  form exists for parity with the north_rule and for aggregations where
  partial combine is disabled (e.g. collect_list-style).

Salt derivation is deterministic (xxhash64 of the row id) so reruns are
idempotent — no rand() in the plan (rand breaks retry determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join fact⋈dim on `key`, splitting each (possibly hot) key across
    n_salts partitions. `salt_src` is a high-cardinality fact column the
    deterministic salt derives from (e.g. the row id).

    Only fact-preserving joins are equivalence-preserving: the dim side is
    exploded n_salts ways, so a right/full outer join would emit every
    UNMATCHED dim row n_salts times (ADVICE r1)."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not fact-preserving — unmatched dim "
            f"rows would be duplicated n_salts times; use one of {sorted(allowed)}"
        )
    f = fact.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)))
    d = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = f.join(d, [key, "__salt"], how)
    return out.drop("__salt")


def salted_group_count(
    df: DataFrame, key: str, salt_src: str, n_salts: int = 8
) -> DataFrame:
    """count(*) by skewed `key` via explicit two-phase (salted) aggregation:
    groupBy(key, salt) partials, then groupBy(key) final sum."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "__salt").agg(F.count("*").alias("__n"))
    return partial.groupBy(key).agg(F.sum("__n").alias("n"))


def salted_topk_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    k: int,
    salt_src: str,
    n_salts: int = 8,
) -> DataFrame:
    """Top-k rows per group WITHOUT funneling a hot group through one
    window task (VERDICT r2 #3: Window.partitionBy(lang) on a 58%-skewed
    key sends the hot group's every row to ONE task at scale).

    Two-phase: rank within (group, salt) and keep k per salt cell — the hot
    group's rows split across n_salts tasks — then rank the <= n_salts*k
    survivors per group (bounded fan-in regardless of group skew). Result
    is IDENTICAL to the single-window top-k: any row in the group-wide
    top-k is a fortiori in the top-k of its salt cell, so phase 1 never
    discards a final-answer row. `order_cols` must be a deterministic total
    order (ties broken by a unique column) for retry idempotency."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts))
    )
    w1 = Window.partitionBy(group_col, "__salt").orderBy(*order_cols)
    survivors = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        survivors.withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def hot_keys(
    df: DataFrame,
    cols: "list[str]",
    min_permille: int = 50,
) -> DataFrame:
    """(col, val, n, permille) for every column value holding at least
    min_permille (default 5%) of its column's rows — the diagnostic you
    run BEFORE picking a partitioner: any key this table reports is a key
    a groupBy/join must salt (or AQE skew-split), and any column with no
    rows here is safe to shuffle on directly. Threshold semantics (not
    top-k) because that IS the question — "which keys exceed a reducer's
    fair share" — and it avoids any rank machinery.

    One pass: the row explodes into |cols| (col, val) tags, ONE map-side-
    combinable groupBy(col, val) count, per-column totals re-aggregate
    the (small) count frame, broadcast back. Integer permille (div)."""
    kv = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.col", "kv.val")
    counts = kv.groupBy("col", "val").agg(F.count("*").alias("n"))
    totals = counts.groupBy("col").agg(F.sum("n").alias("tot"))
    return (
        counts.join(F.broadcast(totals), "col")
        .where(F.col("n") * 1000 >= F.col("tot") * min_permille)
        .select(
            "col",
            "val",
            "n",
            F.expr("n * 1000 div tot").cast("long").alias("permille"),
        )
    )
