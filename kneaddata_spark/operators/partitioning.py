"""Scan-parallelism guard for CPU-heavy row-local stages (r6).

The driver's tables are compact single-row-group parquet files, so a
scan plans as ONE task however many cores the session has — and parquet
row groups are the split unit, so `spark.sql.files.minPartitionNum`
cannot help. Any operator that does heavy per-row work (tokenize +
hash + explode, fingerprinting, n-gram construction) before its first
exchange then runs that stage single-threaded (measured: the sf1.0
shingle build was 9.9 s of a 15 s query on one core).

`widen()` raises a degenerate source to the session's shuffle width with
one narrow repartition, and is a NO-OP whenever the scan already yields
enough splits — at real scale (thousands of input splits) it never
fires, so the 100 TB plan shape is unchanged. The partition probe is
plan-time only (no job)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def widen(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Repartition `df` to the session's shuffle width IF its current
    plan yields fewer partitions; otherwise return it unchanged. Pass
    `key_col` (a unique id) for deterministic hash placement without the
    local sort a round-robin repartition pays."""
    if df.isStreaming:
        # .rdd is illegal on a streaming frame; micro-batch parallelism
        # is the trigger's concern, not this guard's
        return df
    n_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    if df.rdd.getNumPartitions() >= n_parts:
        return df
    if key_col is not None:
        return df.repartition(n_parts, F.col(key_col))
    return df.repartition(n_parts)
