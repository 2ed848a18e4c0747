"""Structured Streaming distinct counting: each micro-batch of an
unbounded ingest folds into a persistent HyperLogLog register table.

The production question at 10^12 scale is "how many distinct users /
clips / urls have we EVER ingested, per group?" — an exact distinct
needs unbounded state keyed by every value seen; the HLL register table
(operators/sketches.py) answers within ~6.5% with <=256 rows per group,
forever.

The register algebra makes the streaming story almost trivial, and
that IS the point of a mergeable sketch:

 - max() is associative, commutative and IDEMPOTENT, so each
   micro-batch only writes ITS OWN register table under
   ``batch_id=<n>/`` (mode=overwrite): no read-modify-write of shared
   state, no transaction needed, and a replayed batch (Structured
   Streaming re-runs batches after a crash) overwrites its own
   directory with identical content instead of corrupting a running
   total — the same per-batch-id idempotency contract as
   dedup_stream.py, but here even double-COUNTING a batch would be
   harmless because max(max(a,b),b) == max(a,b).
 - The read path max-merges the whole tree + folds
   (sketches.hll_merge semantics); pytest proves the streamed result
   is REGISTER-IDENTICAL to the batch sketch of the union.

Reference lineage: the per-stage read-count log (utilities.py
log_read_count_for_files) as a forever-running monitor.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_distinct(
    spark: SparkSession,
    input_dir: str,
    regs_dir: str,
    checkpoint_dir: str,
    schema_ddl: str,
    key: str,
    group_cols: list[str],
    available_now: bool = True,
):
    """readStream(input_dir) -> per-batch HLL register tables under
    ``regs_dir/batch_id=<n>/``. Returns the StreamingQuery; read the
    running estimate any time with ``distinct_estimate``."""
    from ..operators.sketches import hll_registers

    stream = spark.readStream.schema(schema_ddl).parquet(input_dir)

    def _process(batch_df, batch_id: int) -> None:
        regs = hll_registers(batch_df, key, group_cols)
        regs.write.mode("overwrite").parquet(
            os.path.join(regs_dir, f"batch_id={int(batch_id)}")
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def distinct_estimate(
    spark: SparkSession, regs_dir: str, group_cols: list[str]
) -> DataFrame:
    """Max-merge every batch's register table and fold to the per-group
    estimate — O(batches * m) rows in, <=group-count rows out."""
    from ..operators.sketches import hll_fold

    regs = spark.read.parquet(regs_dir).select(*group_cols, "__bucket", "__m")
    merged = regs.groupBy(*group_cols, "__bucket").agg(F.max("__m").alias("__m"))
    return hll_fold(merged, group_cols)
