"""Streaming image ingest screen (9th streaming capability).

Continuous image ingestion screened against a GROWING perceptual index:
each micro-batch is dhashed once (imagedup.image_dhash — one Arrow
stage; the corpus is never re-decoded), probed against the accumulated
band index (incremental_image_dedup semantics: pigeonhole candidates,
exact bit_count verify — zero false positives/negatives w.r.t. the
dhash metric), and the SURVIVORS' band rows are appended to the index
so later batches dedup against earlier ones. Both sinks write
``batch_id=<n>/`` dirs with overwrite — the per-batch-dir replay
isolation every stateful stream here uses: a replayed micro-batch
overwrites its own attempt instead of appending, so at-least-once
delivery cannot double-screen or double-index.

100 TB shape: per-batch work = one Arrow decode of the BATCH only +
a join of N_BANDS·|batch| probe rows against the stored index (bucket
the index by (band, chunk) at scale); image bytes never reshuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_DDL = "media_id string, bytes binary, mime string"

_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("chunk", T.LongType()),
        T.StructField("id", T.StringType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def _stored_index(spark: SparkSession, index_dir: str):
    has_files = os.path.isdir(index_dir) and any(
        f.endswith(".parquet")
        for _, _, files in os.walk(index_dir)
        for f in files
    )
    if has_files:
        return spark.read.schema(_INDEX_SCHEMA).parquet(index_dir)
    return spark.createDataFrame([], _INDEX_SCHEMA)


def stream_image_screen(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    available_now: bool = True,
):
    """readStream(parquet dir of MEDIA_DDL rows) -> foreachBatch
    (incremental_image_dedup vs the accumulated index) -> survivors
    under ``out_dir/batch_id=<n>/`` (id + verdict only — payload bytes
    stay in the source tree), their band rows under
    ``index_dir/batch_id=<n>/``."""
    from ..operators.imagedup import image_band_index, incremental_image_dedup

    stream = spark.readStream.schema(MEDIA_DDL).parquet(input_dir)

    def _process(batch_df, batch_id: int) -> None:
        idx = _stored_index(spark, index_dir)
        surv, flagged = incremental_image_dedup(
            batch_df, idx, max_hamming=max_hamming
        )
        surv = surv.localCheckpoint(eager=True)
        (
            surv.select("media_id", F.lit("kept").alias("status"))
            .unionByName(flagged.select("media_id", F.lit("flagged").alias("status")))
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch_id={int(batch_id)}"))
        )
        image_band_index(surv).write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch_id={int(batch_id)}")
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
