"""Streaming QC: availableNow micro-batch run must match the batch verdict
exactly, and the sink checkpoint must make re-triggering idempotent
(no duplicate rows when the same files are seen again)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def stream_dirs(spark, clips_path, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    src = str(base / "in")
    # stage the fixture clips as a multi-file directory source
    spark.read.parquet(clips_path).repartition(4).write.mode("overwrite").parquet(src)
    return src, str(base / "out"), str(base / "ckpt")


def test_stream_matches_batch(spark, stream_dirs, clips_path, tmp_path):
    from kneaddata_spark.pipeline import run_qc
    from kneaddata_spark.streaming import stream_qc
    from kneaddata_spark.streaming.qc_stream import status_counts

    src, out, ckpt = stream_dirs
    q = stream_qc(spark, src, out, ckpt)
    q.awaitTermination(300)

    batch = run_qc(spark, spark.read.parquet(clips_path), str(tmp_path / "batch"))
    got = {r["status"]: r["n"] for r in status_counts(spark, out).collect()}
    want = {r["status"]: r["n"] for r in (
        spark.read.parquet(batch.out_path).groupBy("status").agg(F.count("*").alias("n")).collect()
    )}
    assert got == want
    # kept rows carry scrubbed transcript + trimmed bytes, like the batch path
    kept = spark.read.parquet(out).where("status = 'kept'")
    assert kept.where(F.col("bytes").isNull() | F.col("transcript").isNull()).count() == 0


def test_stream_retrigger_idempotent(spark, stream_dirs):
    from kneaddata_spark.streaming import stream_qc

    src, out, ckpt = stream_dirs
    n_before = spark.read.parquet(out).count()
    q = stream_qc(spark, src, out, ckpt)  # same checkpoint: no new files
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_before


def test_stream_vad_matches_batch(spark, clips_path, tmp_path):
    """vad_segments is stateless per clip, so it composes directly into a
    Structured Streaming micro-batch plan: readStream over the same files
    must emit exactly the batch segment set (the stream==batch contract
    the QC pipeline holds, extended to the audio segmentation operator)."""
    from kneaddata_spark.operators.vad import vad_segments

    src = str(tmp_path / "vad_in")
    spark.read.parquet(clips_path).repartition(3).write.mode("overwrite").parquet(src)
    batch_df = spark.read.parquet(src)
    want = sorted(
        (r["clip_id"], r["seg_idx"], r["start_ms"], r["end_ms"], r["n_frames"])
        for r in vad_segments(batch_df).collect()
    )
    out = str(tmp_path / "vad_out")
    q = (
        vad_segments(spark.readStream.schema(batch_df.schema).parquet(src))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "vad_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        (r["clip_id"], r["seg_idx"], r["start_ms"], r["end_ms"], r["n_frames"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == want and len(want) > 50
