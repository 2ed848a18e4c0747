"""Structured Streaming variant of the fused seven-verdict audio screen.

The monitoring deployment of operators/audioscreen.screen_audio: newly
landed clip files are screened continuously — VAD, SNR, pitch, hum/DC,
bandwidth, reverb and dynamic-range verdicts appended to a partitioned
verdict table as each micro-batch arrives, so corpus-health dashboards
(and ingest-gating policies) read fresh numbers without a batch sweep.

screen_audio is stateless per clip (one Arrow stage, zero shuffles, no
windows), so the SAME plan object runs under readStream unchanged — the
stream==batch contract the QC pipeline holds, extended to the screen
family (pytest-gated: identical verdict rows on identical input).
Exactly-once comes from the sink checkpoint, as in qc_stream.

Reference lineage: the reference is strictly batch (SURVEY.md §2.8);
this is an engine extension, like qc_stream.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.audioscreen import screen_audio
from .qc_stream import CLIP_DDL


def stream_screen(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """readStream(input_dir) -> screen_audio -> append parquet verdicts.

    Returns the started StreamingQuery; availableNow processes the
    backlog then stops (the batch-equivalent test trigger), a
    max_files_per_trigger reader is the continuous deployment."""
    reader = spark.readStream.schema(CLIP_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    clips = reader.parquet(input_dir)
    writer = (
        screen_audio(clips)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
