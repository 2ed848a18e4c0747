"""Structured Streaming variant of WARC container ingest.

The crawl-archive deployment of sources/warc.read_warc: shard files land
continuously in a directory (exactly how a crawler hands off — it
closes a ~1 GB .warc.gz and moves on), each micro-batch walks the new
shards into record rows and appends them to a partitioned parquet
table, so every downstream screen (html_extract, the crawl-policy
gates, crawled-audio QC) reads fresh records without a batch sweep.

The record walk is stateless per FILE (records_from_files: one
mapInPandas, soft per-record failure), so the identical plan runs under
readStream — the stream==batch contract the QC and html ingests hold,
extended to the container source (pytest-gated: identical rows, binary
payloads byte-equal). Exactly-once comes from the sink checkpoint;
binaryFile is a standard file streaming source, so backlog processing
(availableNow) and rate-limited continuous runs (maxFilesPerTrigger —
one shard == one task == the natural rate unit) both apply.

Reference lineage: the reference is strictly batch (SURVEY.md §2.8);
engine extension like qc_stream/html_stream.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sources.warc import records_from_files

# binaryFile's fixed schema, spelled explicitly: streaming file sources
# refuse schema inference even for fixed-schema formats
_BINARY_FILE_DDL = (
    "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY"
)


def stream_warc_records(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """readStream(binaryFile over input_dir) -> record walk -> append
    parquet record rows. Returns the started StreamingQuery;
    availableNow processes the backlog then stops (the batch-equivalent
    test trigger); maxFilesPerTrigger bounds shards per micro-batch in
    the continuous deployment."""
    reader = spark.readStream.format("binaryFile").schema(_BINARY_FILE_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(input_dir)
    writer = (
        records_from_files(files)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
