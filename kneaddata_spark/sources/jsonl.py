"""JSONL document-corpus source with corrupt-line quarantine — the
ingestion path every raw web-text corpus arrives through (one JSON object
per line, usually gzipped shards).

Reference lineage: the gzip/bz2-transparent FASTQ dispatch plus the
"bad read doesn't kill the run" posture (sources/fastq.py, S2-S4): a
crawler shard at 10^12 scale ALWAYS contains some malformed lines, and
the run must split them into a quarantine table with a reason, never die
and never silently drop.

Scale shape — deliberately NOT the `_corrupt_record` idiom: filtering on
Spark's internal corrupt-record column requires caching the parsed frame
first (Spark raises otherwise), and caching the raw parse of a 100 TB
scan is exactly the corpus-sized-intermediate mistake. Instead the file
is read as text (gz/bz2 transparent, splittable planning unchanged) and
parsed with `from_json`, which returns NULL for unparseable lines — so
clean/quarantine are two filters over ONE streaming-friendly projection,
no cache, no second scan of the raw bytes, and the same expression works
under readStream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_DDL = "doc_id bigint, lang string, source string, text string"


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOC_DDL,
    required: tuple = ("doc_id", "text"),
) -> "tuple[DataFrame, DataFrame]":
    """(clean, quarantine) from a jsonl / jsonl.gz path.

    clean: rows parsing to the declared schema with every `required`
    field non-null. quarantine: the raw offending line plus a reason
    column — 'unparseable' (not JSON / wrong shape) or
    'missing:<field>' (valid JSON lacking a required field). Extra JSON
    keys are ignored (schema projection); blank lines quarantine as
    unparseable rather than vanishing, so row accounting closes.
    Parse strictness is Spark's PERMISSIVE from_json: a line whose valid
    JSON prefix satisfies the schema parses even with trailing junk —
    acceptable for quarantine duty (the typical shard corruptions are
    truncation and interleaved writes, both of which DO null out)."""
    # PERMISSIVE from_json yields a struct of NULLs (not a NULL struct)
    # for malformed lines, so unparseable-vs-missing needs the corrupt
    # column declared INSIDE the from_json schema. That is safe here —
    # the documented cache trap applies to DataFrameReader.json's
    # internal column, not to the pure from_json expression.
    parse_schema = schema + ", _corrupt_record string"
    raw = spark.read.text(path)
    parsed = raw.select(
        F.col("value").alias("raw_line"),
        F.from_json(
            "value",
            parse_schema,
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("j"),
    )
    # blank/whitespace-only lines parse to an all-null struct WITHOUT
    # tripping the corrupt column — classify them as unparseable, not
    # as a missing-field record
    unparseable = F.col("j._corrupt_record").isNotNull() | (
        F.trim(F.col("raw_line")) == ""
    )
    missing_reason = F.concat(
        F.lit("missing:"),
        F.concat_ws(
            ",",
            *[F.when(F.col(f"j.{c}").isNull(), F.lit(c)) for c in required],
        ),
    )
    reason = F.when(unparseable, F.lit("unparseable")).otherwise(missing_reason)
    bad = unparseable
    for c in required:
        bad = bad | F.col(f"j.{c}").isNull()
    out_cols = [f.strip().split(" ")[0] for f in schema.split(",")]
    clean = parsed.where(~bad).select(
        *[F.col(f"j.{c}").alias(c) for c in out_cols]
    )
    quarantine = parsed.where(bad).select("raw_line", reason.alias("reason"))
    return clean, quarantine
