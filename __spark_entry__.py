"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship document-QC query on sf0.001.
``queries()`` / ``oracle_sql()`` — operator surface from SURVEY.md §2 plus
the training-data-pipeline extensions (dedup / similarity / text analysis /
retrieval / corpus assembly / web ingest), implemented in
kneaddata_spark.plans.entry_queries; DuckDB oracles attached for every
SQL-expressible operator — ``len(oracle_sql())`` of ``len(queries())``,
counts DERIVED from the registries (r6: no hand-written totals here) —
including the LSH/ANN family (exact-Jaccard-equal MinHash, portable-hash
SimHash, planted-dup ANN top-1); the streaming query and the binary
decode families are rows-only by design. Query registration order
rotates from recorded driver evidence (never-checked queries first,
then previously-red fixes awaiting confirmation) so the driver's
budgeted sweep reaches every query across rounds.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: document quality-filter verdict over sf0.001 documents —
    the kneaddata keep/drop pipeline shape (filter rules -> dedup screen ->
    quality features -> verdict) on the driver-provided corpus."""
    from kneaddata_spark.operators import dedup, textstats

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    deduped = dedup.dedup_exact(docs, "doc_id", "text")
    quality = textstats.quality_scores(deduped, "doc_id", "text")
    stats = textstats.token_stats(deduped, "doc_id", "text")
    votes = textstats.lang_stopword_votes(deduped, "doc_id", "text")
    out = (
        deduped.select("doc_id", "lang", "source")
        .join(quality, "doc_id")
        .join(stats, "doc_id")
        .join(votes.select("doc_id", "pred_lang"), "doc_id")
        .withColumn(
            "keep",
            (F.col("n_chars") >= 60)
            & (F.col("n_tokens") >= 5)
            & (F.col("punct_ratio") <= 0.3),
        )
    )
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kneaddata_spark.plans.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from kneaddata_spark.plans.entry_queries import ORACLES

    return dict(ORACLES)
