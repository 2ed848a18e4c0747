"""Per-partition checkpointed, idempotently-resumable pipeline runner.

Reference protocol being re-expressed: kneaddata's refcounted temp-file /
stage-file lifecycle (/root/reference/kneaddata/utilities.py:50-61,
knead_data.py:467-500) — each stage's file is the restart point. Here the
restart unit is a *hash bucket* of clip_ids.

Scale shape: the input is staged ONCE, repartitioned on the uniform
pmod(xxhash64(clip_id), n_buckets) key and written partitionBy(bucket) —
on a real deployment this is the Iceberg partition key, and the skew-prone
lang/codec columns are deliberately NOT the key (north_rule salting). The
driver then loops buckets; each bucket's run reads ONLY its partition
directory (partition-pruned scan — NOT a re-scan of the full input, which
at 10^12 rows would make the loop O(n_buckets * corpus)). Output goes to a
bucket-scoped directory with mode=overwrite (idempotent) and a manifest
line is appended only after the bucket commits. A rerun skips committed
buckets — per-partition lineage + counters per north_rule.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import broadcast_models, run_qc


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.jsonl")


def load_manifest(out_dir: str) -> dict[int, dict]:
    done: dict[int, dict] = {}
    p = _manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            for line in f:
                if line.strip():
                    rec = json.loads(line)
                    done[rec["bucket"]] = rec
    return done


def stage_bucketed(
    clips: DataFrame, staging_dir: str, n_buckets: int
) -> str:
    """One pass: hash-bucket the corpus and write partitionBy(bucket).
    Idempotent (skipped if the _SUCCESS marker exists)."""
    if not os.path.exists(os.path.join(staging_dir, "_SUCCESS")):
        (
            clips.withColumn(
                "bucket", F.pmod(F.xxhash64("clip_id"), F.lit(n_buckets))
            )
            .repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(staging_dir)
        )
    return staging_dir


def run_checkpointed(
    spark: SparkSession,
    clips: DataFrame,
    out_dir: str,
    n_buckets: int = 8,
) -> list[dict]:
    """Process clips bucket-by-bucket; resume skips committed buckets.

    Returns the full manifest (old + newly committed records).
    """
    os.makedirs(out_dir, exist_ok=True)
    langid_bc, ppl_bc = broadcast_models(spark)
    done = load_manifest(out_dir)
    staging = stage_bucketed(clips, os.path.join(out_dir, "_staged"), n_buckets)
    for b in range(n_buckets):
        if b in done:
            continue
        # partition-pruned: reads only bucket=b's files
        part = spark.read.parquet(staging).where(F.col("bucket") == b).drop("bucket")
        res = run_qc(
            spark, part, os.path.join(out_dir, f"bucket={b}"), langid_bc, ppl_bc
        )
        rec = {
            "bucket": b,
            "ts": time.time(),
            "metrics": {k: int(v) for k, v in res.metrics.items()},
            "path": res.out_path,
        }
        with open(_manifest_path(out_dir), "a") as f:
            f.write(json.dumps(rec) + "\n")
        done[b] = rec
    return [done[b] for b in sorted(done)]
