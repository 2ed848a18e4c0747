"""Per-partition checkpointed, idempotently-resumable pipeline runner.

Reference protocol being re-expressed: kneaddata's refcounted temp-file /
stage-file lifecycle (/root/reference/kneaddata/utilities.py:50-61,
knead_data.py:467-500) — each stage's file is the restart point. Here the
restart unit is a *hash bucket* of clip_ids: the driver loops over buckets,
processes each with the normal map-only pipeline, writes to a
bucket-scoped output directory with mode=overwrite (idempotent), and
appends a manifest line only after the bucket commits. A rerun skips
completed buckets — per-partition lineage + counters per north_rule.

At cluster scale the bucket column would be the Iceberg partition key and
the manifest a table; here it is a JSON-lines file next to the output.
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
    bucket_col = F.pmod(F.xxhash64("clip_id"), F.lit(n_buckets))
    for b in range(n_buckets):
        if b in done:
            continue
        part = clips.where(bucket_col == b)
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
