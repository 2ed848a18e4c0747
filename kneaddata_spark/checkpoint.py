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


def _staging_fingerprint(clips: DataFrame, n_buckets: int) -> str:
    """Identity of a staged corpus: bucket count + input schema + source
    file (path, size, mtime) triples — metadata-only, no job. In-memory
    inputs (no files) run ONE content-hash job: count + an order-invariant
    sum of xxhash64 over the first column (ADVICE r2: a bare row count let
    a regenerated same-cardinality corpus resume against stale staging,
    and path-only file identity missed rewritten files). Guards resume
    against a silently different n_buckets or input (ADVICE r1: staged-at-
    K=8, rerun-with-K=4 would loop only buckets 0-3 and never read 4-7 —
    silent data loss committed to the manifest)."""
    import hashlib

    files = sorted(clips.inputFiles())
    if files:
        def _stat(uri: str):
            p = uri[7:] if uri.startswith("file:///") else uri[5:] if uri.startswith("file:") else uri
            try:
                st = os.stat(p)
                # st_mtime_ns, not int(st_mtime) (ADVICE r3): a same-size
                # file rewritten at the same path within the same SECOND
                # would otherwise fingerprint identically, re-opening the
                # stale-resume hole this stat triple exists to close
                return [uri, st.st_size, st.st_mtime_ns]
            except OSError:  # non-local fs — path-only identity
                return [uri, -1, -1]

        content = [_stat(f) for f in files]
    else:
        # full-ROW hash (xxhash64 over every column): a first-column-only
        # hash would miss a regenerated corpus whose ids survived but whose
        # payloads changed. Aggregate as a sum of 30-bit buckets: order-
        # invariant, no pairwise cancellation on duplicate rows (bit_xor
        # cancels), and overflow-free under ANSI for < 2^33 rows.
        row = clips.select(
            F.count("*").alias("n"),
            F.sum(F.pmod(F.xxhash64(*clips.columns), F.lit(1 << 30))).alias("h"),
        ).collect()[0]
        content = [["rows", int(row["n"]), int(row["h"] or 0)]]
    basis = json.dumps(
        {
            "n_buckets": n_buckets,
            "schema": clips.schema.simpleString(),
            "content": content,
        },
        sort_keys=True,
    )
    return hashlib.sha256(basis.encode()).hexdigest()


def stage_bucketed(
    clips: DataFrame, staging_dir: str, n_buckets: int
) -> tuple[str, bool]:
    """One pass: hash-bucket the corpus and write partitionBy(bucket).
    Idempotent: skipped only when _SUCCESS exists AND the recorded staging
    fingerprint (n_buckets + input identity) matches; any mismatch
    restages. Returns (path, restaged)."""
    meta_path = os.path.join(staging_dir, "_staging_meta.json")
    fp = _staging_fingerprint(clips, n_buckets)
    if os.path.exists(os.path.join(staging_dir, "_SUCCESS")) and os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f).get("fingerprint") == fp:
                return staging_dir, False
    (
        clips.withColumn("bucket", F.pmod(F.xxhash64("clip_id"), F.lit(n_buckets)))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(staging_dir)
    )
    with open(meta_path, "w") as f:
        json.dump({"n_buckets": n_buckets, "fingerprint": fp}, f)
    return staging_dir, True


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
    staging, restaged = stage_bucketed(
        clips, os.path.join(out_dir, "_staged"), n_buckets
    )
    if restaged and done:
        # the staged corpus changed (different input or n_buckets): every
        # previously committed bucket refers to stale data — invalidate the
        # manifest rather than resuming against the wrong lineage
        os.remove(_manifest_path(out_dir))
        done = {}
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
