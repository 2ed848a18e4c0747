"""Table-maintenance operators: small-file compaction for partitioned
parquet (the Iceberg ``rewrite_data_files`` stand-in — no Iceberg jars in
this sandbox, partitioned parquet is the documented substitute).

Why this is a pipeline operator and not ops trivia: every
micro-batch-appending producer in this engine (streaming QC's per-trigger
appends, dedup_stream's batch_id directories, the checkpointed bucket
runner) accretes files at the producer's cadence, and at 10^12-row scale
an uncompacted table's FILE LISTING becomes the scan bottleneck (driver
memory + task-granularity floor: a 100k-file table cannot plan fewer than
100k input splits without coalescing). Periodic compaction is the price
of exactly-once append sinks.

Strategy: measure actual on-disk bytes per leaf directory, compute
ceil(bytes / target_file_bytes) output files per partition directory, and
rewrite ATOMICALLY (write to a sibling staging dir, then directory-swap)
so a concurrent reader sees the old or the new layout, never a mix — the
same stage-then-commit protocol as checkpoint.stage_bucketed.

Reference lineage: update_temp_output_files' refcount-driven removal of
intermediate files (utilities.py:407-442) — the reference also treats
file-count hygiene as part of the pipeline contract.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def _leaf_dirs(root: str) -> list[str]:
    """Leaf data directories under a (possibly partitioned) parquet root:
    directories that directly contain parquet part files."""
    leaves = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") for f in filenames):
            leaves.append(dirpath)
    return leaves


def _dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


def compact_small_files(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite every leaf partition directory whose parquet file count is
    >= min_files_to_compact into ceil(bytes / target_file_bytes) files.
    Returns a report {dir: {files_before, files_after, bytes}}. Row
    contents are untouched (the test asserts exact multiset equality).

    Local-filesystem directory swap keeps the rewrite atomic per leaf;
    on an object store the same protocol runs via the committer (or is
    replaced outright by Iceberg's rewrite_data_files action, which this
    operator stands in for).
    """
    report = {}
    for leaf in _leaf_dirs(table_dir):
        files = [f for f in os.listdir(leaf) if f.endswith(".parquet")]
        if len(files) < min_files_to_compact:
            continue
        nbytes = _dir_bytes(leaf)
        n_out = max(1, math.ceil(nbytes / target_file_bytes))
        if n_out >= len(files):
            continue  # compaction would not reduce the file count
        df = spark.read.parquet(leaf)
        staging = f"{leaf}__compact_{uuid.uuid4().hex[:8]}"
        # repartition (not coalesce): coalesce(1) would also collapse the
        # UPSTREAM read parallelism into one task; a shuffle of one leaf's
        # bytes is the correct price for even output files
        df.repartition(n_out).write.mode("overwrite").parquet(staging)
        old = f"{leaf}__old_{uuid.uuid4().hex[:8]}"
        os.rename(leaf, old)
        os.rename(staging, leaf)
        shutil.rmtree(old)
        report[leaf] = {
            "files_before": len(files),
            "files_after": len(
                [f for f in os.listdir(leaf) if f.endswith(".parquet")]
            ),
            "bytes": nbytes,
        }
    return report
