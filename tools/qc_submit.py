"""spark-submit entry point for the QC pipeline (north_rule launch shape:
``spark-submit --py-files kneaddata_spark.zip tools/qc_submit.py ...``).

The package arrives via --py-files (the reference ships itself to workers
via setup.py install + $PATH resolution, knead_data.py:372-374; Spark's
equivalent is the py-files zip on every executor's sys.path).

    spark-submit --master local[8] --py-files /tmp/kneaddata_spark.zip \
        tools/qc_submit.py --input /path/clips.parquet --output /path/out \
        [--synthesize N] [--buckets K]

With --buckets K the run is checkpointed per hash bucket (idempotent
resume, kneaddata_spark.checkpoint); otherwise one map-only pass.
Prints ONE JSON line of metrics.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="clip parquet path (input_hint schema)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--synthesize", type=int, default=0,
                    help="generate N synthetic clips instead of reading --input")
    ap.add_argument("--buckets", type=int, default=0,
                    help="checkpointed mode: process per hash bucket, resumable")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("kneaddata_spark_qc").getOrCreate()
    # package import AFTER session init: under spark-submit the --py-files
    # zip is already on sys.path; in tests the repo dir is on PYTHONPATH
    from kneaddata_spark.checkpoint import run_checkpointed
    from kneaddata_spark.pipeline import run_qc
    from kneaddata_spark.synth import clips_spark_df

    if args.synthesize:
        clips = clips_spark_df(spark, args.synthesize, n_partitions=max(
            8, spark.sparkContext.defaultParallelism))
    elif args.input:
        clips = spark.read.parquet(args.input)
    else:
        ap.error("--input or --synthesize required")

    if args.buckets:
        manifest = run_checkpointed(spark, clips, args.output, n_buckets=args.buckets)
        total = {"n_rows": sum(r["metrics"]["n_rows"] for r in manifest),
                 "n_kept": sum(r["metrics"]["n_kept"] for r in manifest),
                 "buckets": len(manifest)}
        print(json.dumps(total))
    else:
        res = run_qc(spark, clips, args.output)
        print(json.dumps({k: int(v) for k, v in res.metrics.items()}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
