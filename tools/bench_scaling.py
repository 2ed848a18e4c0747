"""Scaling-efficiency evidence (BASELINE.json north_rule: >=0.8 efficiency
from N to 4N executors; sandbox proxy per driver instruction: the SAME job
on the SAME input at local[8] vs local[32]).

Runs the full QC pipeline (read clip parquet -> annotate -> partitioned
write) at both parallelism levels, twice each (first run discarded as JVM/
Arrow warmup), and writes BENCH_SCALING.json.

    python tools/bench_scaling.py [n_clips]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLIPS = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000


def run_at(cores: int, path: str, repeats: int = 2) -> float:
    """Best wall-clock of `repeats` runs at local[cores] (fresh session)."""
    from kneaddata_spark.pipeline import broadcast_models, run_qc
    from kneaddata_spark.session import get_spark

    spark = get_spark(app=f"scale{cores}", cores=cores)
    models = broadcast_models(spark)
    clips = spark.read.parquet(path)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        run_qc(spark, clips, f"/tmp/kneaddata_bench/scale_out_{cores}", *models)
        best = min(best, time.time() - t0)
    spark.stop()
    return best


def main() -> None:
    from kneaddata_spark.session import get_spark
    from kneaddata_spark.synth import clips_spark_df

    path = f"/tmp/kneaddata_bench/clips_{N_CLIPS}.parquet"
    if not os.path.exists(path + "/_SUCCESS"):
        spark = get_spark(app="gen", cores=32)
        clips_spark_df(spark, N_CLIPS, n_partitions=64).write.mode("overwrite").parquet(path)
        spark.stop()

    t8 = run_at(8, path)
    t32 = run_at(32, path)
    eff = (t8 * 8) / (t32 * 32)
    out = {
        "n_clips": N_CLIPS,
        "local8_sec": round(t8, 2),
        "local32_sec": round(t32, 2),
        "clips_per_sec_8": round(N_CLIPS / t8, 1),
        "clips_per_sec_32": round(N_CLIPS / t32, 1),
        "speedup_8_to_32": round(t8 / t32, 3),
        "per_core_scaling_efficiency": round(eff, 3),
        "note": "same job, same input; local[8] vs local[32] proxies N vs 4N executors",
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_SCALING.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
