"""SpecAugment (operators/specaugment): deterministic mask geometry ==
python crc32 replica; masked cells exactly 0.0; unmasked cells
bit-identical to the unaugmented fbank frames; witness counts/digest
replayed; JVM-only masking on top of the one Arrow fbank stage."""

import math
import re
import zlib

import numpy as np

from kneaddata_spark import rules
from kneaddata_spark.operators.fbank import fbank_frames
from kneaddata_spark.operators.specaugment import specaugment, specaugment_frames
from kneaddata_spark.synth import gen_clips_pdf

SEED = 3
MAX_T, MAX_F = 20, 4
N_T, N_F = 2, 2


def _crc(cid: str, tag: str, j: int, mod: int) -> int:
    return zlib.crc32(f"{cid}|{tag}|{j}|{SEED}".encode()) % mod


def _replica_masks(cid: str, nf: int, n_mels: int):
    ts, fs = [], []
    for j in range(N_T):
        tl = min(_crc(cid, "tlen", j, MAX_T + 1), nf)
        t0 = _crc(cid, "t0", j, nf - tl + 1)
        ts.append((t0, tl))
    for j in range(N_F):
        fl = min(_crc(cid, "flen", j, MAX_F + 1), n_mels)
        f0 = _crc(cid, "f0", j, n_mels - fl + 1)
        fs.append((f0, fl))
    return ts, fs


def test_specaugment_replica_and_surfaces(spark):
    n_mels = int(rules.FBANK_N_MELS)
    pdf = gen_clips_pdf(40)
    df = spark.createDataFrame(
        pdf[["clip_id", "bytes", "codec", "sr_hz"]]
    ).repartition(4)

    base = fbank_frames(df)
    plain = {}
    for r in base.collect():
        plain.setdefault(r["clip_id"], {})[r["frame_idx"]] = r["mel"]

    aug = specaugment_frames(df, N_T, MAX_T, N_F, MAX_F, SEED)
    plan = aug._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    got = {}
    for r in aug.collect():
        got.setdefault(r["clip_id"], {})[r["frame_idx"]] = r["mel"]

    wit = {r["clip_id"]: r for r in specaugment(df, N_T, MAX_T, N_F, MAX_F, SEED).collect()}

    assert set(got) == set(plain) == set(wit) and len(got) > 10
    n_clips_with_mask = 0
    for cid, frames in got.items():
        nf = len(frames)
        ts, fs = _replica_masks(cid, nf, n_mels)
        w = wit[cid]
        assert w["n_frames"] == nf and w["n_mels"] == n_mels
        for j, (t0, tl) in enumerate(ts):
            assert (w[f"t0_{j}"], w[f"t_len_{j}"]) == (t0, tl)
        for j, (f0, fl) in enumerate(fs):
            assert (w[f"f0_{j}"], w[f"f_len_{j}"]) == (f0, fl)

        t_hit = [any(t0 <= i < t0 + tl for t0, tl in ts) for i in range(nf)]
        f_hit = [any(f0 <= b < f0 + fl for f0, fl in fs) for b in range(n_mels)]
        n_masked = sum(
            n_mels if t_hit[i] else sum(f_hit) for i in range(nf)
        )
        assert w["n_masked_cells"] == n_masked
        if n_masked:
            n_clips_with_mask += 1

        digest = 0
        for i in range(nf):
            for b in range(n_mels):
                v = got[cid][i][b]
                if t_hit[i] or f_hit[b]:
                    assert v == 0.0
                else:
                    assert v == plain[cid][i][b]  # bit-identical pass-through
                digest += math.floor(float(np.float32(v)) * 1000.0 + 0.5)
        assert w["masked_digest_milli"] == digest
    assert n_clips_with_mask > 5
