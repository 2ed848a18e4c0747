"""MFCC + CMVN (operators/mfcc, operators/cmvn): JVM DCT / normalization
algebra == a python float64 left-fold replica bit-for-bit; DCT hand
anchors (constant vector -> c0 = v*sqrt(N), c_{k>0} = 0; W orthonormal);
CMVN postconditions (post-norm band mean 0, un-floored band var 1.000,
constant band floors to exactly 0); witnesses replayed; both operators
stay one Arrow stage with JVM-only algebra on top."""

import math

import numpy as np

from kneaddata_spark import rules
from kneaddata_spark.operators.cmvn import cmvn_frames, cmvn_over, cmvn_stats
from kneaddata_spark.operators.fbank import fbank_frames
from kneaddata_spark.operators.mfcc import (
    MFCC_N_CEPS,
    dct_weights,
    mfcc_frames,
    mfcc_stats,
)
from kneaddata_spark.synth import gen_clips_pdf

N_MELS = int(rules.FBANK_N_MELS)


def _milli(v: float) -> int:
    return math.floor(v * 1000.0 + 0.5)


def _mfcc_replica(mel, W):
    """Same IEEE ops in the same order as the JVM fold: float32 promote,
    double multiply, left-fold double add."""
    out = []
    for row in W:
        s = 0.0
        for m, w in zip(mel, row):
            s += float(np.float32(m)) * w
        out.append(s)
    return out


def _cmvn_replica(frames):
    """frames: {frame_idx: [float32 mel]} -> (mean, std, {idx: [double]})."""
    n = len(frames)
    sums = [0.0] * N_MELS
    sumsq = [0.0] * N_MELS
    for i in sorted(frames):
        for b in range(N_MELS):
            m = float(np.float32(frames[i][b]))
            sums[b] += m
            sumsq[b] += m * m
    mean = [s / float(n) for s in sums]
    std = [
        math.sqrt(max(sumsq[b] / float(n) - mean[b] * mean[b], rules.CMVN_VAR_FLOOR))
        for b in range(N_MELS)
    ]
    norm = {
        i: [
            (float(np.float32(frames[i][b])) - mean[b]) / std[b]
            for b in range(N_MELS)
        ]
        for i in frames
    }
    return mean, std, norm


def test_dct_anchors():
    W = np.array(dct_weights(N_MELS, N_MELS))
    # orthonormal: W @ W.T == I
    assert np.allclose(W @ W.T, np.eye(N_MELS), atol=1e-12)
    # constant vector: c0 = v*sqrt(N), higher coefficients vanish
    v = 3.25
    c = W[:MFCC_N_CEPS] @ np.full(N_MELS, v)
    assert abs(c[0] - v * math.sqrt(N_MELS)) < 1e-9
    assert np.all(np.abs(c[1:]) < 1e-9)


def test_mfcc_engine_equals_replica(spark):
    pdf = gen_clips_pdf(30)
    df = spark.createDataFrame(
        pdf[["clip_id", "bytes", "codec", "sr_hz"]]
    ).repartition(4)

    plain = {}
    for r in fbank_frames(df).collect():
        plain.setdefault(r["clip_id"], {})[r["frame_idx"]] = r["mel"]

    out = mfcc_frames(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    got = {}
    for r in out.collect():
        got.setdefault(r["clip_id"], {})[r["frame_idx"]] = r["mfcc"]

    wit = {r["clip_id"]: r for r in mfcc_stats(df).collect()}
    assert set(got) == set(plain) == set(wit) and len(got) > 10

    W = dct_weights(MFCC_N_CEPS, N_MELS)
    for cid, frames in got.items():
        assert wit[cid]["n_frames"] == len(frames)
        assert wit[cid]["n_ceps"] == MFCC_N_CEPS
        c0_sum, digest = 0, 0
        for i, mfcc in frames.items():
            rep = _mfcc_replica(plain[cid][i], W)
            # frames surface: double -> float32 cast, bit-identical
            assert [np.float32(x) for x in rep] == list(mfcc)
            c0_sum += _milli(rep[0])
            digest += sum(_milli(x) for x in rep)
        assert wit[cid]["c0_sum_milli"] == c0_sum
        assert wit[cid]["cep_digest_milli"] == digest


def test_cmvn_engine_equals_replica(spark):
    pdf = gen_clips_pdf(30)
    df = spark.createDataFrame(
        pdf[["clip_id", "bytes", "codec", "sr_hz"]]
    ).repartition(4)

    plain = {}
    for r in fbank_frames(df).collect():
        plain.setdefault(r["clip_id"], {})[r["frame_idx"]] = r["mel"]

    out = cmvn_frames(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    got = {}
    for r in out.collect():
        got.setdefault(r["clip_id"], {})[r["frame_idx"]] = r["mel"]

    wit = {r["clip_id"]: r for r in cmvn_stats(df).collect()}
    assert set(got) == set(plain) == set(wit) and len(got) > 10

    for cid, frames in plain.items():
        n = len(frames)
        _, std, norm = _cmvn_replica(frames)
        # frames surface: double -> float32 cast, bit-identical
        for i in frames:
            assert [np.float32(x) for x in norm[i]] == list(got[cid][i])
        # witness replay: post-norm band sums/var from the replica doubles
        nsum = [0.0] * N_MELS
        nsumsq = [0.0] * N_MELS
        digest = 0
        for i in sorted(frames):
            for b in range(N_MELS):
                nsum[b] += norm[i][b]
                nsumsq[b] += norm[i][b] * norm[i][b]
            digest += sum(_milli(x) for x in norm[i])
        w = wit[cid]
        assert w["n_frames"] == n and w["n_mels"] == N_MELS
        max_mean = max(
            math.floor(abs(s / float(n)) * 1000000.0 + 0.5) for s in nsum
        )
        var = [
            nsumsq[b] / float(n) - (nsum[b] / float(n)) ** 2 for b in range(N_MELS)
        ]
        assert w["max_abs_band_mean_micro"] == max_mean
        assert w["min_band_var_milli"] == min(_milli(v) for v in var)
        assert w["max_band_var_milli"] == max(_milli(v) for v in var)
        assert w["norm_digest_milli"] == digest
        # postconditions: mean cancels to < 1 micro; un-floored bands
        # renormalize to var 1.000
        assert w["max_abs_band_mean_micro"] == 0
        if all(s * s > rules.CMVN_VAR_FLOOR for s in std):
            assert w["min_band_var_milli"] == 1000 == w["max_band_var_milli"]


def test_cmvn_constant_band_floors_to_zero(spark):
    # hand-planted frames df: band 0 constant (hits the var floor ->
    # normalized exactly 0), band 1 alternating +/-1 around 2.0
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField(
                "frames",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("frame_idx", T.IntegerType()),
                            T.StructField("mel", T.ArrayType(T.FloatType())),
                        ]
                    )
                ),
            ),
        ]
    )
    mels = []
    for i in range(4):
        mel = [5.0, 2.0 + (1.0 if i % 2 == 0 else -1.0)] + [0.0] * (N_MELS - 2)
        mels.append({"frame_idx": i, "mel": mel})
    df = spark.createDataFrame([("c1", mels)], schema)
    row = cmvn_over(df).collect()[0]
    norm = {fr["frame_idx"]: fr["mel"] for fr in row["normalized"]}
    for i in range(4):
        assert norm[i][0] == 0.0            # floored constant band
        assert abs(abs(norm[i][1]) - 1.0) < 1e-9   # unit variance band
    assert row["std"][0] == math.sqrt(rules.CMVN_VAR_FLOOR)
