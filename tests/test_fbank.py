"""Log-mel filterbank: independent direct-DFT replica, planted-tone band
placement, edge cases, and the decode-once Spark plan."""

from __future__ import annotations

import numpy as np
import pytest

from kneaddata_spark import rules
from kneaddata_spark.operators.fbank import logmel_of, mel_filterbank


def _replica_logmel(x: np.ndarray, sr: int) -> np.ndarray:
    """Everything re-derived: explicit frame loop, direct DFT double sum,
    per-bin triangle evaluation from the HTK mel formulas."""
    win = sr * rules.FBANK_WIN_MS // 1000
    hop = sr * rules.FBANK_HOP_MS // 1000
    n = len(x)
    if n < win:
        return np.zeros((0, rules.FBANK_N_MELS))
    y = np.empty(n)
    xf = x.astype(np.float64)
    y[0] = xf[0]
    y[1:] = xf[1:] - 0.97 * xf[:-1]
    nfft = 1
    while nfft < win:
        nfft *= 2
    nbins = nfft // 2 + 1
    # triangles
    def mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def imel(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    pts = [
        imel(mel(rules.FBANK_FMIN_HZ) + k * (mel(sr / 2) - mel(rules.FBANK_FMIN_HZ)) / (rules.FBANK_N_MELS + 1))
        for k in range(rules.FBANK_N_MELS + 2)
    ]
    W = np.zeros((rules.FBANK_N_MELS, nbins))
    for b in range(rules.FBANK_N_MELS):
        for k in range(nbins):
            f = k * sr / nfft
            if pts[b] <= f <= pts[b + 1]:
                W[b, k] = (f - pts[b]) / max(pts[b + 1] - pts[b], 1e-12)
            elif pts[b + 1] < f <= pts[b + 2]:
                W[b, k] = (pts[b + 2] - f) / max(pts[b + 2] - pts[b + 1], 1e-12)
    out = []
    t = 0
    while t + win <= n:
        fr = y[t : t + win].copy()
        for i in range(win):
            fr[i] *= 0.54 - 0.46 * np.cos(2 * np.pi * i / (win - 1))
        power = np.empty(nbins)
        for k in range(nbins):
            ang = -2.0 * np.pi * k * np.arange(nfft) / nfft
            padded = np.zeros(nfft)
            padded[:win] = fr
            re = float(np.sum(padded * np.cos(ang)))
            im = float(np.sum(padded * np.sin(ang)))
            power[k] = re * re + im * im
        out.append(np.log(np.maximum(W @ power, rules.FBANK_LOG_FLOOR)))
        t += hop
    return np.array(out)


def test_kernel_matches_direct_dft_replica():
    rng = np.random.default_rng(4)
    sr = 8000
    x = (rng.standard_normal(sr // 2) * 3000).astype(np.int16)  # 50 frames
    got = logmel_of(x, sr)
    want = _replica_logmel(x, sr)
    assert got.shape == want.shape == ((len(x) - sr * 25 // 1000) // (sr * 10 // 1000) + 1, 23)
    assert np.max(np.abs(got - want)) < 1e-6


@pytest.mark.parametrize("f0", [150, 440, 1200, 3000])
def test_planted_tone_lands_in_its_mel_band(f0):
    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr
    x = (12000 * np.sin(2 * np.pi * f0 * t)).astype(np.int16)
    lm = logmel_of(x, sr)
    dom = int(np.argmax(lm.mean(axis=0)))
    # expected: the band whose triangle weighs f0 highest
    win = sr * rules.FBANK_WIN_MS // 1000
    nfft = 1 << int(np.ceil(np.log2(win)))
    fb = mel_filterbank(sr, nfft, rules.FBANK_N_MELS, rules.FBANK_FMIN_HZ)
    k0 = int(round(f0 * nfft / sr))
    want = int(np.argmax(fb[:, k0]))
    assert abs(dom - want) <= 1, (f0, dom, want)


def test_edge_cases():
    sr = 16000
    win = sr * rules.FBANK_WIN_MS // 1000
    assert logmel_of(np.zeros(win - 1, np.int16), sr).shape == (0, 23)
    assert logmel_of(np.zeros(0, np.int16), sr).shape == (0, 23)
    lm = logmel_of(np.zeros(win, np.int16), sr)      # silence: floor
    assert lm.shape == (1, 23)
    assert np.allclose(lm, np.log(rules.FBANK_LOG_FLOOR))
    # exact frame count rule (full frames only)
    hop = sr * rules.FBANK_HOP_MS // 1000
    n = win + 3 * hop + hop // 2
    assert logmel_of(np.ones(n, np.int16), sr).shape[0] == 4


def test_spark_stats_and_frames(spark, clips_path):
    from kneaddata_spark.operators.fbank import fbank_frames, fbank_stats
    from kneaddata_spark.oracle import decode_pcm

    # filter, not limit: a global limit plans its own SinglePartition
    # exchange and would hide the operator's zero-shuffle property
    clips = spark.read.parquet(clips_path).where("clip_id < 'c0000000060'")
    stats = fbank_stats(clips)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan and "BatchEvalPython" not in plan

    rows = {r.clip_id: r for r in stats.collect()}
    src = {r.clip_id: (bytes(r.bytes), r.codec, r.sr_hz) for r in clips.collect()}
    n_checked = 0
    for cid, r in rows.items():
        raw, codec, sr = src[cid]
        x = decode_pcm(raw, codec)                   # the INDEPENDENT decoder
        if x is None or sr <= 0:
            continue
        # oracle floats are s16/32768 (a power of two: the float32
        # division is exact), so this rebuilds the engine's int16 bits
        x16 = np.round(np.asarray(x, np.float64) * 32768.0).astype(np.int16)
        lm = logmel_of(x16, sr)
        assert r.n_frames == lm.shape[0] and r.n_mels == 23
        if lm.shape[0]:
            assert r.dominant_band == int(np.argmax(lm.mean(axis=0)))
            assert r.logmel_mean_milli == int(np.floor(float(lm.mean()) * 1000 + 0.5))
            assert r.logmel_std_milli == int(np.floor(float(lm.std()) * 1000 + 0.5))
            n_checked += 1
    assert n_checked >= 20

    frames = fbank_frames(clips)
    got_counts = {
        r.clip_id: r.n for r in frames.groupBy("clip_id").agg(
            __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
        ).collect()
    }
    want_counts = {c: r.n_frames for c, r in rows.items() if r.n_frames > 0}
    assert got_counts == want_counts
    one = frames.where(frames.clip_id == max(want_counts)).orderBy("frame_idx").collect()
    raw, codec, sr = src[max(want_counts)]
    x16 = np.round(
        np.asarray(decode_pcm(raw, codec), np.float64) * 32768.0
    ).astype(np.int16)
    lm = logmel_of(x16, sr)
    assert np.allclose(
        np.array([r.mel for r in one]), lm.astype(np.float32), atol=1e-4
    )
