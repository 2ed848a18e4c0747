"""Bandwidth screen (operators/bandwidth): calibration (full-band noise
reads est sr/2; sharply band-limited noise reads the matching lower
octave; tones leak < 4 permille at half a split), planted narrowband
detection over a real corpus clip, short/silent statuses; engine == an
independent per-sample python-int replica; one-Arrow/zero-exchange plan."""

import numpy as np

from kneaddata_spark import rules
from kneaddata_spark.operators.bandwidth import band_of, bandwidth_screen


def _scalar_replica(x, sr):
    """Independent reference: per-sample python-int convolution and
    explicit floor-division arithmetic (no numpy in the kernel math)."""
    n = len(x)
    if n < rules.BW_MIN_SAMPLES:
        return ("short", n, [None, None, None], None)
    y = [int(v) for v in x]
    if sum(v * v for v in y) == 0:
        return ("silent", n, [None, None, None], None)
    K = rules.BW_KERNEL
    octs = []
    for _ in range(3):
        m = len(y)
        lo, hi = [], []
        for k in range(3, m - 3):
            acc = 0
            for t in range(-3, 4):
                acc += K[t + 3] * y[k + t]
            lo.append(acc)
            hi.append(32 * y[k] - acc)
        e_hi = sum(v * v for v in hi)
        e_lo = sum(v * v for v in lo)
        octs.append(1000 * e_hi // max(e_hi + e_lo, 1))
        y = [v // 32 for v in lo[::2]]
    for lvl in range(3):
        if octs[lvl] >= rules.BW_ACTIVE_MIN_PERMILLE:
            return ("ok", n, octs, sr >> (lvl + 1))
    return ("ok", n, octs, sr >> 4)


def _lcg_noise(n, seed=123456789, amp=10000):
    s = seed
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        s = (1103515245 * s + 12345) % (1 << 31)
        out[i] = (s % (2 * amp + 1)) - amp
    return out


def _lowpass(x, sr, cutoff_hz):
    """Sharp 33-tap integer windowed-sinc lowpass — the 'proper
    resampler' stand-in for planting band-limited fixtures."""
    m = np.arange(33) - 16
    fc = cutoff_hz / sr
    h = 2 * fc * np.sinc(2 * fc * m) * np.hamming(33)
    h = np.round(h / h.sum() * (1 << 15)).astype(np.int64)
    y = np.convolve(x.astype(np.int64), h)[16 : 16 + len(x)] >> 15
    return np.clip(y, -32768, 32767)


def test_bandwidth_calibration():
    sr, n = 16000, 16000
    t = np.arange(n)
    noise = _lcg_noise(n).astype(np.int16)
    st, _, octs, est = band_of(noise, sr)
    assert st == "ok" and est == sr // 2 and 400 <= octs[0] <= 600

    # proper-resampler band limits read the matching octave ceiling
    st, _, octs, est = band_of(_lowpass(noise, sr, 2000).astype(np.int16), sr)
    assert st == "ok" and est == sr // 4 and octs[0] < rules.BW_ACTIVE_MIN_PERMILLE
    st, _, octs, est = band_of(_lowpass(noise, sr, 900).astype(np.int16), sr)
    assert st == "ok" and est == sr // 8

    # a pure tone at half the first split leaks < 4 permille into oct1
    tone2k = np.round(8000 * np.sin(2 * np.pi * 2000 * t / sr)).astype(np.int16)
    assert band_of(tone2k, sr)[2][0] < rules.BW_ACTIVE_MIN_PERMILLE
    # a top-octave tone reads full-band
    tone6k = np.round(8000 * np.sin(2 * np.pi * 6000 * t / sr)).astype(np.int16)
    assert band_of(tone6k, sr)[3] == sr // 2
    # a deep tone concentrates below every split
    tone440 = np.round(8000 * np.sin(2 * np.pi * 440 * t / sr)).astype(np.int16)
    st, _, octs, est = band_of(tone440, sr)
    assert st == "ok" and est == sr // 16 and octs[0] == 0


def test_bandwidth_short_silent():
    sr = 16000
    st, n, octs, est = band_of(np.zeros(4000, dtype=np.int16), sr)
    assert st == "silent" and octs == [None, None, None] and est is None
    short = np.ones(rules.BW_MIN_SAMPLES - 1, dtype=np.int16)
    st, n, octs, est = band_of(short, sr)
    assert st == "short" and n == rules.BW_MIN_SAMPLES - 1 and est is None


def test_bandwidth_engine_equals_replica(spark):
    from kneaddata_spark import oracle
    from kneaddata_spark.synth import gen_clips_pdf

    pdf = gen_clips_pdf(50)
    # plant a narrowband row: lowpass one decodable pcm clip at sr/8
    planted = None
    for i in range(len(pdf)):
        sr = int(pdf.loc[i, "sr_hz"])
        if pdf.loc[i, "codec"] != "pcm_s16le" or sr < 4000:
            continue
        x = np.frombuffer(pdf.loc[i, "bytes"], dtype="<i2").astype(np.int64)
        if len(x) < 4 * rules.BW_MIN_SAMPLES:
            continue
        # noise floor keeps the clip nonsilent across the band limit
        y = _lowpass(x + _lcg_noise(len(x), amp=6000), sr, sr // 8)
        pdf.loc[i, "bytes"] = y.astype("<i2").tobytes()
        planted = pdf.loc[i, "clip_id"]
        break
    assert planted is not None
    df = spark.createDataFrame(pdf[["clip_id", "bytes", "codec", "sr_hz"]])

    out = bandwidth_screen(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    got = {r["clip_id"]: r for r in out.collect()}
    assert len(got) > 25

    for _, row in pdf.iterrows():
        f = oracle.decode_pcm(row["bytes"], row["codec"])
        if f is None or len(f) == 0 or row["sr_hz"] <= 0:
            assert row["clip_id"] not in got
            continue
        x = np.clip(np.round(f * 32768.0), -32768, 32767).astype(np.int16)
        st, n, octs, est = _scalar_replica(x, int(row["sr_hz"]))
        r = got[row["clip_id"]]
        assert (r["status"], r["n_samples"]) == (st, n), row["clip_id"]
        assert [r["oct1_permille"], r["oct2_permille"], r["oct3_permille"]] == octs
        assert r["est_nyquist_hz"] == est
        narrow = est is not None and 2 * est < int(row["sr_hz"])
        assert r["narrowband"] == narrow
        assert r["keep"] == (st == "ok" and not narrow)

    p = got[planted]
    assert p["narrowband"] and not p["keep"]
    assert p["est_nyquist_hz"] * 4 <= int(pdf.set_index("clip_id").loc[planted, "sr_hz"])
