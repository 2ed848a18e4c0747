"""Hum/DC screen (operators/hum): calibration (full-scale probe-frequency
tone scores ~1000 permille), planted hum detection over speechlike audio
with clean-signal rejection, DC-offset accounting, short/silent statuses;
engine == an independent per-sample python-int replica (only the pure
hum_basis helper is shared); one-Arrow/zero-exchange plan."""

import numpy as np

from kneaddata_spark import rules
from kneaddata_spark.operators.hum import Q15, hum_basis, hum_of, hum_screen


def _scalar_replica(x, sr):
    """Independent reference: per-sample python-int accumulation over the
    shared pure basis, explicit floor-division arithmetic."""
    n = len(x)
    xi = [int(v) for v in x]
    dc = sum(xi) // n if n else 0
    min_n = rules.HUM_MIN_CYCLES * sr // min(rules.HUM_FREQS_HZ)
    if n < max(min_n, 1):
        return ("short", n, dc, [None, None], None, None)
    total = sum(v * v for v in xi)
    if total == 0:
        return ("silent", n, dc, [None, None], None, None)
    den = total * n * Q15 * Q15
    per = []
    for f in rules.HUM_FREQS_HZ:
        c, s = hum_basis(sr, f, n)
        a = sum(xi[k] * int(c[k]) for k in range(n))
        b = sum(xi[k] * int(s[k]) for k in range(n))
        per.append((a * a + b * b) * 2000 // den)
    best = 0
    for i in range(1, len(per)):
        if per[i] > per[best]:  # first wins ties
            best = i
    return ("ok", n, dc, per, per[best], rules.HUM_FREQS_HZ[best])


def test_hum_calibration_pure_tones():
    sr = 16000
    t = np.arange(sr)  # 1 s
    for f, other in ((50, 60), (60, 50)):
        tone = np.round(20000.0 * np.sin(2 * np.pi * f * t / sr))
        x = tone.astype(np.int16)
        st, n, dc, per, hp, hz = hum_of(x, sr)
        assert st == "ok" and hz == f
        assert 950 <= hp <= 1050  # full-power tone at the probe ~ 1000
        i_other = rules.HUM_FREQS_HZ.index(other)
        assert per[i_other] < 100  # leakage at the other probe is small
    # a tone far from both probes barely registers
    tone = np.round(20000.0 * np.sin(2 * np.pi * 440 * t / sr))
    st, _, _, _, hp, _ = hum_of(tone.astype(np.int16), sr)
    assert st == "ok" and hp < 50


def test_hum_dc_short_silent():
    sr = 16000
    # DC bias on a quiet signal: exact floor-division accounting
    x = np.full(4000, 500, dtype=np.int16)
    st, n, dc, per, hp, hz = hum_of(x, sr)
    assert st == "ok" and dc == 500
    # short: fewer than HUM_MIN_CYCLES cycles of the 50 Hz probe
    min_n = rules.HUM_MIN_CYCLES * sr // 50
    st, n, dc, per, hp, hz = hum_of(np.ones(min_n - 1, dtype=np.int16), sr)
    assert st == "short" and hp is None and per == [None, None]
    # silent
    st, n, dc, per, hp, hz = hum_of(np.zeros(min_n, dtype=np.int16), sr)
    assert st == "silent" and dc == 0 and hp is None


def test_hum_planted_detection_and_clean_rejection():
    sr = 16000
    rng = np.random.default_rng(11)
    t = np.arange(2 * sr)
    speech = rng.normal(0.0, 3000.0, size=len(t))  # broadband stand-in
    hum = 4000.0 * np.sin(2 * np.pi * 60 * t / sr)
    mixed = np.clip(np.round(speech + hum), -32768, 32767).astype(np.int16)
    clean = np.clip(np.round(speech), -32768, 32767).astype(np.int16)
    st, _, _, _, hp_mix, hz = hum_of(mixed, sr)
    # hum power 4000^2/2 = 8e6 vs noise 9e6 -> ~470 permille
    assert st == "ok" and hz == 60 and hp_mix >= rules.HUM_MAX_PERMILLE
    st, _, _, _, hp_clean, _ = hum_of(clean, sr)
    assert st == "ok" and hp_clean < rules.HUM_MAX_PERMILLE // 5


def test_hum_engine_equals_replica(spark):
    from kneaddata_spark import oracle
    from kneaddata_spark.synth import gen_clips_pdf

    pdf = gen_clips_pdf(60)
    # plant one humming row and one DC-biased row on decodable pcm clips
    planted = []
    for i in range(len(pdf)):
        if pdf.loc[i, "codec"] != "pcm_s16le" or len(planted) >= 2:
            continue
        x = np.frombuffer(pdf.loc[i, "bytes"], dtype="<i2").astype(np.float64)
        sr = int(pdf.loc[i, "sr_hz"])
        if len(x) < rules.HUM_MIN_CYCLES * sr // 50 or sr <= 120:
            continue
        if not planted:  # 50 Hz hum at half the signal's rms, min 3000
            amp = max(3000.0, float(np.sqrt((x * x).mean())))
            add = amp * np.sin(2 * np.pi * 50 * np.arange(len(x)) / sr)
        else:  # DC bias
            add = 800.0
        y = np.clip(np.round(x + add), -32768, 32767).astype("<i2")
        pdf.loc[i, "bytes"] = y.tobytes()
        planted.append(pdf.loc[i, "clip_id"])
    assert len(planted) == 2
    df = spark.createDataFrame(pdf[["clip_id", "bytes", "codec", "sr_hz"]])

    out = hum_screen(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    got = {r["clip_id"]: r for r in out.collect()}
    assert len(got) > 30

    for _, row in pdf.iterrows():
        f = oracle.decode_pcm(row["bytes"], row["codec"])
        if f is None or len(f) == 0 or row["sr_hz"] <= 0:
            assert row["clip_id"] not in got
            continue
        x = np.clip(np.round(f * 32768.0), -32768, 32767).astype(np.int16)
        st, n, dc, per, hp, hz = _scalar_replica(x, int(row["sr_hz"]))
        r = got[row["clip_id"]]
        assert (r["status"], r["n_samples"], r["dc_offset"]) == (st, n, dc)
        assert [r["hum50_permille"], r["hum60_permille"]] == per
        assert (r["hum_permille"], r["hum_hz"]) == (hp, hz)
        hum_det = hp is not None and hp >= rules.HUM_MAX_PERMILLE
        dc_det = abs(dc) >= rules.DC_OFFSET_MAX
        assert r["hum_detected"] == hum_det and r["dc_detected"] == dc_det
        assert r["keep"] == (st == "ok" and not hum_det and not dc_det)

    assert got[planted[0]]["hum_detected"] and got[planted[0]]["hum_hz"] == 50
    assert got[planted[1]]["dc_detected"]
