"""Click/pop screen (operators/click): second-difference kernel vs an
independent per-sample python walk, planted pops detected over
speechlike audio with clean/plosive rejection, adjacent-sample event
merging, short/silent statuses; engine == replica bit-for-bit over
synth clips; one-Arrow/zero-exchange plan."""

import numpy as np

from kneaddata_spark import rules
from kneaddata_spark.operators.click import click_of, click_screen


def _scalar_replica(x, sr):
    n = len(x)
    if n < 3:
        return ("short", n, None, None, None, None, None)
    xi = [int(v) for v in x]
    if all(v == 0 for v in xi):
        return ("silent", n, None, None, None, None, None)
    d2 = [abs(xi[i - 1] - 2 * xi[i] + xi[i + 1]) for i in range(1, n - 1)]
    mad = sum(d2) // (n - 2)
    thr = max(rules.CLICK_MIN_ABS, rules.CLICK_MAD_MULT * mad)
    n_hit = n_events = 0
    prev_hit = False
    max_hit = 0
    for v in d2:
        h = v >= thr
        if h:
            n_hit += 1
            max_hit = max(max_hit, v)
            if not prev_hit:
                n_events += 1
        prev_hit = h
    max_d2 = max_hit if n_hit else max(d2)
    return ("ok", n, mad, n_hit, n_events, max_d2, n_events * 60 * sr // n)


def test_click_kernel_hand_cases():
    sr = 16000
    # a single-sample pop in quiet audio is one event of 2-3 hit samples
    x = np.zeros(sr, dtype=np.int16)
    x[::50] = 100  # gentle comb so the clip is not silent, mad small
    x[8000] = 20000
    st, n, mad, nh, ne, mx, cpm = click_of(x, sr)
    assert st == "ok" and ne >= 1 and nh >= 1
    assert mx >= 20000 and cpm == ne * 60 * sr // n
    # replica agrees exactly
    assert _scalar_replica(x, sr) == click_of(x, sr)
    # short and silent fences
    assert click_of(np.zeros(2, dtype=np.int16), sr)[0] == "short"
    assert click_of(np.zeros(100, dtype=np.int16), sr)[0] == "silent"
    # adjacent hit samples merge into ONE event
    y = np.zeros(sr, dtype=np.int16)
    y[::50] = 100
    y[4000] = 18000
    y[4001] = -18000  # the same physical pop
    st, _, _, nh2, ne2, _, _ = click_of(y, sr)
    assert nh2 >= 2 and ne2 == 1


def test_click_clean_and_tone_rejection():
    sr = 16000
    rng = np.random.default_rng(5)
    noise = np.clip(
        np.round(rng.normal(0.0, 3000.0, size=2 * sr)), -32768, 32767
    ).astype(np.int16)
    st, _, _, _, ne, _, cpm = click_of(noise, sr)
    assert st == "ok" and cpm < rules.CLICK_MAX_PER_MIN
    t = np.arange(2 * sr)
    tone = np.round(20000.0 * np.sin(2 * np.pi * 220 * t / sr)).astype(np.int16)
    st, _, _, _, _, _, cpm = click_of(tone, sr)
    assert st == "ok" and cpm < rules.CLICK_MAX_PER_MIN


def test_click_engine_equals_replica(spark):
    from kneaddata_spark import oracle
    from kneaddata_spark.synth import gen_clips_pdf

    pdf = gen_clips_pdf(60)
    # plant pops into the clip with the smallest d2 scale (pops must
    # exceed CLICK_MAD_MULT x the clip's OWN mad — physically, clicks are
    # only audible against a calmer waveform)
    best, best_mad = None, None
    for i in range(len(pdf)):
        if pdf.loc[i, "codec"] != "pcm_s16le":
            continue
        x = np.frombuffer(pdf.loc[i, "bytes"], dtype="<i2")
        sr = int(pdf.loc[i, "sr_hz"])
        if len(x) < sr or sr <= 0 or not np.any(x):
            continue
        xi = x.astype(np.int64)
        mad = int(np.abs(xi[:-2] - 2 * xi[1:-1] + xi[2:]).sum()) // (len(x) - 2)
        if (best_mad is None or mad < best_mad) and rules.CLICK_MAD_MULT * (
            mad + 1
        ) < 30000:
            best, best_mad = i, mad
    assert best is not None, "no clip calm enough to host detectable pops"
    x = np.frombuffer(pdf.loc[best, "bytes"], dtype="<i2").copy()
    # 30 isolated alternating-sign pops ~ >= 10 clicks/min at any sr/dur
    idx = np.linspace(len(x) // 10, len(x) - len(x) // 10, 30).astype(int)
    x[idx] = np.where(np.arange(30) % 2 == 0, 32000, -32000)
    pdf.loc[best, "bytes"] = x.tobytes()
    planted = pdf.loc[best, "clip_id"]
    df = spark.createDataFrame(pdf[["clip_id", "bytes", "codec", "sr_hz"]])

    out = click_screen(df)
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
        want = _scalar_replica(x, int(row["sr_hz"]))
        r = got[row["clip_id"]]
        names = (
            "status n_samples d2_mad n_click_samples n_click_events "
            "max_abs_d2 clicks_per_min"
        ).split()
        assert tuple(r[k] for k in names) == want, row["clip_id"]
        det = want[6] is not None and want[6] >= rules.CLICK_MAX_PER_MIN
        assert r["click_detected"] == det
        assert r["keep"] == (want[0] == "ok" and not det)

    assert got[planted]["click_detected"] and not got[planted]["keep"]
