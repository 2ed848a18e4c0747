"""Dropout/stuck-sample screen (operators/dropout): run-length kernel vs
an independent per-sample python walk, planted interior zero-gap and
stuck-sample defects detected over speechlike audio with clean-signal
rejection, boundary-silence exclusion, silent status; engine == replica
bit-for-bit over synth clips; one-Arrow/zero-exchange plan."""

import numpy as np

from kneaddata_spark import rules
from kneaddata_spark.operators.dropout import dropout_of, dropout_screen


def _scalar_replica(x, sr):
    """Independent reference: explicit per-sample walk, python ints."""
    n = len(x)
    xi = [int(v) for v in x]
    nz = [i for i, v in enumerate(xi) if v != 0]
    if not nz:
        return ("silent", n, 0, None, None, None, None, None, None, None)
    first, last = nz[0], nz[-1]
    active_n = last - first + 1
    min_run = max(1, sr * rules.DROPOUT_MIN_RUN_MS // 1000)
    runs = []  # (value, start, end) over the whole clip
    s = 0
    for i in range(1, n + 1):
        if i == n or xi[i] != xi[s]:
            runs.append((xi[s], s, i))
            s = i
    n_drop = drop_samples = max_drop = n_stuck = stuck_samples = 0
    for v, a, b in runs:
        eff = min(b, last + 1) - max(a, first)
        if eff < min_run:
            continue
        if v == 0:
            n_drop += 1
            drop_samples += eff
            max_drop = max(max_drop, eff)
        else:
            n_stuck += 1
            stuck_samples += eff
    return (
        "ok",
        n,
        active_n,
        n_drop,
        drop_samples,
        max_drop,
        n_stuck,
        stuck_samples,
        drop_samples * 1000 // active_n,
        stuck_samples * 1000 // active_n,
    )


def test_dropout_kernel_hand_cases():
    sr = 1000  # min_run = 3 samples
    # interior zero gap of 5 inside active noise
    x = np.array([0, 0, 7, 1, 2, 0, 0, 0, 0, 0, 3, 4, 9, 0, 0], dtype=np.int16)
    st, n, act, nd, ds, md, ns, ss, dp, sp = dropout_of(x, sr)
    assert (st, n, act) == ("ok", 15, 11)  # active = idx 2..12
    assert (nd, ds, md) == (1, 5, 5)
    assert (ns, ss) == (0, 0)
    assert dp == 5 * 1000 // 11 and sp == 0
    # leading/trailing silence alone is NOT a defect
    x = np.array([0] * 10 + [5, -3, 8, 1] + [0] * 10, dtype=np.int16)
    st, n, act, nd, ds, md, ns, ss, dp, sp = dropout_of(x, sr)
    assert (st, act, nd, ns, dp, sp) == ("ok", 4, 0, 0, 0, 0)
    # stuck nonzero run
    x = np.array([1, 2] + [77] * 6 + [3, 4], dtype=np.int16)
    st, n, act, nd, ds, md, ns, ss, dp, sp = dropout_of(x, sr)
    assert (nd, ns, ss) == (0, 1, 6)
    assert sp == 6 * 1000 // 10
    # a zero run SHORTER than min_run is natural
    x = np.array([1, 0, 0, 2, 3, 4], dtype=np.int16)
    assert dropout_of(x, sr)[3] == 0
    # all silent
    st = dropout_of(np.zeros(100, dtype=np.int16), sr)[0]
    assert st == "silent"
    # a gap run STRADDLING the boundary counts only its interior part
    x = np.array([0] * 4 + [9] + [0] * 5 + [8] + [0] * 4, dtype=np.int16)
    # active = idx 4..10 (7 samples); interior zeros = idx 5..9 (5)
    st, n, act, nd, ds, md, ns, ss, dp, sp = dropout_of(x, sr)
    assert (act, nd, ds) == (7, 1, 5)


def test_dropout_clean_speechlike_rejection():
    sr = 16000
    rng = np.random.default_rng(7)
    x = np.clip(
        np.round(rng.normal(0.0, 3000.0, size=2 * sr)), -32768, 32767
    ).astype(np.int16)
    st, _, _, nd, _, _, ns, _, dp, sp = dropout_of(x, sr)
    assert st == "ok" and nd == 0 and ns == 0 and dp == 0 and sp == 0


def test_dropout_engine_equals_replica(spark):
    from kneaddata_spark import oracle
    from kneaddata_spark.synth import gen_clips_pdf

    pdf = gen_clips_pdf(60)
    planted = []
    for i in range(len(pdf)):
        if pdf.loc[i, "codec"] != "pcm_s16le" or len(planted) >= 2:
            continue
        x = np.frombuffer(pdf.loc[i, "bytes"], dtype="<i2").copy()
        sr = int(pdf.loc[i, "sr_hz"])
        gap = sr * rules.DROPOUT_MIN_RUN_MS // 1000 * 40  # ~12% of 1 s
        if len(x) < 4 * gap or sr <= 0 or x[len(x) // 4] == 0:
            continue
        mid = len(x) // 2
        if not planted:  # interior zero gap (packet loss)
            x[mid : mid + gap] = 0
        else:  # stuck-sample hold
            x[mid : mid + gap] = x[mid] if x[mid] != 0 else 123
        pdf.loc[i, "bytes"] = x.tobytes()
        planted.append(pdf.loc[i, "clip_id"])
    assert len(planted) == 2
    df = spark.createDataFrame(pdf[["clip_id", "bytes", "codec", "sr_hz"]])

    out = dropout_screen(df)
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
            "status n_samples active_n n_dropouts dropout_samples "
            "max_dropout_run n_stuck stuck_samples dropout_permille "
            "stuck_permille"
        ).split()
        assert tuple(r[k] for k in names) == want, row["clip_id"]
        dd = want[8] is not None and want[8] >= rules.DROPOUT_MAX_PERMILLE
        sd = want[9] is not None and want[9] >= rules.STUCK_MAX_PERMILLE
        assert r["dropout_detected"] == dd and r["stuck_detected"] == sd
        assert r["keep"] == (want[0] == "ok" and not dd and not sd)

    assert got[planted[0]]["dropout_detected"] and not got[planted[0]]["keep"]
    assert got[planted[1]]["stuck_detected"] and not got[planted[1]]["keep"]
