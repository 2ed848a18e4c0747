"""Declip (operators/declip): hand-derived interpolation anchors; edge
runs hold the nearest anchor; all-clipped passes through unrecovered;
repair provably closer to the true (pre-clip) waveform than the clipped
input; engine witnesses == an independent per-sample scalar replica;
one-Arrow/zero-exchange plan."""

import zlib

import numpy as np

from kneaddata_spark.operators.declip import CLIP_S16, declip_samples, declip_stats


def _scalar_replica(x):
    """Independent per-sample reference: explicit run walk + the integer
    interpolation rule (floor division)."""
    xi = [int(v) for v in x]
    n = len(xi)
    mask = [abs(v) >= CLIP_S16 for v in xi]
    anchors = [i for i in range(n) if not mask[i]]
    if not any(mask):
        return list(xi), 0, 0, 0
    n_clipped = sum(mask)
    n_runs = sum(
        1 for i in range(n) if mask[i] and (i == 0 or not mask[i - 1])
    )
    if not anchors:
        return list(xi), n_clipped, n_runs, 0
    out = list(xi)
    for p in range(n):
        if not mask[p]:
            continue
        left = max((a for a in anchors if a < p), default=None)
        right = min((a for a in anchors if a > p), default=None)
        if left is None:
            out[p] = xi[right]
        elif right is None:
            out[p] = xi[left]
        else:
            out[p] = xi[left] + (xi[right] - xi[left]) * (p - left) // (right - left)
    return out, n_clipped, n_runs, 1


def test_declip_hand_anchors():
    x = np.array([100, 32767, 32767, -200], dtype=np.int16)
    rep, n_clipped, n_runs, ok = declip_samples(x)
    assert list(rep) == [100, 0, -100, -200]      # 100 + (-300)*i//3
    assert (n_clipped, n_runs, ok) == (2, 1, 1)

    # clipped head holds the first anchor; clipped tail holds the last
    x = np.array([32767, 32767, 50, -32768], dtype=np.int16)
    rep, n_clipped, n_runs, ok = declip_samples(x)
    assert list(rep) == [50, 50, 50, 50]
    assert (n_clipped, n_runs, ok) == (3, 2, 1)

    # entirely clipped: unrecoverable pass-through
    x = np.full(8, 32767, dtype=np.int16)
    rep, n_clipped, n_runs, ok = declip_samples(x)
    assert list(rep) == [32767] * 8 and ok == 0 and n_runs == 1


def test_declip_improves_against_true_waveform():
    # Rail-stuck defect repair: the true waveform never clips; runs of
    # samples are pinned at the rails (stuck-at defects / wrap artifacts).
    # Interpolation provably improves here. (For SATURATED peaks no int16
    # repair can beat the rail itself — true >= rail across the run — so
    # the improvement claim is only made for this defect class.)
    t = np.arange(4000)
    true = (24000.0 * np.sin(2 * np.pi * 180 * t / 16000)).astype(np.int64)
    defect = true.copy()
    rng = np.random.default_rng(7)
    n_runs_planted = 0
    for start in rng.choice(np.arange(10, 3980, 16), size=40, replace=False):
        ln = int(rng.integers(2, 9))
        defect[start : start + ln] = 32767 if (start % 2) else -32768
        n_runs_planted += 1
    clipped = defect.astype(np.int16)
    rep, n_clipped, _, ok = declip_samples(clipped)
    assert ok == 1 and n_clipped > 80
    err_rep = ((rep.astype(np.int64) - true) ** 2).sum()
    err_clip = ((clipped.astype(np.int64) - true) ** 2).sum()
    assert err_rep * 100 < err_clip  # repair recovers the waveform
    # replica agreement
    out, nc, nr, ok2 = _scalar_replica(clipped)
    assert list(rep) == out and (nc, ok2) == (n_clipped, 1)


def test_declip_saturated_peaks_replica_agreement():
    # Saturation clipping: replica + accounting agreement; the repair is
    # bounded by the rails so it cannot beat the clipped signal here.
    t = np.arange(4000)
    true = (28000.0 * np.sin(2 * np.pi * 180 * t / 16000)).astype(np.int64) * 2
    clipped = np.clip(true, -32768, 32767).astype(np.int16)
    rep, n_clipped, n_runs, ok = declip_samples(clipped)
    assert ok == 1 and n_clipped > 100 and n_runs > 50
    out, nc, nr, ok2 = _scalar_replica(clipped)
    assert list(rep) == out and (nc, nr, ok2) == (n_clipped, n_runs, 1)
    # residual clipping is zero: interpolation stays inside the anchors
    assert int((np.abs(rep.astype(np.int64)) >= CLIP_S16).sum()) == 0


def test_declip_engine_equals_replica(spark):
    from kneaddata_spark import oracle
    from kneaddata_spark.synth import gen_clips_pdf

    pdf = gen_clips_pdf(50)
    # plant heavy clipping in a few rows (synth's own clipped rows are
    # sparse): amplify 3 decodable pcm clips to the rails
    planted = 0
    for i in range(len(pdf)):
        if pdf.loc[i, "codec"] != "pcm_s16le" or planted >= 3:
            continue
        x = np.frombuffer(pdf.loc[i, "bytes"], dtype="<i2").astype(np.int64)
        pdf.loc[i, "bytes"] = (
            np.clip(x * 3, -32768, 32767).astype("<i2").tobytes()
        )
        planted += 1
    assert planted == 3
    df = spark.createDataFrame(pdf[["clip_id", "bytes", "codec"]])

    out = declip_stats(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1 and "Exchange" not in plan
    got = {r["clip_id"]: r for r in out.collect()}
    assert len(got) > 30

    n_with_clipping = 0
    for _, row in pdf.iterrows():
        f = oracle.decode_pcm(row["bytes"], row["codec"])
        if f is None or len(f) == 0:
            assert row["clip_id"] not in got
            continue
        # oracle decode is float in [-1,1]; recover the int16 domain the
        # way the engine kernel defines it
        x = np.round(f * 32768.0).astype(np.int64)
        x = np.clip(x, -32768, 32767).astype(np.int16)
        rep, n_clipped, n_runs, ok = _scalar_replica(x)
        r = got[row["clip_id"]]
        assert r["n_samples"] == len(x)
        assert r["n_clipped"] == n_clipped and r["n_runs"] == n_runs
        assert r["repaired"] == ok
        assert r["crc_raw"] == zlib.crc32(x.astype("<i2").tobytes())
        assert r["crc_repaired"] == zlib.crc32(
            np.array(rep, dtype="<i2").tobytes()
        )
        if n_clipped:
            n_with_clipping += 1
            if ok:
                # interpolation stays inside the anchor interval, so a
                # recoverable clip repairs to ZERO residual clipping
                assert r["residual_clip_permille"] == 0
        else:
            assert r["crc_repaired"] == r["crc_raw"]
    assert n_with_clipping >= 3
