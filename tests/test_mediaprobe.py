"""Media probe (operators/mediaprobe): JVM-only container-header audit —
engine == an independent python struct-parse replica over the synth
corpus; planted defects (truncated raw/wav payloads, bad_sr=0 container
rows) are flagged; plan has ZERO Python stages and zero exchanges."""

import struct

import numpy as np

from kneaddata_spark import rules
from kneaddata_spark.operators.mediaprobe import media_probe


def _replica(raw: bytes, codec: str, sr_hz: int, dur_ms: int):
    """Independent reference: python struct parsing, mirroring the
    operator's documented contract exactly."""
    nb = len(raw)
    kind = (
        "raw"
        if codec in ("pcm_s16le", "pcm_u8")
        else "container"
        if codec in ("wav", "flac", *rules.FAKE_MAGIC)
        else "unknown"
    )
    ok, container_sr, n = False, None, None
    if codec == "pcm_s16le":
        ok = nb > 0 and nb % 2 == 0
        n = nb // 2 if ok else None
    elif codec == "pcm_u8":
        ok = nb > 0
        n = nb if ok else None
    elif codec == "wav":
        if nb > 44 and raw[:4] == b"RIFF" and raw[8:16] == b"WAVEfmt ":
            fmt_size, audio_fmt, ch = (
                struct.unpack("<I", raw[16:20])[0],
                struct.unpack("<H", raw[20:22])[0],
                struct.unpack("<H", raw[22:24])[0],
            )
            bits = struct.unpack("<H", raw[34:36])[0]
            riff_len = struct.unpack("<I", raw[4:8])[0]
            data_len = struct.unpack("<I", raw[40:44])[0]
            ok = (
                fmt_size == 16
                and audio_fmt == 1
                and ch == 1
                and bits == 16
                and raw[36:40] == b"data"
                and riff_len == nb - 8
                and data_len == nb - 44
                and data_len % 2 == 0
            )
            if ok:
                container_sr = struct.unpack("<I", raw[24:28])[0]
                n = data_len // 2
    elif codec == "flac":
        if (
            nb >= 42
            and raw[:4] == b"fLaC"
            and raw[4] == 0x80
            and int.from_bytes(raw[5:8], "big") == 34
        ):
            packed = int.from_bytes(raw[18:26], "big")
            f_sr = packed >> 44
            mono16 = ((packed >> 41) & 7) == 0 and ((packed >> 36) & 31) == 15
            if mono16 and f_sr > 0:
                ok, container_sr, n = True, f_sr, packed & ((1 << 36) - 1)
    elif codec in rules.FAKE_MAGIC:
        ok = (
            nb >= 10
            and raw[:4] == rules.FAKE_MAGIC[codec]
            and struct.unpack("<I", raw[4:8])[0] == nb - 8
            and (nb - 8) % 2 == 0
        )
        n = (nb - 8) // 2 if ok else None
    status = "unknown_codec" if kind == "unknown" else "ok" if ok else "bad_container"
    eff_sr = container_sr if container_sr is not None else (sr_hz if sr_hz > 0 else None)
    probed_dur = 1000 * n // eff_sr if (n is not None and eff_sr) else None
    delta = probed_dur - dur_ms if probed_dur is not None else None
    sr_mis = container_sr is not None and container_sr != sr_hz
    dur_mis = (
        abs(delta) > rules.PROBE_DUR_TOL_MS if delta is not None else True
    ) and status != "unknown_codec"
    keep = status == "ok" and not sr_mis and not dur_mis
    return {
        "probe_kind": kind,
        "probe_status": status,
        "container_sr_hz": container_sr,
        "probed_n_samples": n,
        "probed_dur_ms": probed_dur,
        "dur_delta_ms": delta,
        "sr_mismatch": sr_mis,
        "dur_mismatch": dur_mis,
        "keep": keep,
    }


def test_media_probe_engine_equals_replica(spark):
    from kneaddata_spark.synth import gen_clips_pdf

    pdf = gen_clips_pdf(400, hidden=True)
    df = spark.createDataFrame(
        pdf[["clip_id", "bytes", "sr_hz", "dur_ms", "codec"]]
    )
    out = media_probe(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan  # zero Python stages
    assert "Exchange" not in plan
    got = {r["clip_id"]: r.asDict() for r in out.collect()}
    assert len(got) == len(pdf)  # an audit drops nothing

    by_defect = {}
    for _, row in pdf.iterrows():
        exp = _replica(
            bytes(row["bytes"]), row["codec"], int(row["sr_hz"]), int(row["dur_ms"])
        )
        r = got[row["clip_id"]]
        for k, v in exp.items():
            assert r[k] == v, (row["clip_id"], k, r[k], v)
        by_defect.setdefault((row["_defect"], row["codec"]), []).append(r)

    # planted-defect accounting:
    # truncated raw/wav payloads never keep (odd-length/bad container or
    # a duration far below the claim)
    for (d, c), rows in by_defect.items():
        if d == "truncated" and c in ("pcm_s16le", "pcm_u8", "wav"):
            assert all(not r["keep"] for r in rows), (d, c)
        if d == "none" and c in ("pcm_s16le", "wav", "flac"):
            # healthy rows agree with their own metadata
            assert all(r["keep"] for r in rows), (d, c)
    # bad_sr=0 wav/flac rows: encoder defaulted the header to 16 kHz ->
    # container disagrees with the column -> sr_mismatch
    mis = [
        r
        for (d, c), rows in by_defect.items()
        if d == "bad_sr" and c in ("wav", "flac")
        for r in rows
        if r["sr_hz"] == 0
    ]
    if mis:
        assert all(r["sr_mismatch"] and not r["keep"] for r in mis)
    # bogus codec rows report unknown_codec, never keep
    for (d, c), rows in by_defect.items():
        if c == "bogus":
            assert all(
                r["probe_status"] == "unknown_codec" and not r["keep"] for r in rows
            )


def test_media_probe_hand_built_containers(spark):
    """Byte-surgery cases the synth corpus can't plant: corrupted magic,
    wrong riff length, stereo flac, odd fake payload."""
    from kneaddata_spark.functions.flaccodec import encode_flac
    from kneaddata_spark.synth import _encode

    rng = np.random.default_rng(7)
    pcm = (0.3 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)).astype(
        np.float32
    )
    wav = _encode(pcm, "wav", rng, 16000)
    flac = encode_flac(
        np.clip(np.round(pcm * 32767), -32768, 32767).astype(np.int16), 16000
    )
    rows = [
        ("good_wav", wav, 16000, 1000, "wav", True, "ok"),
        ("bad_wav_magic", b"RIFX" + wav[4:], 16000, 1000, "wav", False, "bad_container"),
        (
            "bad_wav_rifflen",
            wav[:4] + struct.pack("<I", 999) + wav[8:],
            16000,
            1000,
            "wav",
            False,
            "bad_container",
        ),
        ("good_flac", flac, 16000, 1000, "flac", True, "ok"),
        (
            "stereo_flac",
            flac[:18]
            + bytes([flac[18], flac[19], flac[20] | 0x02])
            + flac[21:],
            16000,
            1000,
            "flac",
            False,
            "bad_container",
        ),
        ("odd_fake", rules.FAKE_MAGIC["opus"] + struct.pack("<I", 3) + b"abc", 16000, 1000, "opus", False, "bad_container"),
        ("sr_lie_wav", wav, 8000, 2000, "wav", False, "ok"),  # header says 16 kHz
    ]
    df = spark.createDataFrame(
        [(r[0], bytearray(r[1]), r[2], r[3], r[4]) for r in rows],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string",
    )
    got = {r["clip_id"]: r for r in media_probe(df).collect()}
    for cid, _, _, _, _, keep, status in rows:
        assert got[cid]["probe_status"] == status, cid
        assert got[cid]["keep"] == keep, cid
    assert got["sr_lie_wav"]["sr_mismatch"] and not got["sr_lie_wav"]["keep"]
    assert got["good_flac"]["probed_n_samples"] == 16000
    assert got["good_wav"]["container_sr_hz"] == 16000
