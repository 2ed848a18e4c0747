"""Real-FLAC codec tests: round-trip exactness across every subframe type,
malformation rejection, and engine-vs-oracle cross-decoder parity (two
independent implementations of the public spec, the WAV precedent
test_wav.py / oracle.decode_pcm)."""

import hashlib
import struct

import numpy as np
import pytest

from kneaddata_spark.functions.flaccodec import (
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def _speech(n=24000, seed=7, sr=16000):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    pcm = 0.45 * np.sin(2 * np.pi * 300 * t) + 0.18 * np.sin(2 * np.pi * 810 * t)
    pcm = pcm + rng.normal(0, 0.02, n)
    return np.clip(np.round(pcm * 32767), -32768, 32767).astype(np.int16)


# ------------------------------------------------------------ round-trip ---


@pytest.mark.parametrize(
    "kwargs",
    [
        {},                          # fixed predictors, porder 0, bs 4096
        {"lpc_order": 8},            # LPC subframes (decoder's slow path)
        {"lpc_order": 2},
        {"porder": 3},               # 8 rice partitions per block
        {"porder": 6},
        {"block_size": 1152},        # streamable blocksize code
        {"block_size": 5000},        # needs the 16-bit blocksize escape
        {"block_size": 4096, "porder": 2, "lpc_order": 12},
    ],
)
def test_roundtrip_speech(kwargs):
    x = _speech()
    enc = encode_flac(x, 16000, **kwargs)
    dec = decode_flac(enc)
    assert dec is not None and dec.dtype == np.int16
    assert np.array_equal(dec, x)


@pytest.mark.parametrize(
    "arr",
    [
        np.zeros(5000, np.int16),                          # CONSTANT blocks
        np.full(4096, -7, np.int16),
        np.array([0], np.int16),
        np.array([1, -1, 32767, -32768], np.int16),        # extremes
        np.arange(-300, 300, dtype=np.int16),              # pure ramp (order>=2)
    ],
)
def test_roundtrip_edges(arr):
    enc = encode_flac(arr, 8000)
    dec = decode_flac(enc)
    assert dec is not None and np.array_equal(dec, arr)


def test_roundtrip_noise_verbatim():
    """Full-range white noise is incompressible -> verbatim subframes."""
    rng = np.random.default_rng(3)
    x = rng.integers(-32768, 32768, 9000).astype(np.int16)
    enc = encode_flac(x, 48000)
    assert len(enc) >= 2 * len(x)          # no free lunch on noise
    assert np.array_equal(decode_flac(enc), x)


def test_roundtrip_wasted_bits():
    x = (_speech() & ~7).astype(np.int16)  # 3 wasted bits everywhere
    base = encode_flac(_speech(), 16000)
    enc = encode_flac(x, 16000)
    assert np.array_equal(decode_flac(enc), x)
    assert len(enc) < len(base)            # wasted-bit coding actually saves


def test_compresses_speech():
    x = _speech()
    enc = encode_flac(x, 16000)
    assert len(enc) < 2 * len(x) * 0.9     # genuinely compressed


def test_empty_stream():
    enc = encode_flac(np.empty(0, np.int16), 16000)
    dec = decode_flac(enc)
    assert dec is not None and len(dec) == 0


@pytest.mark.parametrize("n", [1, 4095, 4096, 4097, 8192, 12289])
def test_blocksize_boundaries(n):
    x = _speech(n=n)
    assert np.array_equal(decode_flac(encode_flac(x, 16000)), x)


def test_property_random_signals():
    rng = np.random.default_rng(11)
    for trial in range(25):
        n = int(rng.integers(1, 20000))
        kind = trial % 5
        if kind == 0:
            x = rng.integers(-32768, 32768, n)
        elif kind == 1:
            x = np.cumsum(rng.integers(-50, 51, n))
        elif kind == 2:
            x = (3000 * np.sin(np.arange(n) / rng.uniform(2, 80))).astype(int)
        elif kind == 3:
            x = np.repeat(rng.integers(-2000, 2000, max(1, n // 7)), 7)[:n]
        else:
            x = rng.integers(-4, 4, n) << int(rng.integers(0, 10))
        x = np.clip(x, -32768, 32767).astype(np.int16)
        bs = int(rng.choice([192, 1152, 4096, 3000]))
        lpc = None if trial % 3 else int(rng.integers(1, 16))
        enc = encode_flac(x, 16000, block_size=bs, porder=int(rng.integers(0, 5)),
                          lpc_order=lpc)
        dec = decode_flac(enc)
        assert dec is not None and np.array_equal(dec, x), (trial, n, bs, lpc)


# ----------------------------------------------------------- malformation --


def _valid():
    return encode_flac(_speech(n=9000), 16000)


def test_reject_truncation():
    enc = _valid()
    for frac in (0.05, 0.4, 0.98):
        assert decode_flac(enc[: int(len(enc) * frac)]) is None


def test_reject_bitflips():
    """MD5 (or header CRC-8 / structure checks) must catch corruption.
    A flipped bit can land in zero-padding at a frame tail, so assert on
    payload-region flips which the MD5 always covers."""
    enc = _valid()
    rng = np.random.default_rng(5)
    rejected = 0
    for _ in range(12):
        i = int(rng.integers(48, len(enc)))
        bad = enc[:i] + bytes([enc[i] ^ (1 << int(rng.integers(8)))]) + enc[i + 1 :]
        if decode_flac(bad) is None:
            rejected += 1
    assert rejected >= 11                   # padding-bit flips are the only out


def test_reject_bad_magic_and_junk():
    enc = _valid()
    assert decode_flac(b"XXXX" + enc[4:]) is None
    assert decode_flac(b"") is None
    assert decode_flac(b"fLaC") is None
    assert decode_flac(bytes(1000)) is None
    rng = np.random.default_rng(9)
    assert decode_flac(rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()) is None


def test_reject_stereo_or_24bit():
    enc = bytearray(_valid())
    # STREAMINFO channels/bps live in byte 20 of the block body
    # (offset 8 + 12): 3 bits channels-1 + high bit of bps-1
    off = 8 + 12
    enc2 = bytearray(enc)
    enc2[off] = (enc2[off] & 0b11110001) | (1 << 1)  # channels-1 = 1
    assert decode_flac(bytes(enc2)) is None


def test_reject_wrong_md5():
    enc = bytearray(_valid())
    enc[8 + 18] ^= 0xFF                     # first MD5 byte
    assert decode_flac(bytes(enc)) is None


def test_reject_header_crc8():
    enc = bytearray(_valid())
    # find first frame: metadata is 4 + 4 + 34 bytes, frame starts at 42;
    # its CRC-8 is the byte right before the subframe bits — flip the
    # frame-number byte instead (covered by CRC-8)
    assert enc[42] == 0xFF and (enc[43] & 0xF8) == 0xF8
    enc[46] ^= 0x01                         # UTF-8 frame number of frame 0
    assert decode_flac(bytes(enc)) is None


def test_crc_reference_values():
    """CRC pins from the public polynomials (x^8+x^2+x+1, x^16+x^15+x^2+1)."""
    assert crc8(b"") == 0
    assert crc8(b"\x00") == 0
    assert crc8(b"\x01") == 0x07
    assert crc16(b"") == 0
    assert crc16(b"\x01") == 0x8005
    # linearity pin: crc(a xor b) == crc(a) xor crc(b) for equal lengths
    a, b = b"\x13\x37\xab", b"\x55\x00\xff"
    ab = bytes(x ^ y for x, y in zip(a, b))
    assert crc8(ab) == crc8(a) ^ crc8(b)
    assert crc16(ab) == crc16(a) ^ crc16(b)


def test_streaminfo_fields():
    x = _speech(n=10000)
    enc = encode_flac(x, 16000)
    assert enc[:4] == b"fLaC"
    assert enc[4] == 0x80                   # last-block flag + type 0
    body = enc[8 : 8 + 34]
    min_bs, max_bs = struct.unpack(">HH", body[:4])
    assert max_bs == 4096 and min_bs == 10000 - 2 * 4096
    assert body[18:34] == hashlib.md5(x.astype("<i2").tobytes()).digest()


def test_decoder_skips_extra_metadata():
    """Unknown metadata blocks (padding, vorbis comment) must be skipped."""
    enc = _valid()
    streaminfo = bytearray(enc[4 : 8 + 34])
    streaminfo[0] &= 0x7F                   # clear last-block flag
    pad = bytes([0x81]) + struct.pack(">I", 16)[1:] + bytes(16)  # last PADDING
    patched = b"fLaC" + bytes(streaminfo) + pad + enc[8 + 34 :]
    x = decode_flac(patched)
    assert x is not None and np.array_equal(x, decode_flac(enc))


# ------------------------------------------------- engine vs oracle parity --


def test_cross_decoder_parity():
    """oracle.decode_pcm('flac') is an INDEPENDENT per-sample bit-reader
    implementation of the same public spec; both must agree bit-for-bit
    (after the oracle's float32 /32768 scaling) on every subframe type."""
    from kneaddata_spark.oracle import decode_pcm

    rng = np.random.default_rng(21)
    cases = [
        encode_flac(_speech(n=7000), 16000),
        encode_flac(_speech(n=7000), 16000, lpc_order=6),
        encode_flac(_speech(n=5000) & ~3, 16000, porder=2),
        encode_flac(np.zeros(3000, np.int16), 8000),
        encode_flac(rng.integers(-32768, 32768, 2000).astype(np.int16), 48000),
    ]
    for enc in cases:
        eng = decode_flac(enc)
        ref = decode_pcm(enc, "flac")
        assert eng is not None and ref is not None
        assert np.array_equal(eng.astype(np.float32) / 32768.0, ref)
    # and identical REJECTION behavior
    bad = [cases[0][:100], b"fLaC" + bytes(60), bytes(200)]
    for raw in bad:
        assert decode_flac(raw) is None and decode_pcm(raw, "flac") is None


# ----------------------------------------------------- archival operator ---


def test_flac_archive_replica(spark):
    """flac_archive witnesses equal the codec replay over the oracle
    decode; every emitted row is round-trip exact (lossless proof);
    exactly 1 Arrow stage, 0 exchanges."""
    import zlib as _zlib

    from kneaddata_spark.operators.flacarchive import flac_archive
    from kneaddata_spark.oracle import decode_pcm
    from kneaddata_spark.synth import gen_clips_pdf

    pdf = gen_clips_pdf(40)
    base = spark.createDataFrame(pdf[["clip_id", "bytes", "codec"]])
    plan = flac_archive(base)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert plan.count("Exchange") == 0        # the operator adds no shuffle
    res = flac_archive(base.repartition(4))

    got = {r["clip_id"]: r for r in res.collect()}
    n_checked = 0
    for row in pdf.itertuples():
        f = decode_pcm(bytes(row.bytes), row.codec)
        if f is None or len(f) == 0:
            assert row.clip_id not in got
            continue
        if row.codec == "pcm_u8":
            x = (np.round(f * 128.0).astype(np.int64).astype(np.int16) * 256).astype(np.int16)
        else:
            x = np.round(f * 32768.0).astype(np.int64).clip(-32768, 32767).astype(np.int16)
        g = got[row.clip_id]
        enc = encode_flac(x, 16000)
        assert g["n_samples"] == len(x)
        assert g["flac_bytes"] == len(enc)
        assert g["ratio_permille"] == len(enc) * 1000 // (2 * len(x))
        assert g["crc_pcm"] == _zlib.crc32(x.astype("<i2").tobytes())
        assert g["roundtrip_exact"] and g["crc_rt"] == g["crc_pcm"]
        n_checked += 1
    assert n_checked >= 25


def test_flac_rows_flow_through_qc(spark):
    """End-to-end: synth now emits REAL flac; those rows decode through
    the registry inside annotate(), kept flac rows carry NULL
    bytes_trimmed (compressed payloads are not JVM-sliceable — the
    non-canonical-wav contract), and trim bounds remain exact."""
    import pyspark.sql.functions as F

    from kneaddata_spark.pipeline import annotate, broadcast_models
    from kneaddata_spark.synth import gen_clips_pdf

    pdf = gen_clips_pdf(600)
    flac_pdf = pdf[pdf["codec"] == "flac"]
    assert len(flac_pdf) > 20                 # synth coverage guard
    assert all(bytes(b)[:4] == b"fLaC" or len(bytes(b)) < 42
               for b in flac_pdf["bytes"])    # truncated-defect rows excepted
    df = spark.createDataFrame(pdf)
    ann = annotate(df, *broadcast_models(spark)).where(F.col("codec") == "flac")
    rows = ann.select("clip_id", "decode_ok", "keep", "trim_start", "trim_end",
                      F.col("bytes_trimmed").isNull().alias("null_trim")).collect()
    kept = [r for r in rows if r["keep"]]
    assert len(kept) > 5
    assert all(r["null_trim"] for r in rows)
    assert any(r["decode_ok"] for r in rows)
    assert any(not r["decode_ok"] for r in rows)   # truncated flac defects


def test_reencode_trimmed_sink(spark, clips_path, tmp_path):
    """run_qc pass-through contract + the archival re-encode sink: kept
    flac rows leave run_qc with the ORIGINAL payload, needs_reencode=true
    and exact trim bounds; reencode_trimmed turns each into a fresh FLAC
    stream that decodes EXACTLY to decoded-original[trim_start:trim_end]
    (the deferred version of the JVM bytes_trimmed slice)."""
    import pyspark.sql.functions as F

    from kneaddata_spark.operators.flacarchive import reencode_trimmed
    from kneaddata_spark.oracle import decode_pcm
    from kneaddata_spark.pipeline import run_qc

    df = spark.read.parquet(clips_path)
    res = run_qc(spark, df, str(tmp_path / "qc"))
    out = spark.read.parquet(res.out_path)
    kept = out.where("status = 'kept'")
    # contract: every kept row carries a payload; needs_reencode marks
    # exactly the rows whose payload is the untrimmed original
    assert kept.where(F.col("bytes").isNull()).count() == 0
    flagged = kept.where("needs_reencode").collect()
    assert len(flagged) > 5
    assert all(r["codec"] == "flac" for r in flagged)  # this corpus: only flac
    assert kept.where("codec = 'flac' AND NOT needs_reencode").count() == 0

    originals = {
        r["clip_id"]: (bytes(r["bytes"]), r["codec"])
        for r in df.select("clip_id", "bytes", "codec").collect()
    }
    enc = {r["clip_id"]: r for r in reencode_trimmed(kept).collect()}
    assert set(enc) == {r["clip_id"] for r in flagged}
    for r in flagged:
        g = enc[r["clip_id"]]
        assert g["roundtrip_exact"] and g["codec"] == "flac"
        raw, codec = originals[r["clip_id"]]
        full = decode_pcm(raw, codec)
        want16 = np.round(full * 32768.0).astype(np.int64).clip(-32768, 32767)
        got = decode_pcm(bytes(g["bytes"]), "flac")
        sl = want16[int(r["trim_start"]):int(r["trim_end"])]
        got16 = np.round(got * 32768.0).astype(np.int64).clip(-32768, 32767)
        assert np.array_equal(got16, sl), r["clip_id"]
        assert g["n_samples"] == len(sl)
