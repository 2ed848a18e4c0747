"""Baseline JPEG codec: roundtrip quality, independent DCT/Huffman
verification, hand-assembled known-value streams (decoder checked
against the spec, not just against our own encoder), malformation
rejection, and the image-registry flow."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kneaddata_spark.functions.jpegcodec import (
    _canonical_codes,
    _huff_lengths,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def _smooth(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    g = (128 + 90 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.uint8)
    return np.stack([g, np.roll(g, 5, 1), 255 - g], axis=2)


# ------------------------------------------------------------ roundtrip ----


def test_roundtrip_quality_thresholds():
    rgb = _smooth()
    gray = rgb[:, :, 0]
    assert _psnr(np.repeat(gray[:, :, None], 3, 2),
                 decode_jpeg(encode_jpeg(gray, 90))) > 45
    assert _psnr(rgb, decode_jpeg(encode_jpeg(rgb, 90, "444"))) > 38
    assert _psnr(rgb, decode_jpeg(encode_jpeg(rgb, 90, "420"))) > 28


def test_quality_dial_monotone():
    rgb = _smooth()
    lo, hi = encode_jpeg(rgb, 30), encode_jpeg(rgb, 95)
    assert len(hi) > len(lo)
    assert _psnr(rgb, decode_jpeg(hi)) > _psnr(rgb, decode_jpeg(lo))


def test_uniform_image_exact():
    """DC-only blocks quantize losslessly at any quality >= 50 (DC step
    <= 16 but the diff is a multiple of ... just assert tight)."""
    for v in (0, 77, 128, 255):
        out = decode_jpeg(encode_jpeg(np.full((16, 24), v, np.uint8), 90))
        assert int(out.min()) >= v - 1 and int(out.max()) <= v + 1


@pytest.mark.parametrize("hw", [(1, 1), (7, 9), (8, 8), (17, 33), (16, 16)])
@pytest.mark.parametrize("sub", ["444", "420"])
def test_odd_sizes_roundtrip(hw, sub):
    rng = np.random.default_rng(hw[0] * 100 + hw[1])
    base = rng.integers(90, 160, size=(*hw, 3))  # low contrast: bounded err
    img = base.astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, 95, sub))
    assert out is not None and out.shape == (*hw, 3)


# ------------------------------------------- independent kernel checks -----


def test_dct_matches_direct_cosine_sum():
    """The matmul FDCT/IDCT against the T.81 A.3.3 double sum, written
    independently here."""
    from kneaddata_spark.functions.jpegcodec import _D, _idct_blocks, _ZIG

    rng = np.random.default_rng(0)
    B = rng.uniform(-128, 127, size=(8, 8))

    def direct_fdct(b):
        out = np.zeros((8, 8))
        for u in range(8):
            for v in range(8):
                cu = 1 / np.sqrt(2) if u == 0 else 1.0
                cv = 1 / np.sqrt(2) if v == 0 else 1.0
                s = 0.0
                for x in range(8):
                    for y in range(8):
                        s += (
                            b[x, y]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                out[u, v] = 0.25 * cu * cv * s
        return out

    want = direct_fdct(B)
    got = _D @ B @ _D.T
    assert np.max(np.abs(got - want)) < 1e-9
    # inverse: zigzag the coefficients, run the production IDCT path
    zz = got.reshape(64)[_ZIG][None, :]
    back = _idct_blocks(zz)[0]
    assert np.max(np.abs(back - B)) < 1e-9


def test_huffman_tables_valid_and_decodable():
    """Random frequency maps -> canonical tables: lengths <= 16, Kraft
    sum < 1 (the all-ones max-length code stays reserved), and a
    bit-by-bit INDEPENDENT tree decoder recovers an encoded stream."""
    rng = np.random.default_rng(42)
    for trial in range(60):
        n = int(rng.integers(1, 120))
        syms = rng.choice(256, size=n, replace=False)
        freq = {int(s): int(rng.integers(1, 10_000)) for s in syms}
        # skewed tails stress the 16-bit cap
        if trial % 3 == 0:
            for i, s in enumerate(sorted(freq)):
                freq[s] = 2**i if i < 40 else 1
        lengths = _huff_lengths(freq)
        assert set(lengths) == set(freq)
        assert max(lengths.values()) <= 16
        kraft = sum(2.0 ** -ln for ln in lengths.values())
        assert kraft < 1.0 + 1e-12
        codes = _canonical_codes(lengths)
        # no real symbol holds the all-ones code of the max length
        maxlen = max(lengths.values())
        assert all(
            not (ln == maxlen and c == (1 << ln) - 1) for c, ln in codes.values()
        )
        # encode a random stream, decode with an independent prefix walk
        stream = rng.choice(list(freq), size=50)
        bits = "".join(format(codes[int(s)][0], f"0{codes[int(s)][1]}b") for s in stream)
        by_code = {(c, ln): s for s, (c, ln) in codes.items()}
        out, acc, ln = [], 0, 0
        for ch in bits:
            acc, ln = (acc << 1) | (ch == "1"), ln + 1
            if (acc, ln) in by_code:
                out.append(by_code[(acc, ln)])
                acc, ln = 0, 0
        assert ln == 0 and out == [int(s) for s in stream]


# ------------------------------------------ hand-assembled known value -----


def _minimal_gray_jpeg(h, w, scan: bytes, dri: int = 0) -> bytes:
    """Grayscale baseline stream with all-ones quant and one-entry
    Huffman tables (DC category 10 -> code '0'; AC EOB -> code '0'),
    assembled from the spec in this test, not by the encoder."""
    out = bytearray(b"\xff\xd8")
    dqt = bytes([0]) + bytes([1] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + bytes([1] + [0] * 15) + bytes([10])   # DC: '0'->cat 10
    dht += bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0])   # AC: '0'->EOB
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


def test_known_value_single_block():
    """Uniform 200 block, quant 1: DC = 8*(200-128) = 576, category 10.
    Scan bits: '0' (DC code) + 1001000000 (576) + '0' (EOB) + pad ones
    = 0x48 0x0F. Every byte here derives from T.81 by hand — if the
    decoder disagrees, the decoder is wrong."""
    out = decode_jpeg(_minimal_gray_jpeg(8, 8, bytes([0x48, 0x0F])))
    assert out is not None and out.shape == (8, 8, 3)
    assert np.all(out == 200)


def test_known_value_restart_marker():
    """Two MCUs split by RST0 with DRI=1: the DC predictor must reset, so
    both blocks carry the same diff bits and both decode to 200."""
    blk = bytes([0x48, 0x0F])
    out = decode_jpeg(_minimal_gray_jpeg(8, 16, blk + b"\xff\xd0" + blk, dri=1))
    assert out is not None and out.shape == (8, 16, 3)
    assert np.all(out == 200)


def test_stray_restart_rejected():
    blk = bytes([0x48, 0x0F])
    assert decode_jpeg(_minimal_gray_jpeg(8, 8, blk + b"\xff\xd0" + blk)) is None


# --------------------------------------------------------- malformation ----


def test_reject_malformed():
    blob = encode_jpeg(_smooth(), 80)
    assert decode_jpeg(None) is None
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"\xff\xd8junk") is None
    assert decode_jpeg(blob[:40]) is None                 # truncated headers
    assert decode_jpeg(blob[:-30]) is None                # truncated scan
    prog = bytearray(blob)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2                                    # progressive SOF2
    assert decode_jpeg(bytes(prog)) is None
    nod = bytearray(blob)
    j = nod.find(b"\xff\xc4")
    nod[j + 1] = 0xFE                                     # DHT -> COM: no tables
    assert decode_jpeg(bytes(nod)) is None


def test_decoder_skips_appn_and_com():
    blob = bytearray(encode_jpeg(_smooth()[:, :, 0], 85))
    extra = b"\xff\xee" + struct.pack(">H", 9) + b"Adobe?!" \
        + b"\xff\xfe" + struct.pack(">H", 6) + b"hiya"
    out = bytes(blob[:2]) + extra + bytes(blob[2:])
    assert decode_jpeg(out) is not None


# ------------------------------------------------------------- registry ----


def test_registry_flow_real_jpeg(spark):
    from kneaddata_spark.multimodal import extract_image_features

    rgb = _smooth(24, 40)
    blob = encode_jpeg(rgb, 90, "444")
    rows = [("j1", blob, "image/jpeg", 1, 1), ("j2", b"zz", "image/jpeg", 2, 2)]
    df = spark.createDataFrame(
        rows, "media_id string, bytes binary, mime string, width int, height int"
    )
    out = {r["media_id"]: r for r in extract_image_features(df).collect()}
    # decoded header dims override the (wrong) metadata columns
    assert (out["j1"]["height"], out["j1"]["width"]) == (24, 40)
    # feature[7] is luma mean / 255 (real pixels, not the fake fallback)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    assert abs(out["j1"]["feat"][7] - y.mean() / 255.0) < 0.02
    # undecodable payload still flows (deterministic fallback)
    assert len(out["j2"]["feat"]) == 8
