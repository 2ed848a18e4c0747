"""Sources (FASTQ/FASTA/SAM readers) and multimodal binary plumbing."""

from __future__ import annotations

import gzip

import pytest


@pytest.fixture(scope="module")
def fastq_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("fq") / "demo.fastq"
    recs = []
    for i in range(6):
        recs += [f"@read{i}/1", "ATGC" * 5, "+", "IIII" * 5]
    p.write_text("\n".join(recs) + "\n")
    return str(p)


def test_read_fastq(spark, fastq_file):
    from kneaddata_spark.sources.fastq import read_fastq

    df = read_fastq(spark, fastq_file)
    rows = df.orderBy("pos").collect()
    assert len(rows) == 6
    assert rows[0]["read_id"] == "read0/1" and rows[0]["seq"] == "ATGC" * 5
    assert rows[5]["pos"] == 5


def test_read_fastq_gzip(spark, tmp_path, fastq_file):
    from kneaddata_spark.sources.fastq import read_fastq

    gz = tmp_path / "demo.fastq.gz"
    gz.write_bytes(gzip.compress(open(fastq_file, "rb").read()))
    assert read_fastq(spark, str(gz)).count() == 6


def test_fastq_to_fasta_alphabet_filter(spark):
    from kneaddata_spark.sources.fastq import fastq_to_fasta

    rows = [("f", 0, "ok", "ATGCN", "IIIII"), ("f", 1, "bad", "ATXGC", "IIIII")]
    df = spark.createDataFrame(rows, "src string, pos long, read_id string, seq string, qual string")
    got = fastq_to_fasta(df).collect()
    assert [r["read_id"] for r in got] == ["ok"]
    assert "qual" not in got[0].asDict()


def test_sam_to_fastq_first_occurrence(spark):
    from kneaddata_spark.sources.fastq import sam_to_fastq

    rows = [
        ("r1", "AAAA", "IIII", 0),
        ("r1", "CCCC", "JJJJ", 1),  # duplicate id: must keep first
        ("r2", "GGGG", "KKKK", 2),
    ]
    df = spark.createDataFrame(rows, "read_id string, seq string, qual string, pos long")
    got = {r["read_id"]: r["seq"] for r in sam_to_fastq(df).collect()}
    assert got == {"r1": "AAAA", "r2": "GGGG"}


def test_split_mates_by_suffix(spark):
    from kneaddata_spark.sources.fastq import split_mates_by_suffix

    df = spark.createDataFrame([("x/1",), ("x/2",), ("solo",)], ["read_id"])
    got = {r["read_id"]: (r["mate"], r["read_key"]) for r in split_mates_by_suffix(df).collect()}
    assert got["x/1"] == (1, "x") and got["x/2"] == (2, "x") and got["solo"] == (None, "solo")


def test_scalars(spark):
    from pyspark.sql import functions as F

    from kneaddata_spark.functions.scalars import (
        phred33_mean,
        reverse_complement,
        sequence_alphabet_ok,
    )

    df = spark.createDataFrame([("ATCG", "II5I")], ["seq", "qual"])
    r = df.select(
        reverse_complement(F.col("seq")).alias("rc"),
        phred33_mean(F.col("qual")).alias("q"),
        sequence_alphabet_ok(F.col("seq")).alias("ok"),
    ).collect()[0]
    assert r["rc"] == "CGAT"
    # I=73 -> 40, 5=53 -> 20 ; mean of (40,40,20,40) = 35
    assert abs(r["q"] - 35.0) < 1e-9
    assert r["ok"] is True


def test_multimodal_image_features(spark):
    from kneaddata_spark.multimodal import extract_image_features

    rows = [("m1", b"\x01\x02\x03" * 100, "image/png", 10, 10), ("m2", b"zz", "image/jpeg", 2, 2)]
    df = spark.createDataFrame(rows, "media_id string, bytes binary, mime string, width int, height int")
    out = extract_image_features(df).collect()
    byid = {r["media_id"]: r for r in out}
    assert byid["m1"]["n_bytes"] == 300 and len(byid["m1"]["feat"]) == 8
    # deterministic: same bytes -> same feature vector
    out2 = extract_image_features(df).collect()
    assert {r["media_id"]: list(r["feat"]) for r in out2} == {
        r["media_id"]: list(r["feat"]) for r in out
    }


def test_multimodal_strict_raises(spark):
    import pytest as _pytest

    from kneaddata_spark.multimodal import extract_image_features

    df = spark.createDataFrame(
        [("m1", b"x", "image/png", 1, 1)],
        "media_id string, bytes binary, mime string, width int, height int",
    )
    with _pytest.raises(Exception, match="NotImplementedError|image decode"):
        extract_image_features(df, strict=True).collect()


def test_frame_sampling_fanout(spark):
    from kneaddata_spark.multimodal import sample_frames

    df = spark.createDataFrame(
        [("v1", bytes(range(256)) * 20, "video/mp4", 0, 0)],
        "media_id string, bytes binary, mime string, width int, height int",
    )
    frames = sample_frames(df, every_n_bytes=1024).collect()
    assert len(frames) == 5  # 5120 bytes -> 5 frames
    assert sorted(r["frame_idx"] for r in frames) == [0, 1, 2, 3, 4]


def test_write_fastq_golden_roundtrip(spark, tmp_path, fastq_file):
    """Golden-file parity (reference basic_tests.py:94-108 filecmp):
    read_fastq -> write_fastq must reproduce the input BYTE-EXACTLY."""
    from kneaddata_spark.sources.fastq import read_fastq, write_fastq

    df = read_fastq(spark, fastq_file)
    out = write_fastq(df, str(tmp_path / "emit"), single_file=True)
    assert open(out, "rb").read() == open(fastq_file, "rb").read()


def test_write_fastq_sam_pipeline_golden(spark, tmp_path):
    """sam_to_fastq -> write_fastq golden: first occurrence per id, input
    order — the reference's sam-to-fastq byte comparison, multi-partition."""
    from kneaddata_spark.sources.fastq import sam_to_fastq, write_fastq

    rows = []
    for i in range(50):
        rid = f"r{i % 20}"  # ids repeat: only first occurrence survives
        rows.append((rid, "ACGT" + str(i % 20), "IIII" + str(i % 20), i))
    sam = spark.createDataFrame(rows, "read_id string, seq string, qual string, pos bigint").repartition(7)
    fq = sam_to_fastq(sam, keep_pos=True)
    out = write_fastq(fq, str(tmp_path / "sam_emit"), order_cols=("pos",), single_file=True)
    want = "".join(f"@r{i}\nACGT{i}\n+\nIIII{i}\n" for i in range(20))
    assert open(out).read() == want


def make_bmp(px, top_down=False):
    """Independent BMP writer for tests: (H, W, 3) uint8 RGB -> bytes."""
    import struct

    import numpy as np

    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    body = rows.tobytes() if top_down else rows[::-1].tobytes()
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h if not top_down else -h,
                      1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + body


def test_bmp_decode_real_pixels():
    """decode_bmp: exact pixel recovery incl. row padding, bottom-up AND
    top-down row order; malformed inputs rejected."""
    import numpy as np

    from kneaddata_spark.multimodal import decode_bmp

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)  # w=3 -> padded rows
    for td in (False, True):
        got = decode_bmp(make_bmp(px, top_down=td))
        assert got is not None and np.array_equal(got, px), td
    assert decode_bmp(b"BMjunk") is None
    assert decode_bmp(make_bmp(px)[:40]) is None
    bad_bpp = bytearray(make_bmp(px)); bad_bpp[28] = 8  # 8-bit
    assert decode_bmp(bytes(bad_bpp)) is None


def test_bmp_real_features_through_spark(spark):
    """A registered-mime (image/bmp) row flows through the mapInPandas
    feature stage with REAL pixel statistics: header-derived geometry
    overrides the metadata columns, feat[0:3] is the channel means; and
    strict=True does NOT raise for the decodable row."""
    import numpy as np

    from kneaddata_spark.multimodal import IMAGE_META_SCHEMA, extract_image_features

    px = np.zeros((4, 6, 3), dtype=np.uint8)
    px[:, :, 0] = 255  # pure red
    raw = make_bmp(px)
    df = spark.createDataFrame(
        [("bmp1", bytearray(raw), "image/bmp", 999, 999)], IMAGE_META_SCHEMA
    )
    r = extract_image_features(df, strict=True).collect()[0]
    assert (r["width"], r["height"]) == (6, 4)  # header wins over metadata
    assert abs(r["feat"][0] - 1.0) < 1e-6 and abs(r["feat"][1]) < 1e-6
    assert abs(r["feat"][6] - 6 / 4) < 1e-6  # aspect ratio
    assert r["n_bytes"] == len(raw)


def test_bmp_mixed_with_fake_mimes(spark):
    """Mixed batch: bmp rows decode for real, unregistered mimes keep the
    deterministic fake feature; strict=True raises ONLY when an
    unregistered mime is present."""
    import numpy as np
    import pytest as _pytest

    from kneaddata_spark.multimodal import IMAGE_META_SCHEMA, extract_image_features

    px = np.full((2, 2, 3), 128, dtype=np.uint8)
    rows = [
        ("a", bytearray(make_bmp(px)), "image/bmp", 2, 2),
        ("b", bytearray(b"\x01\x02" * 50), "image/png", 10, 10),
    ]
    df = spark.createDataFrame(rows, IMAGE_META_SCHEMA)
    out = {r["media_id"]: r for r in extract_image_features(df).collect()}
    assert abs(out["a"]["feat"][0] - 128 / 255) < 1e-6
    assert len(out["b"]["feat"]) == 8  # fake path intact
    with _pytest.raises(Exception, match="NotImplementedError|no registered image decoder"):
        extract_image_features(df, strict=True).collect()


# ------------------------------------------------------------ JSONL source --


def test_jsonl_source_quarantine_split(spark, tmp_path):
    """read_documents_jsonl: clean/quarantine split over a gzipped shard
    with planted corruption — broken JSON, a blank line, and a valid
    object missing a required field all land in quarantine with reasons;
    row accounting closes (clean + quarantine == lines); extra JSON keys
    are ignored."""
    import gzip
    import json

    from kneaddata_spark.sources.jsonl import read_documents_jsonl

    lines = [
        json.dumps({"doc_id": 1, "lang": "en", "source": "web", "text": "hello world"}),
        json.dumps({"doc_id": 2, "text": "no dims", "extra_key": [1, 2]}),
        '{"doc_id": 3, "text": unquoted oops',               # broken JSON
        "",                                                   # blank line
        json.dumps({"doc_id": 4, "lang": "fr"}),              # missing text
        json.dumps({"lang": "de", "text": "missing id"}),     # missing doc_id
        json.dumps({"doc_id": 5, "text": "ok again"}),
    ]
    p = tmp_path / "shard.jsonl.gz"
    with gzip.open(p, "wt") as f:
        f.write("\n".join(lines))

    clean, quar = read_documents_jsonl(spark, str(p))
    got = {r["doc_id"]: r for r in clean.collect()}
    assert set(got) == {1, 2, 5}
    assert got[1]["lang"] == "en" and got[2]["lang"] is None
    assert got[2]["text"] == "no dims"  # extra keys ignored

    q = {r["raw_line"]: r["reason"] for r in quar.collect()}
    assert len(q) == 4 and clean.count() + quar.count() == len(lines)
    assert q[lines[2]] == "unparseable" and q[""] == "unparseable"
    assert q[lines[4]] == "missing:text"
    assert q[lines[5]] == "missing:doc_id"


# ------------------------------------------------------------ PNG kernel --


def make_png(px, filters=None, ctype=2, depth=8, interlace=0, corrupt_crc=False):
    """Independent PNG writer for tests: (H, W, C) uint8 -> bytes, with an
    EXPLICIT filter type per scanline (encode side of the spec's filter
    definitions — exercises the decoder's unfilter paths one by one)."""
    import struct
    import zlib

    import numpy as np

    h, w = px.shape[0], px.shape[1]
    c = 1 if px.ndim == 2 else px.shape[2]
    flat = px.reshape(h, w * c).astype(np.int32)
    bpp = c
    if filters is None:
        filters = [0] * h
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        row, f = flat[y], filters[y]
        if f == 0:
            filt = row % 256
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            filt = (row - left) % 256
        elif f == 2:
            filt = (row - prev) % 256
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            filt = (row - (left + prev) // 2) % 256
        elif f == 4:
            filt = np.empty(w * c, dtype=np.int32)
            for x in range(w * c):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                filt[x] = (row[x] - pred) % 256
        raw.append(f)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = row

    def chunk(cid, body):
        crc = zlib.crc32(cid + body) & 0xFFFFFFFF
        if corrupt_crc and cid == b"IDAT":
            crc ^= 1
        return struct.pack(">I", len(body)) + cid + body + struct.pack(">I", crc)

    ct = {1: 0, 3: 2, 4: 6}[c] if ctype == "auto" else ctype
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ct, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_all_filters_pixel_exact():
    """decode_png recovers pixels EXACTLY through every scanline filter
    (None/Sub/Up/Average/Paeth), for RGB, grayscale (-> replicated to 3
    channels) and RGBA (alpha dropped); corrupt CRC / palette / 16-bit /
    interlaced payloads return None."""
    import numpy as np

    from kneaddata_spark.multimodal import decode_png

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    got = decode_png(make_png(px, filters=[0, 1, 2, 3, 4]))
    assert got is not None and np.array_equal(got, px)

    gray = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    got = decode_png(make_png(gray, filters=[4, 3, 2, 1], ctype=0))
    assert got is not None and np.array_equal(got, np.repeat(gray[:, :, None], 3, 2))

    rgba = rng.integers(0, 256, size=(3, 4, 4), dtype=np.uint8)
    got = decode_png(make_png(rgba, filters=[1, 4, 3], ctype=6))
    assert got is not None and np.array_equal(got, rgba[:, :, :3])

    assert decode_png(make_png(px, corrupt_crc=True)) is None
    assert decode_png(make_png(px, ctype=3)) is None       # palette
    assert decode_png(make_png(px, depth=16)) is None      # 16-bit
    assert decode_png(make_png(px, interlace=1)) is None   # Adam7
    assert decode_png(make_png(px)[:-8]) is None           # truncated IEND
    assert decode_png(b"\x89PNG\r\n\x1a\n" + b"junk" * 10) is None


def test_png_real_features_through_spark(spark):
    """image/png rows flow through the mapInPandas feature stage with REAL
    decompressed pixel statistics under strict=True — the compressed-
    format proof of the registry seam (a zlib DEFLATE stream, not a
    fixed-layout container)."""
    import numpy as np

    from kneaddata_spark.multimodal import IMAGE_META_SCHEMA, extract_image_features

    px = np.zeros((4, 8, 3), dtype=np.uint8)
    px[:, :, 2] = 200  # pure-ish blue
    raw = make_png(px, filters=[0, 2, 2, 2])
    df = spark.createDataFrame(
        [("png1", bytearray(raw), "image/png", 1, 1)], IMAGE_META_SCHEMA
    )
    r = extract_image_features(df, strict=True).collect()[0]
    assert (r["width"], r["height"]) == (8, 4)  # header wins over metadata
    assert abs(r["feat"][2] - 200 / 255) < 1e-6 and abs(r["feat"][0]) < 1e-6
    assert abs(r["feat"][6] - 8 / 4) < 1e-6


# ------------------------------------------------------- RIFF/AVI kernel --


def _avi_chunk(cid: bytes, body: bytes) -> bytes:
    import struct

    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _avi_list(ltype: bytes, body: bytes) -> bytes:
    return _avi_chunk(b"LIST", ltype + body)


def _build_avi(frames_px, top_down: bool = False, compression: int = 0) -> bytes:
    """Hand-built spec-correct AVI: RIFF('AVI ') -> LIST(hdrl){avih,
    LIST(strl){strh('vids'), strf(BITMAPINFOHEADER)}} -> LIST(movi){00db*}.
    frames_px: list of (H, W, 3) uint8 RGB arrays."""
    import struct

    import numpy as np

    h, w = frames_px[0].shape[:2]
    stride = (w * 3 + 3) & ~3
    avih = struct.pack(
        "<14I", 40000, 0, 0, 0, len(frames_px), 0, 1, stride * h, w, h, 0, 0, 0, 0
    )
    strh = b"vids" + b"DIB " + b"\x00" * 48  # 56 bytes; parser reads fccType
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, (-h if top_down else h), 1, 24, compression, stride * h, 0, 0, 0, 0,
    )

    def frame_bytes(px):
        bgr = px[:, :, ::-1]
        if not top_down:
            bgr = bgr[::-1]
        out = np.zeros((h, stride), np.uint8)
        out[:, : w * 3] = bgr.reshape(h, w * 3)
        return out.tobytes()

    hdrl = _avi_list(
        b"hdrl",
        _avi_chunk(b"avih", avih)
        + _avi_list(b"strl", _avi_chunk(b"strh", strh) + _avi_chunk(b"strf", strf)),
    )
    movi = _avi_list(
        b"movi", b"".join(_avi_chunk(b"00db", frame_bytes(f)) for f in frames_px)
    )
    return _avi_chunk(b"RIFF", b"AVI " + hdrl + movi)


def _gradient_frames(n=4, h=5, w=3):
    """w=3 -> 9-byte rows -> 3 pad bytes per row: exercises the stride."""
    import numpy as np

    frames = []
    for k in range(n):
        px = np.zeros((h, w, 3), np.uint8)
        px[:, :, 0] = np.arange(h, dtype=np.uint8)[:, None] * 10 + k
        px[:, :, 1] = np.arange(w, dtype=np.uint8)[None, :] * 20 + k
        px[:, :, 2] = 7 * k
        frames.append(px)
    return frames


def test_decode_avi_frames_pixel_exact_roundtrip():
    """Real kernel: build -> decode must return every frame pixel-exact,
    honoring row padding and bottom-up row order (+ top-down variant)."""
    import numpy as np

    from kneaddata_spark.multimodal import decode_avi_frames

    frames = _gradient_frames()
    for td in (False, True):
        got = decode_avi_frames(_build_avi(frames, top_down=td))
        assert got is not None and len(got) == len(frames)
        for want, have in zip(frames, got):
            assert np.array_equal(want, have), td

    # rejections -> None (stub fallback), never garbage pixels
    assert decode_avi_frames(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert decode_avi_frames(_build_avi(frames, compression=1)) is None  # MSRLE
    truncated = _build_avi(frames)[:-10]
    assert decode_avi_frames(truncated) is None


def test_sample_frames_real_avi_through_spark_seam(spark):
    """The registered video/avi kernel through the mapInPandas stage: one
    row per real frame with exact crc + pixel stats; an undecodable
    payload in the SAME batch falls back to the byte-chunk stub (NULL
    stats); every_n_frames subsamples."""
    import zlib

    import numpy as np

    from kneaddata_spark.multimodal import sample_frames

    frames = _gradient_frames(n=4)
    avi = _build_avi(frames)
    df = spark.createDataFrame(
        [
            ("v1", avi, "video/avi", 0, 0),
            ("v2", bytes(range(256)) * 8, "video/avi", 0, 0),  # undecodable
        ],
        "media_id string, bytes binary, mime string, width int, height int",
    )
    got = {
        (r["media_id"], r["frame_idx"]): r for r in sample_frames(df).collect()
    }
    assert sorted(k for k in got if k[0] == "v1") == [("v1", i) for i in range(4)]
    for i, fr in enumerate(frames):
        r = got[("v1", i)]
        assert r["frame_crc"] == zlib.crc32(fr.tobytes())
        assert abs(r["frame_mean"] - float(fr.astype(np.float64).mean())) < 1e-9
        assert abs(r["frame_std"] - float(fr.astype(np.float64).std())) < 1e-9
    # stub fallback rows: byte-chunk fanout, NULL pixel stats
    v2 = [k for k in got if k[0] == "v2"]
    assert len(v2) == 2  # 2048 bytes // 1024
    assert got[("v2", 0)]["frame_mean"] is None

    sub = sample_frames(df.where("media_id = 'v1'"), every_n_frames=2).collect()
    assert sorted(r["frame_idx"] for r in sub) == [0, 2]


def test_sample_frames_strict_raises_only_without_kernel(spark):
    """strict=True is the marked missing-kernel mode: it raises for an
    unregistered mime but NOT for a payload the real AVI kernel decodes."""
    import pytest as _pytest

    from kneaddata_spark.multimodal import frame_sample_stage

    avi_df = spark.createDataFrame(
        [("v1", _build_avi(_gradient_frames(n=2)), "video/avi", 0, 0)],
        "media_id string, bytes binary, mime string, width int, height int",
    )
    from kneaddata_spark.multimodal import FRAME_SAMPLE_SCHEMA

    ok = avi_df.mapInPandas(
        frame_sample_stage(strict=True), schema=FRAME_SAMPLE_SCHEMA
    ).collect()
    assert len(ok) == 2
    mp4_df = avi_df.withColumn("mime", avi_df.mime.substr(0, 0))  # '' mime
    with _pytest.raises(Exception, match="NotImplementedError|video decoder"):
        mp4_df.mapInPandas(
            frame_sample_stage(strict=True), schema=FRAME_SAMPLE_SCHEMA
        ).collect()


def test_resize_stage_real_bmp(spark):
    """Real-kernel resize: a 10x6 gradient BMP downsampled to max-dim 4
    matches the integer nearest-neighbor replica pixel-for-pixel (crc +
    mean over exact expected pixels); small images pass through unscaled;
    unregistered mimes emit NULL dims (and raise under strict=True)."""
    import zlib

    import numpy as np
    import pytest

    from kneaddata_spark.multimodal import resize_images, resize_nn

    px = (np.arange(10 * 6 * 3, dtype=np.uint32) * 7 % 256).astype(np.uint8).reshape(10, 6, 3)
    small = (np.arange(2 * 3 * 3) % 256).astype(np.uint8).reshape(2, 3, 3)
    rows = [
        ("a", bytearray(make_bmp(px)), "image/bmp"),
        ("b", bytearray(make_bmp(small)), "image/bmp"),
        ("c", bytearray(b"\x89PNG fake"), "image/png"),
    ]
    df = spark.createDataFrame(rows, "media_id string, bytes binary, mime string")
    got = {r["media_id"]: r.asDict() for r in resize_images(df, target=4).collect()}

    # independent replica of the integer NN rule for the 10x6 -> 4x2 case
    ri = (np.arange(4, dtype=np.int64) * 10) // 4
    ci = (np.arange(2, dtype=np.int64) * 6) // 2
    want = px[ri][:, ci]
    assert (got["a"]["new_h"], got["a"]["new_w"]) == (4, 2)
    assert got["a"]["resized_crc"] == zlib.crc32(np.ascontiguousarray(want).tobytes())
    assert got["a"]["resized_mean"] == float(want.astype(np.float64).mean())
    assert resize_nn(px, 4).tolist() == want.tolist()
    # small image passes through
    assert (got["b"]["new_h"], got["b"]["new_w"]) == (2, 3)
    assert got["b"]["resized_crc"] == zlib.crc32(np.ascontiguousarray(small).tobytes())
    # unregistered mime: NULL dims (lenient) / raise (strict)
    assert got["c"]["new_w"] is None and got["c"]["resized_crc"] is None
    with pytest.raises(Exception):
        resize_images(df, target=4, strict=True).collect()
