"""MPEG-1 Layer III frame-walk probe: table anchors, frame-length
arithmetic, padding, VBR, malformation matrix."""

import pytest

from kneaddata_spark.functions.mp3probe import (
    BITRATE_KBPS,
    SAMPLE_RATE,
    SAMPLES_PER_FRAME,
    _frame_len,
    encode_mp3_frames,
    probe_mp3,
)


def test_tables_and_frame_length_anchors():
    # ISO 11172-3 MPEG-1 Layer III anchors
    assert BITRATE_KBPS[9] == 128 and BITRATE_KBPS[14] == 320
    assert SAMPLE_RATE[:3] == (44100, 48000, 32000)
    assert SAMPLES_PER_FRAME == 1152
    # the canonical 128 kbps @ 44.1 kHz frame: 417 bytes (+1 padded)
    assert _frame_len(128, 44100, 0) == 417
    assert _frame_len(128, 44100, 1) == 418
    assert _frame_len(320, 48000, 0) == 960


def test_cbr_roundtrip_and_padding():
    raw = encode_mp3_frames(10, bitrate_index=9, sr_index=0, pad_every=3)
    m = probe_mp3(raw)
    assert m["n_frames"] == 10 and m["sample_rate"] == 44100
    assert m["n_samples"] == 10 * 1152 and m["cbr"] == 1
    assert m["bitrate_kbps_min"] == m["bitrate_kbps_max"] == 128
    # padded frames really are one byte longer
    assert m["n_bytes"] == 10 * 417 + 4  # frames 0,3,6,9 padded


def test_vbr_detected():
    raw = encode_mp3_frames(3, 9, 0) + encode_mp3_frames(2, 11, 0)
    m = probe_mp3(raw)
    assert (m["cbr"], m["bitrate_kbps_min"], m["bitrate_kbps_max"]) == (0, 128, 192)
    assert m["n_frames"] == 5


def test_malformations():
    raw = encode_mp3_frames(5)
    assert probe_mp3(raw[:-1]) is None  # torn final frame
    assert probe_mp3(b"\x00" + raw) is None  # lost sync
    assert probe_mp3(None) is None and probe_mp3(b"") is None
    bad = bytearray(raw)
    bad[2] = (bad[2] & 0x0F) | 0xF0  # reserved bitrate index 15
    assert probe_mp3(bytes(bad)) is None
    bad2 = bytearray(raw)
    bad2[1] = 0xF3  # MPEG-2 version bits
    assert probe_mp3(bytes(bad2)) is None
    # sample-rate change mid-stream is not a legal single stream
    mix = encode_mp3_frames(2, 9, 0) + encode_mp3_frames(2, 9, 1)
    assert probe_mp3(mix) is None
    with pytest.raises(ValueError):
        encode_mp3_frames(0)
    with pytest.raises(ValueError):
        encode_mp3_frames(1, bitrate_index=15)


def test_id3_tags_skipped_not_errors():
    raw = encode_mp3_frames(4)
    # ID3v2.3 tag: 10-byte header + 100-byte body (syncsafe size 100)
    id3v2 = b"ID3" + bytes([3, 0, 0]) + bytes([0, 0, 0, 100]) + bytes(100)
    id3v1 = b"TAG" + bytes(125)
    base = probe_mp3(raw)
    for blob in (id3v2 + raw, raw + id3v1, id3v2 + raw + id3v1):
        m = probe_mp3(blob)
        assert m == base, "tags must be transparent"
    assert base["n_bytes"] == len(raw)
    # footer flag adds 10 more bytes
    footered = b"ID3" + bytes([4, 0, 0x10]) + bytes([0, 0, 0, 50]) + bytes(60)
    assert probe_mp3(footered + raw) == base
    # malformed ID3v2: non-syncsafe size byte
    bad = b"ID3" + bytes([3, 0, 0]) + bytes([0, 0, 0, 0x80]) + raw
    assert probe_mp3(bad) is None
    # tag that swallows the whole payload
    huge = b"ID3" + bytes([3, 0, 0]) + bytes([0, 0, 7, 127]) + bytes(20)
    assert probe_mp3(huge) is None
