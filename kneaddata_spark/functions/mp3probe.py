"""REAL MPEG-1 Layer III frame-walk probe (container layer, no decode).

The mp3 companion to functions/oggopus.py, closing the container half of
the remaining codec gap: full frame-header parsing per ISO 11172-3 —
11-bit sync, version/layer fields, the 14-entry Layer III bitrate table,
the 3-entry sample-rate table, padding bit, frame-length arithmetic
(144 * bitrate / sample_rate + padding bytes), 1152 samples per frame —
walked frame by frame so truncation MID-FRAME, desynchronization and
reserved header values are all detected, and duration falls out exactly
(n_frames * 1152 samples). Frame PAYLOAD stays opaque: Layer III audio
needs Huffman + IMDCT (a real decoder drops into the same
register_codec seam); the probe is what media inventory/QC actually
needs from an mp3 — duration, bitrate, sample rate, CBR/VBR, integrity.

encode_mp3_frames builds spec-valid CBR frame sequences with zeroed
payloads (every header field real, frame lengths exact) so the walk,
the tables and the malformation handling are testable bit-for-bit
without shipping audio.
"""

from __future__ import annotations

# MPEG-1 Layer III bitrate table (kbps), index 1..14; 0 = free, 15 = bad
BITRATE_KBPS = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None)
SAMPLE_RATE = (44100, 48000, 32000, None)
SAMPLES_PER_FRAME = 1152


def _frame_len(bitrate_kbps: int, sr: int, padding: int) -> int:
    return (144 * bitrate_kbps * 1000) // sr + padding


def encode_mp3_frames(
    n_frames: int, bitrate_index: int = 9, sr_index: int = 0, pad_every: int = 0
) -> bytes:
    """Spec-valid MPEG-1 Layer III CBR stream: n_frames frames, zeroed
    payload, optional padding bit on every pad_every-th frame (exercises
    the +1 byte arithmetic). Deterministic bytes."""
    if not 1 <= bitrate_index <= 14 or not 0 <= sr_index <= 2 or n_frames < 1:
        raise ValueError("invalid mp3 parameters")
    out = bytearray()
    kbps = BITRATE_KBPS[bitrate_index]
    sr = SAMPLE_RATE[sr_index]
    for i in range(n_frames):
        padding = 1 if (pad_every and i % pad_every == 0) else 0
        # sync(11)=all 1s, version(2)=11 MPEG1, layer(2)=01 III, prot(1)=1
        b1 = 0xFF
        b2 = 0xFB  # 1110 1... -> 11111011: MPEG1, Layer III, no CRC
        b3 = (bitrate_index << 4) | (sr_index << 2) | (padding << 1)
        b4 = 0xC0  # mono (channel mode 3), no flags, emphasis none
        frame = bytes([b1, b2, b3, b4]) + bytes(_frame_len(kbps, sr, padding) - 4)
        out += frame
    return bytes(out)


def probe_mp3(raw: bytes) -> "dict | None":
    """Frame-walk the stream: every frame header must parse (sync,
    MPEG-1, Layer III, non-reserved bitrate/sample-rate) and every frame
    must be COMPLETE (a torn final frame fails — integrity, not a guess).
    Returns {n_frames, sample_rate, n_samples, cbr (1/0),
    bitrate_kbps_min, bitrate_kbps_max, n_bytes} or None.

    Real-world framing: a leading ID3v2 tag (10-byte header + syncsafe
    28-bit size, optional footer) and a trailing 128-byte ID3v1 'TAG'
    block are SKIPPED, not errors — production mp3s almost always carry
    one or both."""
    if raw is None or len(raw) < 4:
        return None
    pos, n = 0, len(raw)
    if raw[:3] == b"ID3" and n >= 10:
        if raw[3] == 0xFF or raw[4] == 0xFF or any(b & 0x80 for b in raw[6:10]):
            return None  # malformed ID3v2 header (non-syncsafe size)
        size = (raw[6] << 21) | (raw[7] << 14) | (raw[8] << 7) | raw[9]
        pos = 10 + size + (10 if raw[5] & 0x10 else 0)  # footer flag
        if pos >= n:
            return None
    if n - pos > 128 and raw[n - 128 : n - 125] == b"TAG":
        n -= 128
    audio_start = pos
    n_frames = 0
    sr0 = None
    brs = set()
    while pos < n:
        if pos + 4 > n:
            return None  # trailing garbage / torn header
        b1, b2, b3, _b4 = raw[pos : pos + 4]
        if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
            return None  # lost sync
        if (b2 & 0x18) != 0x18 or (b2 & 0x06) != 0x02:
            return None  # not MPEG-1 Layer III
        bi = (b3 >> 4) & 0x0F
        si = (b3 >> 2) & 0x03
        padding = (b3 >> 1) & 0x01
        if BITRATE_KBPS[bi] is None or SAMPLE_RATE[si] is None:
            return None  # free-format or reserved
        sr = SAMPLE_RATE[si]
        if sr0 is None:
            sr0 = sr
        elif sr != sr0:
            return None  # sample-rate change mid-stream
        flen = _frame_len(BITRATE_KBPS[bi], sr, padding)
        if pos + flen > n:
            return None  # torn final frame
        brs.add(BITRATE_KBPS[bi])
        n_frames += 1
        pos += flen
    if n_frames == 0:
        return None
    return {
        "n_frames": n_frames,
        "sample_rate": sr0,
        "n_samples": n_frames * SAMPLES_PER_FRAME,
        "cbr": 1 if len(brs) == 1 else 0,
        "bitrate_kbps_min": min(brs),
        "bitrate_kbps_max": max(brs),
        "n_bytes": n - audio_start,  # audio stream bytes, tags excluded
    }
