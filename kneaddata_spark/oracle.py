"""Pure-pandas reference oracle for the quality-filter pipeline.

Plays the role of kneaddata's external tool chain (Trimmomatic, TRF,
bowtie2/BMTagger — /root/reference/kneaddata/run.py) as the label oracle:
a deliberately simple, per-row, loop-heavy implementation of the rule spec
in ``rules.py``. The Spark engine (``pipeline.py``) is an INDEPENDENT
vectorized implementation; pytest compares the two (F1 >= 0.99 keep/drop,
scrubbed-transcript equality, decoded-PCM SNR >= 30 dB per BASELINE.json).

Never import engine code here (besides the shared rule constants and the
shared broadcastable model artifacts, which play the part of kneaddata's
read-only reference databases).
"""

from __future__ import annotations

import math
import re
import struct
from collections import Counter

import numpy as np
import pandas as pd

from . import rules
from .models import LangIdModel, PerplexityModel

S16_SCALE = 32768.0
U8_SCALE = 128.0


class _FlacBits:
    """Byte-at-a-time MSB-first bit reader for the oracle's independent
    FLAC decoder (deliberately simple per-sample loops; the engine's
    vectorized decoder lives in functions/flaccodec.py — same public
    spec, separate code, the decode_wav precedent below)."""

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.byte = 0
        self.bit = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.d):
                raise IndexError
            v = (v << 1) | ((self.d[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def s(self, n: int) -> int:
        v = self.u(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.u(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        while self.bit != 0:
            if self.u(1) != 0:
                raise ValueError("nonzero frame padding")

    def bytepos(self) -> int:
        return self.byte


def _flac_residual(br: _FlacBits, bs: int, order: int) -> list[int]:
    method = br.u(2)
    if method > 1:
        raise ValueError("residual method")
    pbits, escape = (4, 15) if method == 0 else (5, 31)
    po = br.u(4)
    if bs % (1 << po) != 0:
        raise ValueError("partition order")
    out: list[int] = []
    for p in range(1 << po):
        cnt = (bs >> po) - order if p == 0 else (bs >> po)
        if cnt < 0:
            raise ValueError("partition count")
        k = br.u(pbits)
        if k == escape:
            raw = br.u(5)
            out.extend(br.s(raw) if raw else 0 for _ in range(cnt))
        else:
            for _ in range(cnt):
                q = br.unary()
                u = (q << k) | br.u(k)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _flac_subframe(br: _FlacBits, bs: int) -> list[int]:
    if br.u(1) != 0:
        raise ValueError("subframe pad")
    ty = br.u(6)
    wasted = (br.unary() + 1) if br.u(1) else 0
    eff = 16 - wasted
    if eff <= 0:
        raise ValueError("wasted bits")
    if ty == 0:
        x = [br.s(eff)] * bs
    elif ty == 1:
        x = [br.s(eff) for _ in range(bs)]
    elif 8 <= ty <= 12:
        order = ty - 8
        x = [br.s(eff) for _ in range(order)]
        for r in _flac_residual(br, bs, order):
            if order == 0:
                x.append(r)
            elif order == 1:
                x.append(x[-1] + r)
            elif order == 2:
                x.append(2 * x[-1] - x[-2] + r)
            elif order == 3:
                x.append(3 * x[-1] - 3 * x[-2] + x[-3] + r)
            else:
                x.append(4 * x[-1] - 6 * x[-2] + 4 * x[-3] - x[-4] + r)
    elif ty >= 32:
        order = ty - 31
        x = [br.s(eff) for _ in range(order)]
        precision = br.u(4) + 1
        if precision == 16:
            raise ValueError("lpc precision")
        shift = br.s(5)
        if shift < 0:
            raise ValueError("lpc shift")
        coefs = [br.s(precision) for _ in range(order)]
        for r in _flac_residual(br, bs, order):
            pred = sum(c * x[-1 - j] for j, c in enumerate(coefs))
            x.append(r + (pred >> shift))
    else:
        raise ValueError("reserved subframe")
    if len(x) != bs:
        raise ValueError("subframe length")
    return [v << wasted for v in x] if wasted else x


_FLAC_BS = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
            8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
            13: 8192, 14: 16384, 15: 32768}


def _flac_crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r ^= b
        for _ in range(8):
            r = ((r << 1) ^ 0x07) & 0xFF if r & 0x80 else (r << 1) & 0xFF
    return r


def _decode_flac(raw: bytes) -> np.ndarray | None:
    """Independent mono/16-bit FLAC decoder (public spec; see _FlacBits)."""
    import hashlib

    try:
        if raw is None or len(raw) < 42 or raw[:4] != b"fLaC":
            return None
        pos, total, md5, ok = 4, 0, b"\x00" * 16, False
        while True:
            if pos + 4 > len(raw):
                return None
            last, btype = raw[pos] >> 7, raw[pos] & 0x7F
            blen = int.from_bytes(raw[pos + 1 : pos + 4], "big")
            body = raw[pos + 4 : pos + 4 + blen]
            if len(body) < blen or btype == 127:
                return None
            if btype == 0:
                if blen != 34:
                    return None
                br = _FlacBits(body)
                br.u(16); br.u(16); br.u(24); br.u(24)
                sr, ch, bps = br.u(20), br.u(3) + 1, br.u(5) + 1
                total = br.u(36)
                md5 = body[18:34]
                if ch != 1 or bps != 16 or sr == 0:
                    return None
                ok = True
            pos += 4 + blen
            if last:
                break
        if not ok:
            return None
        br = _FlacBits(raw[pos:])
        out: list[int] = []
        while len(out) < total:
            fstart = br.bytepos()
            if br.u(14) != 0b11111111111110 or br.u(1) != 0:
                return None
            br.u(1)
            bs_code, sr_code = br.u(4), br.u(4)
            if bs_code == 0 or sr_code == 15 or br.u(4) != 0:
                return None
            if br.u(3) not in (0, 4) or br.u(1) != 0:
                return None
            lead = br.u(8)
            if lead >= 0x80:
                nones = 0
                b = lead
                while b & 0x80:
                    nones += 1
                    b = (b << 1) & 0xFF
                if nones < 2 or nones > 7:
                    return None
                for _ in range(nones - 1):
                    if br.u(8) & 0xC0 != 0x80:
                        return None
            if bs_code == 6:
                bs = br.u(8) + 1
            elif bs_code == 7:
                bs = br.u(16) + 1
            else:
                bs = _FLAC_BS[bs_code]
            if sr_code == 12:
                br.u(8)
            elif sr_code in (13, 14):
                br.u(16)
            hdr = raw[pos + fstart : pos + br.bytepos()]
            if br.u(8) != _flac_crc8(hdr):
                return None
            out.extend(_flac_subframe(br, bs))
            br.align()
            br.u(16)                    # frame CRC-16 (md5 seals the stream)
        if len(out) != total:
            return None
        arr = np.asarray(out, dtype=np.int64)
        if len(arr) and (arr.max() > 32767 or arr.min() < -32768):
            return None
        s16 = arr.astype(np.int16)
        if md5 != b"\x00" * 16:
            if hashlib.md5(s16.astype("<i2").tobytes()).digest() != md5:
                return None
        return s16
    except (IndexError, ValueError, KeyError, OverflowError):
        return None


def decode_pcm(raw: bytes, codec: str) -> np.ndarray | None:
    """Decode bytes -> float32 PCM in [-1, 1], or None if undecodable."""
    if raw is None:
        return None
    if codec == "pcm_s16le":
        if len(raw) % 2 != 0 or len(raw) == 0:
            return None
        return (np.frombuffer(raw, dtype="<i2").astype(np.float32)) / S16_SCALE
    if codec == "pcm_u8":
        if len(raw) == 0:
            return None
        return (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / U8_SCALE
    if codec == "flac":
        s16 = _decode_flac(raw)
        if s16 is None:
            return None
        return s16.astype(np.float32) / S16_SCALE
    magic = rules.FAKE_MAGIC.get(codec)
    if magic is not None:
        if len(raw) < 8 or raw[:4] != magic:
            return None
        (plen,) = struct.unpack("<I", raw[4:8])
        payload = raw[8:]
        if plen != len(payload) or plen % 2 != 0 or plen == 0:
            return None
        return (np.frombuffer(payload, dtype="<i2").astype(np.float32)) / S16_SCALE
    if codec == "wav":
        # independent per-row RIFF walk (the engine's registered decoder
        # lives in functions/audio.decode_wav; same SPEC, separate code):
        # 16-bit mono PCM only, chunk order free, word-aligned chunks,
        # truncated chunk => undecodable
        if len(raw) < 44 or raw[0:4] != b"RIFF" or raw[8:12] != b"WAVE":
            return None
        chunks: dict[bytes, bytes] = {}
        i = 12
        while i + 8 <= len(raw):
            cid, size = raw[i : i + 4], struct.unpack("<I", raw[i + 4 : i + 8])[0]
            if i + 8 + size > len(raw):
                return None
            chunks.setdefault(cid, raw[i + 8 : i + 8 + size])
            i += 8 + size + size % 2
        if b"fmt " not in chunks or b"data" not in chunks or len(chunks[b"fmt "]) < 16:
            return None
        tag, ch = struct.unpack("<HH", chunks[b"fmt "][:4])
        bits = struct.unpack("<H", chunks[b"fmt "][14:16])[0]
        d = chunks[b"data"]
        if tag != 1 or ch != 1 or bits != 16 or len(d) == 0 or len(d) % 2:
            return None
        return (np.frombuffer(d, dtype="<i2").astype(np.float32)) / S16_SCALE
    return None


def frame_db(pcm: np.ndarray, sr: int) -> tuple[np.ndarray, int]:
    """Per-frame RMS in dBFS over non-overlapping TRIM_WIN_MS frames."""
    w = max(1, int(round(rules.TRIM_WIN_MS * sr / 1000.0)))
    nf = int(math.ceil(len(pcm) / w))
    dbs = np.empty(nf, dtype=np.float64)
    for f in range(nf):
        seg = pcm[f * w : (f + 1) * w].astype(np.float64)
        rms = math.sqrt(float(np.mean(seg * seg))) if len(seg) else 0.0
        dbs[f] = 20.0 * math.log10(rms + 1e-10)
    return dbs, w


def trim_bounds(pcm: np.ndarray, sr: int) -> tuple[int, int]:
    """(start_sample, end_sample) after stripping leading/trailing silent
    frames. end exclusive; start==end means fully silent."""
    dbs, w = frame_db(pcm, sr)
    loud = np.nonzero(dbs >= rules.TRIM_DB_FLOOR)[0]
    if len(loud) == 0:
        return 0, 0
    start = int(loud[0]) * w
    end = min(len(pcm), (int(loud[-1]) + 1) * w)
    return start, end


def char_entropy(text: str) -> float:
    s = text.strip()
    if not s:
        return 0.0
    counts = Counter(s)
    n = len(s)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def max_token_run(tokens: list[str]) -> int:
    best, run = 0, 0
    prev = object()
    for t in tokens:
        run = run + 1 if t == prev else 1
        prev = t
        best = max(best, run)
    return best


def scrub_text(text: str) -> str:
    out = text
    for pat, repl in rules.SCRUB_PATTERNS:
        out = re.sub(pat, repl, out)
    return out


def label_row(
    row: dict, langid: LangIdModel, ppl_model: PerplexityModel
) -> dict:
    """Full reference verdict for one clip. Returns labels + artifacts."""
    drop = None
    pcm = None
    tstart = tend = 0
    lang, conf, ppl = "und", 0.0, float("nan")

    if not (rules.MIN_DUR_MS <= row["dur_ms"] <= rules.MAX_DUR_MS):
        drop = "dur_bounds"
    elif row["sr_hz"] not in rules.VALID_SR_HZ:
        drop = "sr_invalid"
    elif row["codec"] not in rules.VALID_CODECS:
        drop = "codec_invalid"
    else:
        pcm = decode_pcm(row["bytes"], row["codec"])
        if pcm is None:
            drop = "decode_error"
        else:
            n_exp = round(row["dur_ms"] * row["sr_hz"] / 1000.0)
            if abs(len(pcm) - n_exp) > rules.DECODE_LEN_RTOL * n_exp:
                drop = "decode_error"
    if drop is None:
        sr = row["sr_hz"]
        tstart, tend = trim_bounds(pcm, sr)
        kept_ms = (tend - tstart) / sr * 1000.0
        input_ms = len(pcm) / sr * 1000.0
        if kept_ms < rules.POST_TRIM_MIN_MS or kept_ms < rules.POST_TRIM_MIN_RATIO * input_ms:
            drop = "post_trim_short"
        else:
            seg = np.abs(pcm[tstart:tend])
            frac = float(np.mean(seg >= rules.CLIP_SAMPLE_THRESH))
            if frac > rules.CLIP_FRAC_MAX:
                drop = "clipping"
    if drop is None:
        text = row["transcript"]
        if text is None or len(text.strip()) < rules.MIN_TRANSCRIPT_CHARS:
            drop = "transcript_empty"
        else:
            toks = text.split()
            if char_entropy(text) < rules.MIN_CHAR_ENTROPY_BITS:
                drop = "low_entropy"
            elif max_token_run(toks) > rules.MAX_TOKEN_RUN:
                drop = "repeat_run"
            elif (
                len(toks) >= rules.TOP_TOKEN_MIN_TOKENS
                and max(Counter(toks).values()) / len(toks) > rules.MAX_TOP_TOKEN_FRAC
            ):
                drop = "top_token"
            else:
                lang, conf = langid.score_one(text)
                if lang not in rules.ALLOWED_LANGS or conf < rules.LANGID_MIN_CONF:
                    drop = "langid"
                else:
                    ppl = ppl_model.ppl_one(text)
                    if ppl > rules.PPL_MAX:
                        drop = "perplexity"

    keep = drop is None
    return {
        "clip_id": row["clip_id"],
        "expect_keep": keep,
        "expect_drop_rule": drop,
        "expect_trim_start": tstart,
        "expect_trim_end": tend,
        "expect_lang": lang,
        "expect_transcript_scrubbed": scrub_text(row["transcript"]) if keep else None,
        "expect_pcm": pcm[tstart:tend] if keep and pcm is not None else None,
    }


def label_frame(pdf: pd.DataFrame, langid: LangIdModel, ppl: PerplexityModel) -> pd.DataFrame:
    return pd.DataFrame([label_row(r, langid, ppl) for r in pdf.to_dict("records")])
