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
