"""Vectorized audio stage: decode -> silence trim -> clipping screen.

This is the Trimmomatic-analog compute kernel (reference invocation:
/root/reference/kneaddata/run.py:372-450; SLIDINGWINDOW semantics
config.py:44). It runs inside ``mapInPandas`` over Arrow batches — the only
python in the hot path is a short per-row loop dispatching numpy kernels
(``np.frombuffer`` decode, ``np.add.reduceat`` frame energies); all sample
math is numpy. No row-at-a-time Python UDFs anywhere (BASELINE input_hint).

Independent from ``oracle.decode_pcm``/``oracle.trim_bounds`` (per-row,
loop-based) — parity between the two is what the tests measure.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from .. import rules

_S16 = 32768.0
_U8 = 128.0

# appended by the audio stage
AUDIO_FEATURE_SCHEMA = (
    "decode_ok boolean, n_samples bigint, trim_start bigint, trim_end bigint, "
    "clip_frac double, bytes_trimmed binary"
)


def _decode(raw, codec: str):
    """bytes -> float32 PCM or None. Vectorized numpy reinterpretation."""
    if raw is None or len(raw) == 0:
        return None
    if codec == "pcm_s16le":
        if len(raw) & 1:
            return None
        return np.frombuffer(raw, dtype="<i2").astype(np.float32) * (1.0 / _S16)
    if codec == "pcm_u8":
        return (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) * (1.0 / _U8)
    magic = rules.FAKE_MAGIC.get(codec)
    if magic is not None:
        if len(raw) < 8 or bytes(raw[:4]) != magic:
            return None
        plen = struct.unpack("<I", raw[4:8])[0]
        if plen != len(raw) - 8 or plen & 1 or plen == 0:
            return None
        return np.frombuffer(raw, dtype="<i2", offset=8).astype(np.float32) * (1.0 / _S16)
    return None


def _slice_bytes(raw, codec: str, start: int, end: int):
    """Exact byte-level slice of the encoded payload at sample boundaries —
    re-decoding the slice reproduces the trimmed PCM bit-for-bit (the SNR
    invariant is exact by construction)."""
    if codec == "pcm_s16le":
        return bytes(raw[2 * start : 2 * end])
    if codec == "pcm_u8":
        return bytes(raw[start:end])
    magic = rules.FAKE_MAGIC[codec]
    payload = bytes(raw[8 + 2 * start : 8 + 2 * end])
    return magic + struct.pack("<I", len(payload)) + payload


def _trim_bounds_vec(pcm: np.ndarray, sr: int) -> tuple[int, int]:
    """Frame-RMS silence trim via one reduceat over cumulative energy."""
    w = max(1, int(round(rules.TRIM_WIN_MS * sr / 1000.0)))
    n = len(pcm)
    starts = np.arange(0, n, w)
    sq = pcm.astype(np.float64)
    sq *= sq
    sums = np.add.reduceat(sq, starts)
    lens = np.minimum(starts + w, n) - starts
    db = 20.0 * np.log10(np.sqrt(sums / lens) + 1e-10)
    loud = np.nonzero(db >= rules.TRIM_DB_FLOOR)[0]
    if len(loud) == 0:
        return 0, 0
    return int(starts[loud[0]]), int(min(n, starts[loud[-1]] + w))


def audio_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: pass rows through, append AUDIO_FEATURE_SCHEMA cols.

    Rows whose codec is not decodable (or already structurally invalid) get
    decode_ok=False and NULL features; the rule verdict is derived later in
    Column algebra so the canonical rule ORDER lives in one place.
    """
    for pdf in batches:
        m = len(pdf)
        ok = np.zeros(m, dtype=bool)
        nsamp = np.zeros(m, dtype=np.int64)
        t0 = np.zeros(m, dtype=np.int64)
        t1 = np.zeros(m, dtype=np.int64)
        cfrac = np.full(m, np.nan)
        sliced: list = [None] * m
        raws = pdf["bytes"].to_numpy()
        codecs = pdf["codec"].to_numpy()
        srs = pdf["sr_hz"].to_numpy()
        durs = pdf["dur_ms"].to_numpy()
        for i in range(m):
            codec = codecs[i]
            if codec not in rules.VALID_CODECS or srs[i] not in rules.VALID_SR_HZ:
                continue
            pcm = _decode(raws[i], codec)
            if pcm is None:
                continue
            n_exp = round(int(durs[i]) * int(srs[i]) / 1000.0)
            if n_exp <= 0 or abs(len(pcm) - n_exp) > rules.DECODE_LEN_RTOL * n_exp:
                continue
            ok[i] = True
            nsamp[i] = len(pcm)
            a, b = _trim_bounds_vec(pcm, int(srs[i]))
            t0[i], t1[i] = a, b
            if b > a:
                seg = np.abs(pcm[a:b])
                cfrac[i] = float(np.mean(seg >= rules.CLIP_SAMPLE_THRESH))
                sliced[i] = _slice_bytes(raws[i], codec, a, b)
        out = pdf.copy()
        out["decode_ok"] = ok
        out["n_samples"] = nsamp
        out["trim_start"] = t0
        out["trim_end"] = t1
        out["clip_frac"] = cfrac
        out["bytes_trimmed"] = pd.Series(sliced, index=pdf.index, dtype=object)
        yield out
