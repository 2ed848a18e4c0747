"""G.711 mu-law companding transcode: 16-bit PCM -> 8-bit mu-law codes.

The storage-tier move for speech corpora (telephony's 2:1 with ~segment-
proportional quantization error): at 10^12 clips, halving the payload
bytes halves every scan downstream. G.711 is INTEGER-DEFINED — 8
logarithmic segments, 4-bit mantissa, bias 0x84 — so encode/decode are
exact integer kernels (no transcendental, no float), replica-verifiable
like the resample/noise kernels.

Engine shape (the speed_perturb pattern): ONE Arrow stage decodes s16
once, compands, expands back, and emits SCALAR witnesses (code crc,
round-trip crc, max abs error, integer companding SNR) — mu-law payload
bytes stay Python-side (the `bytes` boundary rule), consumers key on
(clip_id, crc_mu). Zero shuffles.

Reference lineage: the trimmed-output re-emission stage (kneaddata
writes transformed reads back per stage, run.py tmp outputs) — here the
transform is the payload codec itself.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MU_BIAS = 0x84  # 132
MU_CLIP = 32635


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 -> uint8 G.711 mu-law codes (vectorized integer kernel).
    Spot anchors (pytest): 0 -> 0xFF, -32768 -> 0x00, +32767 -> 0x80."""
    s = x.astype(np.int32)
    sign = np.where(s < 0, 0x80, 0).astype(np.int32)
    mag = np.where(s < 0, -s, s)
    mag = np.minimum(mag, MU_CLIP) + MU_BIAS
    t = mag >> 7  # in [1, 255] (mag >= BIAS)
    exponent = np.zeros_like(t)
    for k in range(1, 8):
        exponent += (t >= (1 << k)).astype(np.int32)
    mantissa = (mag >> (exponent + 3)) & 0x0F
    return ((~(sign | (exponent << 4) | mantissa)) & 0xFF).astype(np.uint8)


def mulaw_decode(mu: np.ndarray) -> np.ndarray:
    """uint8 mu-law codes -> int16 (exact inverse of the segment/mantissa
    representation; |x - decode(encode(x))| < 2^(exponent+3) <= 1024)."""
    m = (~mu.astype(np.int32)) & 0xFF
    sign = m & 0x80
    exponent = (m >> 4) & 0x07
    mantissa = m & 0x0F
    mag = (((mantissa << 3) + MU_BIAS) << exponent) - MU_BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


_MU_T = (
    "struct<n_samples:bigint,crc_mu:bigint,crc_rt:bigint,"
    "max_abs_err:bigint,meansq_x:bigint,snr_q:bigint>"
)


def _make_mulaw_udf():
    @F.arrow_udf(_MU_T)
    def _mu_udf(raw: pa.Array, codec: pa.Array) -> pa.Array:
        from ..functions.audio import _binary_bounds
        from .audiodup import _decode_s16

        data, starts, ends = _binary_bounds(raw)
        codecs = codec.to_pylist()
        out = []
        for i in range(len(codecs)):
            x = _decode_s16(data, int(starts[i]), int(ends[i]), codecs[i])
            if x is None or len(x) == 0:
                out.append(None)
                continue
            mu = mulaw_encode(x)
            rt = mulaw_decode(mu)
            err = np.abs(x.astype(np.int64) - rt.astype(np.int64))
            meansq_x = int((x.astype(np.int64) ** 2).sum() // len(x))
            meansq_e = int((err**2).sum() // len(x))
            out.append(
                {
                    "n_samples": int(len(x)),
                    "crc_mu": int(zlib.crc32(mu.tobytes())),
                    "crc_rt": int(zlib.crc32(rt.astype("<i2").tobytes())),
                    "max_abs_err": int(err.max()),
                    "meansq_x": meansq_x,
                    # integer companding SNR (power ratio, snr_screen
                    # convention: 100 ~ 20 dB)
                    "snr_q": meansq_x // max(meansq_e, 1),
                }
            )
        return pa.array(
            out,
            type=pa.struct(
                [
                    ("n_samples", pa.int64()),
                    ("crc_mu", pa.int64()),
                    ("crc_rt", pa.int64()),
                    ("max_abs_err", pa.int64()),
                    ("meansq_x", pa.int64()),
                    ("snr_q", pa.int64()),
                ]
            ),
        )

    # one decode per row (the audiodup/VAD nondeterministic pin)
    return _mu_udf.asNondeterministic()


def mulaw_transcode(
    clips: DataFrame,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
) -> DataFrame:
    """(clip_id, n_samples, crc_mu, crc_rt, max_abs_err, meansq_x, snr_q)
    per decodable clip. Undecodable clips drop (the screens' NULL rule).
    One Arrow stage, zero shuffles."""
    st = _make_mulaw_udf()(F.col(bytes_col), F.col(codec_col)).alias("__m")
    return (
        clips.select(F.col(id_col), st)
        .where(F.col("__m").isNotNull())
        .select(
            F.col(id_col),
            F.col("__m.n_samples").alias("n_samples"),
            F.col("__m.crc_mu").alias("crc_mu"),
            F.col("__m.crc_rt").alias("crc_rt"),
            F.col("__m.max_abs_err").alias("max_abs_err"),
            F.col("__m.meansq_x").alias("meansq_x"),
            F.col("__m.snr_q").alias("snr_q"),
        )
    )
