"""FLAC archival transcode: any decodable clip -> a REAL FLAC stream,
losslessly, with per-clip round-trip proof.

The lossless counterpart to the G.711 storage move (companding.py): at
10^12 clips the cold tier wants a compressed-but-exact payload, and FLAC
is the archival standard for PCM speech. The codec is implemented
in-repo (functions/flaccodec.py — mono/16-bit subset of the public
spec), so this operator both exercises a genuinely compressed format
through the registry and measures what it buys: compressed size, ratio,
and a decode-back CRC that must equal the source CRC (lossless by
construction; the witness makes it auditable per row).

Engine shape (the g711_transcode pattern): ONE Arrow stage decodes s16
once (shared registry decode — pcm/wav/real-flac/fake containers all
work), encodes to FLAC, decodes back, and emits SCALAR witnesses only —
the flac payload bytes stay Python-side (the `bytes` boundary rule);
consumers key on (clip_id, crc_pcm). Zero shuffles, no per-row Python
UDFs (one vectorized-internals arrow_udf).

Reference lineage: kneaddata re-emits transformed reads per stage
(run.py tmp outputs); here the transform is the payload codec itself,
and the `roundtrip_exact` witness is the trimmed-output byte-equality
idea (tests/basic_tests.py golden-file checks) applied to audio.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FLAC_T = (
    "struct<n_samples:bigint, raw_bytes:bigint, flac_bytes:bigint, "
    "ratio_permille:bigint, crc_pcm:bigint, crc_rt:bigint, "
    "roundtrip_exact:boolean, n_frames:bigint>"
)


def _make_flac_udf(block_size: int):
    @F.arrow_udf(_FLAC_T)
    def _f_udf(raw: pa.Array, codec: pa.Array) -> pa.Array:
        from ..functions.audio import _binary_bounds
        from ..functions.flaccodec import decode_flac, encode_flac
        from .audiodup import _decode_s16

        data, starts, ends = _binary_bounds(raw)
        codecs = codec.to_pylist()
        out = []
        for i in range(len(codecs)):
            x = _decode_s16(data, int(starts[i]), int(ends[i]), codecs[i])
            if x is None or len(x) == 0:
                out.append(None)
                continue
            x = x.astype(np.int16, copy=False)
            enc = encode_flac(x, 16000, block_size=block_size)
            rt = decode_flac(enc)
            exact = rt is not None and np.array_equal(rt, x)
            crc_pcm = int(zlib.crc32(x.astype("<i2").tobytes()))
            out.append(
                {
                    "n_samples": int(len(x)),
                    "raw_bytes": int(2 * len(x)),
                    "flac_bytes": int(len(enc)),
                    # integer permille (the shared-threshold convention:
                    # Spark/DuckDB integer div agree, float round doesn't)
                    "ratio_permille": int(len(enc) * 1000 // (2 * len(x))),
                    "crc_pcm": crc_pcm,
                    "crc_rt": (
                        int(zlib.crc32(rt.astype("<i2").tobytes()))
                        if rt is not None
                        else -1
                    ),
                    "roundtrip_exact": bool(exact),
                    "n_frames": int((len(x) + block_size - 1) // block_size),
                }
            )
        return pa.array(
            out,
            type=pa.struct(
                [
                    ("n_samples", pa.int64()),
                    ("raw_bytes", pa.int64()),
                    ("flac_bytes", pa.int64()),
                    ("ratio_permille", pa.int64()),
                    ("crc_pcm", pa.int64()),
                    ("crc_rt", pa.int64()),
                    ("roundtrip_exact", pa.bool_()),
                    ("n_frames", pa.int64()),
                ]
            ),
        )

    # one decode+encode per row (the audiodup/VAD nondeterministic pin so
    # Catalyst cannot duplicate the Arrow stage)
    return _f_udf.asNondeterministic()


_RE_T = "struct<bytes:binary, n_samples:bigint, flac_bytes:bigint, roundtrip_exact:boolean>"


def _make_reencode_udf(block_size: int):
    @F.arrow_udf(_RE_T)
    def _r_udf(raw: pa.Array, codec: pa.Array, s: pa.Array, e: pa.Array) -> pa.Array:
        from ..functions.audio import _binary_bounds
        from ..functions.flaccodec import decode_flac, encode_flac
        from .audiodup import _decode_s16

        data, starts, ends = _binary_bounds(raw)
        codecs = codec.to_pylist()
        ss = s.to_pylist()
        es = e.to_pylist()
        out = []
        for i in range(len(codecs)):
            x = _decode_s16(data, int(starts[i]), int(ends[i]), codecs[i])
            lo = int(ss[i] or 0)
            hi = int(es[i]) if es[i] is not None else (len(x) if x is not None else 0)
            if x is None or hi <= lo or hi > len(x):
                out.append(None)
                continue
            seg = x[lo:hi].astype(np.int16, copy=False)
            enc = encode_flac(seg, 16000, block_size=block_size)
            rt = decode_flac(enc)
            out.append(
                {
                    "bytes": enc,
                    "n_samples": int(len(seg)),
                    "flac_bytes": int(len(enc)),
                    "roundtrip_exact": bool(rt is not None and np.array_equal(rt, seg)),
                }
            )
        return pa.array(
            out,
            type=pa.struct(
                [
                    ("bytes", pa.binary()),
                    ("n_samples", pa.int64()),
                    ("flac_bytes", pa.int64()),
                    ("roundtrip_exact", pa.bool_()),
                ]
            ),
        )

    return _r_udf.asNondeterministic()


def reencode_trimmed(
    qc_out: DataFrame,
    block_size: int = 4096,
    id_col: str = "clip_id",
) -> DataFrame:
    """Archival sink for the QC output's `needs_reencode` rows (real FLAC
    and any future compressed codec): decode the ORIGINAL payload once,
    slice [trim_start, trim_end), re-encode as FLAC, and emit the trimmed
    compressed payload with a decode-back exactness witness.

    This is the deliberate, fenced exception to the `bytes`-never-crosses-
    Python->JVM rule: an ENCODE sink must materialize bytes somewhere, and
    this stage runs on the (small) needs_reencode subset AFTER the QC hot
    path — annotate()'s one-Arrow-stage/zero-byte-return plan is untouched
    (pytest-pinned in test_pipeline_run). Filter pushdown keeps the scan
    tight: the input is the status=kept partition with
    `needs_reencode = true`, typically permille-scale of the corpus.

    Reference lineage: kneaddata re-writes trimmed reads per stage
    (run.py:372-450 tmp outputs); this is that re-emission for payloads the
    JVM byte algebra cannot slice."""
    st = _make_reencode_udf(int(block_size))(
        F.col("bytes"), F.col("codec"), F.col("trim_start"), F.col("trim_end")
    ).alias("__r")
    ex = (
        qc_out.where(F.col("needs_reencode"))
        .select(F.col(id_col), F.col("sr_hz"), F.col("dur_ms"), st)
        .where(F.col("__r").isNotNull())
    )
    return ex.select(
        F.col(id_col),
        F.col("__r.bytes").alias("bytes"),
        F.lit("flac").alias("codec"),
        F.col("sr_hz"),
        F.col("dur_ms"),
        F.col("__r.n_samples").alias("n_samples"),
        F.col("__r.flac_bytes").alias("flac_bytes"),
        F.col("__r.roundtrip_exact").alias("roundtrip_exact"),
    )


def flac_archive(
    clips: DataFrame,
    block_size: int = 4096,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
) -> DataFrame:
    """(clip_id, n_samples, raw_bytes, flac_bytes, ratio_permille,
    crc_pcm, crc_rt, roundtrip_exact, n_frames) — one row per decodable
    clip. Undecodable clips drop (the screens' NULL rule). roundtrip_exact
    is the per-row lossless proof: crc_rt == crc_pcm for every emitted row
    (pytest-pinned; also an aggregate gate in the driver query's test)."""
    st = _make_flac_udf(int(block_size))(
        F.col(bytes_col), F.col(codec_col)
    ).alias("__f")
    ex = clips.select(F.col(id_col), st).where(F.col("__f").isNotNull())
    return ex.select(
        F.col(id_col),
        F.col("__f.n_samples").alias("n_samples"),
        F.col("__f.raw_bytes").alias("raw_bytes"),
        F.col("__f.flac_bytes").alias("flac_bytes"),
        F.col("__f.ratio_permille").alias("ratio_permille"),
        F.col("__f.crc_pcm").alias("crc_pcm"),
        F.col("__f.crc_rt").alias("crc_rt"),
        F.col("__f.roundtrip_exact").alias("roundtrip_exact"),
        F.col("__f.n_frames").alias("n_frames"),
    )
