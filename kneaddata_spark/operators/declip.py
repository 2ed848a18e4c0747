"""Declip: repair clipped samples by integer interpolation (repair tier).

The QC pipeline DROPS clips whose clipped-sample fraction exceeds
rules.CLIP_FRAC_MAX (drop_clipping). This operator is the repair
alternative — the audio analog of the reference's span-trim philosophy
(trim stages cut the bad SPANS and keep the read, run.py:372-450, vs
dropping whole reads): samples pinned at the rails (|x| >= 32736, the
exact integer form of rules.CLIP_SAMPLE_THRESH — functions/audio.py:18)
are replaced by linear interpolation between the nearest unclipped
anchors, the standard declipping baseline (cf. Adler et al. 2012,
"audio declipping" — production systems fit AR/sparse models; the
baseline is deterministic and replica-verifiable, this repo's
discipline). Honest scope note: an int16 repair is bounded by the
rails, so for SATURATED peaks (true signal beyond the rail) no repair
can beat the clipped value itself — the measurable improvement is for
rail-STUCK defect runs (dropouts, wrap artifacts) inside otherwise
unclipped audio, which interpolation recovers almost exactly
(pytest-gated: >100x MSE reduction on planted defects).

INTEGER-DEFINED kernel (the VAD/clip-threshold discipline — bit-exact
python replica in pytest):
- clipped mask: |x| >= 32736 on int16 (never float on int16 — CLAUDE.md)
- for a clipped position p with nearest unclipped anchors l < p < r:
    v = x[l] + (x[r] - x[l]) * (p - l) // (r - l)   (floor division)
- clipped head (no left anchor): hold x[first unclipped]; clipped tail:
  hold x[last unclipped]; ENTIRELY clipped clip: unrecoverable — passes
  through unchanged with repaired = 0.

Vectorized across every clipped sample of a clip with two searchsorted
probes over the unclipped-anchor index array — no per-run python loop,
O(n log n) worst case, the same shape at any clip length.

Engine shape: ONE Arrow stage (shared codec registry decode, the
nondeterministic pin), scalar witnesses out (crc of the repaired PCM,
clipped/run accounting, residual clip fraction), repaired bytes stay
Python-side (the `bytes` boundary rule — an archival sink would rebuild
them like flacarchive does). Zero shuffles.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CLIP_S16 = 32736  # |x| >= this == |x/32768| >= rules.CLIP_SAMPLE_THRESH

__all__ = ["CLIP_S16", "declip_samples", "declip_stats"]


def declip_samples(x: np.ndarray) -> tuple:
    """Repair one int16 clip. Returns (repaired int16 array, n_clipped,
    n_runs, repaired_flag). The input is never mutated."""
    xi = x.astype(np.int64)
    mask = np.abs(xi) >= CLIP_S16
    n_clipped = int(mask.sum())
    if n_clipped == 0:
        return x.astype(np.int16), 0, 0, 0
    # run count: rising edges of the mask
    n_runs = int(mask[0]) + int((mask[1:] & ~mask[:-1]).sum())
    anchors = np.flatnonzero(~mask)
    if len(anchors) == 0:
        return x.astype(np.int16), n_clipped, n_runs, 0
    out = xi.copy()
    pos = np.flatnonzero(mask)
    ri = np.searchsorted(anchors, pos)            # first anchor > pos
    li = ri - 1                                   # last anchor < pos
    has_l = li >= 0
    has_r = ri < len(anchors)
    inner = has_l & has_r
    l = anchors[np.clip(li, 0, None)]
    r = anchors[np.clip(ri, None, len(anchors) - 1)]
    lv = xi[l]
    rv = xi[r]
    den = np.where(inner, r - l, 1)  # edge rows discarded below; avoid /0
    interp = lv + (rv - lv) * (pos - l) // den
    out[pos[inner]] = interp[inner]
    out[pos[~has_l]] = xi[anchors[0]]             # clipped head: hold right
    out[pos[~has_r]] = xi[anchors[-1]]            # clipped tail: hold left
    return out.astype(np.int16), n_clipped, n_runs, 1


_DECLIP_T = (
    "struct<n_samples:bigint,n_clipped:bigint,n_runs:bigint,"
    "repaired:int,residual_clip_permille:bigint,max_abs_change:bigint,"
    "crc_raw:bigint,crc_repaired:bigint>"
)

_UDF_CACHE = []


def _make_declip_udf():
    """Built lazily (DDL types parse against the active session — the
    companding factory pattern)."""
    if _UDF_CACHE:
        return _UDF_CACHE[0]

    @F.arrow_udf(_DECLIP_T)
    def _declip_udf(raw: pa.Array, codec: pa.Array) -> pa.Array:
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
            rep, n_clipped, n_runs, repaired = declip_samples(x)
            ri = rep.astype(np.int64)
            residual = int((np.abs(ri) >= CLIP_S16).sum()) * 1000 // len(x)
            out.append(
                {
                    "n_samples": int(len(x)),
                    "n_clipped": int(n_clipped),
                    "n_runs": int(n_runs),
                    "repaired": int(repaired),
                    "residual_clip_permille": residual,
                    "max_abs_change": int(np.abs(ri - x.astype(np.int64)).max()),
                    "crc_raw": int(zlib.crc32(x.astype("<i2").tobytes())),
                    "crc_repaired": int(zlib.crc32(rep.astype("<i2").tobytes())),
                }
            )
        return pa.array(
            out,
            type=pa.struct(
                [
                    ("n_samples", pa.int64()),
                    ("n_clipped", pa.int64()),
                    ("n_runs", pa.int64()),
                    ("repaired", pa.int32()),
                    ("residual_clip_permille", pa.int64()),
                    ("max_abs_change", pa.int64()),
                    ("crc_raw", pa.int64()),
                    ("crc_repaired", pa.int64()),
                ]
            ),
        )

    _UDF_CACHE.append(_declip_udf.asNondeterministic())
    return _UDF_CACHE[0]


def declip_stats(
    clips: DataFrame,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
) -> DataFrame:
    """(clip_id, n_samples, n_clipped, n_runs, repaired,
    residual_clip_permille, max_abs_change, crc_raw, crc_repaired) —
    one row per decodable clip. Clean clips report n_clipped = 0 with
    crc_repaired == crc_raw; repaired clips report residual permille 0
    unless unrecoverable. One Arrow stage, zero shuffles."""
    st = _make_declip_udf()(F.col(bytes_col), F.col(codec_col)).alias("__d")
    ex = clips.select(F.col(id_col), st).where(F.col("__d").isNotNull())
    return ex.select(
        F.col(id_col),
        *[
            F.col(f"__d.{f}").alias(f)
            for f in (
                "n_samples",
                "n_clipped",
                "n_runs",
                "repaired",
                "residual_clip_permille",
                "max_abs_change",
                "crc_raw",
                "crc_repaired",
            )
        ],
    )
