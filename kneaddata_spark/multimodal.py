"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched UDFs.

The audio path is REAL (functions/audio.py decodes PCM). Image/video
decode requires codec libraries absent from this container, so those
kernels are STUBS with two modes:
 - strict=True  -> NotImplementedError (clearly marked missing kernel);
 - strict=False -> deterministic fake features derived from the byte
   content (stable hashes), so the Spark-side plumbing — schema, Arrow
   batch shape, partitioning, UDF signature — is fully exercised and
   tested end-to-end.

This mirrors how the reference treats its external kernels: samtools/
FastQC are $PATH dependencies that tests skip when absent
(/root/reference/kneaddata/tests/functional_tests.py:12-17).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

IMAGE_FEATURE_SCHEMA = (
    "media_id string, mime string, width int, height int, "
    "n_bytes bigint, content_crc bigint, feat array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_id string, frame_idx int, frame_crc bigint"


def image_feature_stage(strict: bool = False, feat_dim: int = 8):
    """mapInPandas body factory: decode/resize/feature-extract stub.

    Real implementation would decode with PIL/ffmpeg; here the 'feature'
    is a deterministic function of the bytes (seeded by crc32) so tests
    can assert exact values through the full Spark path."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image decode kernel not available in this environment; "
                    "install PIL/ffmpeg and replace image_feature_stage"
                )
            n = len(pdf)
            crcs = np.array(
                [zlib.crc32(bytes(b)) if b is not None else -1 for b in pdf["bytes"]],
                dtype=np.int64,
            )
            feats = []
            for c in crcs:
                rng = np.random.default_rng(np.random.Philox(key=[int(c) & 0x7FFFFFFF, 0]))
                feats.append(rng.standard_normal(feat_dim).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "n_bytes": [len(bytes(b)) if b is not None else 0 for b in pdf["bytes"]],
                    "content_crc": crcs,
                    "feat": feats,
                }
            )

    return stage


def extract_image_features(df: DataFrame, strict: bool = False) -> DataFrame:
    return df.mapInPandas(image_feature_stage(strict=strict), schema=IMAGE_FEATURE_SCHEMA)


def frame_sample_stage(every_n_bytes: int = 1024, strict: bool = False):
    """Video frame-sampling stub (1 'frame' per every_n_bytes of payload):
    a mapInPandas UDTF shape — one input row fans out to many output rows,
    the real geometry of frame extraction."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("video decode kernel not available")
            out_id, out_idx, out_crc = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["bytes"]):
                raw = bytes(b) if b is not None else b""
                for i in range(max(1, len(raw) // every_n_bytes)):
                    chunk = raw[i * every_n_bytes : (i + 1) * every_n_bytes]
                    out_id.append(mid)
                    out_idx.append(i)
                    out_crc.append(zlib.crc32(chunk))
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "frame_crc": out_crc}
            )

    return stage


def sample_frames(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    return df.mapInPandas(frame_sample_stage(every_n_bytes), schema=FRAME_SAMPLE_SCHEMA)
