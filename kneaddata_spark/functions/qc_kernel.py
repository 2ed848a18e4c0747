"""Fused QC kernel: ONE mapInPandas stage computing audio features AND
text features AND model scores per Arrow batch.

Why fused: the hot path previously chained three python operators
(audio mapInPandas -> complexity UDF -> model-scores UDF), i.e. three
JVM<->Arrow round trips and 3x python workers per task. At high
parallelism the extra worker fleet and serde dominate (measured: local[32]
SLOWER than local[8] on 40k clips). One fused stage = one round trip; the
keep/drop verdict stays declarative Column algebra over the emitted
feature columns (pipeline.annotate).

Gating inside the kernel mirrors the rule order exactly (same float64
arithmetic the Column expressions would produce): rows already dead to an
earlier rule skip the later, costlier kernels (the reference's serial
cascade, run.py:77-86, done vectorized).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from .. import rules
from .audio import AUDIO_FEATURE_SCHEMA, audio_stage
from .text import _entropy_batch

TEXT_FEATURE_SCHEMA = (
    "entropy double, max_run int, top_frac double, n_tokens int, "
    "lang string, lang_conf double, ppl double"
)

QC_FEATURE_SCHEMA = AUDIO_FEATURE_SCHEMA + ", " + TEXT_FEATURE_SCHEMA


def make_qc_stage(langid_bc, ppl_bc):
    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        langid = langid_bc.value
        pplm = ppl_bc.value
        for pdf in audio_stage(batches):
            m = len(pdf)
            # audio_ok: same float64 formulas as the Column verdict
            sr = pdf["sr_hz"].to_numpy().astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                kept_ms = np.where(
                    sr > 0, (pdf["trim_end"] - pdf["trim_start"]).to_numpy() / sr * 1000.0, np.nan
                )
                input_ms = np.where(sr > 0, pdf["n_samples"].to_numpy() / sr * 1000.0, np.nan)
            fail_trim = (kept_ms < rules.POST_TRIM_MIN_MS) | (
                kept_ms < rules.POST_TRIM_MIN_RATIO * input_ms
            )
            cfrac = pdf["clip_frac"].to_numpy()
            fail_clip = cfrac > rules.CLIP_FRAC_MAX
            audio_ok = pdf["decode_ok"].to_numpy() & ~fail_trim & ~fail_clip

            texts = pdf["transcript"]
            tlen = texts.fillna("").str.strip().str.len().to_numpy()
            alive = audio_ok & (tlen >= rules.MIN_TRANSCRIPT_CHARS)

            cx = _entropy_batch(
                pd.Series(np.where(alive, texts.to_numpy(), None), index=pdf.index)
            )
            cx_ok = (
                (cx["entropy"].to_numpy() >= rules.MIN_CHAR_ENTROPY_BITS)
                & (cx["max_run"].to_numpy() <= rules.MAX_TOKEN_RUN)
                & ~(
                    (cx["n_tokens"].to_numpy() >= rules.TOP_TOKEN_MIN_TOKENS)
                    & (cx["top_frac"].to_numpy() > rules.MAX_TOP_TOKEN_FRAC)
                )
            )
            score_mask = alive & cx_ok
            langs = np.full(m, None, dtype=object)
            confs = np.zeros(m, dtype=np.float64)
            ppls = np.full(m, np.nan)
            idx = np.nonzero(score_mask)[0]
            if len(idx):
                sub = texts.to_numpy()[idx].tolist()
                sl, sc = langid.score_batch(sub)
                sp = pplm.ppl_batch(sub)
                langs[idx] = sl
                confs[idx] = sc
                ppls[idx] = sp

            out = pdf.copy()
            out["entropy"] = cx["entropy"].to_numpy()
            out["max_run"] = cx["max_run"].to_numpy()
            out["top_frac"] = cx["top_frac"].to_numpy()
            out["n_tokens"] = cx["n_tokens"].to_numpy()
            out["lang"] = langs
            out["lang_conf"] = confs
            out["ppl"] = ppls
            yield out

    return stage
