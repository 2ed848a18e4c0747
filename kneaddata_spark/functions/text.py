"""Vectorized text stage: complexity features + model scores + PII scrub.

- ``complexity_features``: Arrow-batched struct UDF computing the TRF /
  FastQC analogs (char entropy, max token run, top-token fraction;
  reference semantics: /root/reference/kneaddata/run.py:452-480 TRF
  anti-join, utilities.py:1094-1164 overrepresented sequences).
- ``model_scores``: Arrow-batched struct UDF scoring the two broadcast
  "databases" (lang-ID profiles + hashed-bigram LM), the bowtie2/BMTagger
  analog (run.py:53-185, 213-274). Models arrive via ``sc.broadcast``;
  deserialized once per python worker on first access.
- ``scrub_col``: pure Column-algebra regexp_replace chain (ILLUMINACLIP
  analog, config.py:42-43) — JVM-side, whole-stage-codegen'd, zero Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import rules

COMPLEXITY_SCHEMA = T.StructType(
    [
        T.StructField("entropy", T.DoubleType()),
        T.StructField("max_run", T.IntegerType()),
        T.StructField("top_frac", T.DoubleType()),
        T.StructField("n_tokens", T.IntegerType()),
    ]
)

SCORES_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("lang_conf", T.DoubleType()),
        T.StructField("ppl", T.DoubleType()),
    ]
)


def _entropy_batch(texts: pd.Series) -> pd.DataFrame:
    n = len(texts)
    ent = np.zeros(n)
    run = np.zeros(n, dtype=np.int32)
    top = np.zeros(n)
    ntok = np.zeros(n, dtype=np.int32)
    for i, t in enumerate(texts):
        if t is None:
            continue
        s = str(t).strip()
        if s:
            # vectorized char entropy: counts over unicode code points
            codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            _, cnt = np.unique(codes, return_counts=True)
            p = cnt / cnt.sum()
            ent[i] = float(-(p * np.log2(p)).sum())
        toks = str(t).split()
        ntok[i] = len(toks)
        if toks:
            arr = np.asarray(toks, dtype=object)
            brk = np.nonzero(arr[1:] != arr[:-1])[0]
            seg_ends = np.concatenate([brk, [len(arr) - 1]])
            seg_starts = np.concatenate([[-1], brk])
            run[i] = int((seg_ends - seg_starts).max())
            _, c = np.unique(arr, return_counts=True)
            top[i] = float(c.max() / len(arr))
    return pd.DataFrame(
        {"entropy": ent, "max_run": run, "top_frac": top, "n_tokens": ntok}
    )


@F.pandas_udf(COMPLEXITY_SCHEMA)
def complexity_features(texts: pd.Series) -> pd.DataFrame:
    return _entropy_batch(texts)


def make_model_scores_udf(langid_bc, ppl_bc):
    """Struct pandas UDF closed over the two broadcast model artifacts."""

    @F.pandas_udf(SCORES_SCHEMA)
    def model_scores(texts: pd.Series) -> pd.DataFrame:
        langid = langid_bc.value
        pplm = ppl_bc.value
        vals = texts.tolist()
        langs, confs = langid.score_batch(vals)
        ppls = pplm.ppl_batch(vals)
        return pd.DataFrame(
            {
                "lang": pd.Series(langs, dtype=object),
                "lang_conf": confs.astype(np.float64),
                "ppl": ppls,
            }
        )

    return model_scores


def scrub_col(col: Column) -> Column:
    """Chained JVM regexp_replace over rules.SCRUB_PATTERNS (ordered)."""
    out = col
    for pat, repl in rules.SCRUB_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out
