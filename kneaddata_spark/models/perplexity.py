"""Hashed word-bigram perplexity model (the second contaminant "database").

Analog of kneaddata's BMTagger index (/root/reference/kneaddata/run.py:
213-274): a second, independent scorer over the same rows; clean = pass ALL
scorers (intersection semantics, run.py:174-185 == conjunction of keep
flags, SURVEY.md J1).

Artifacts are two int64 count arrays (bigram buckets, unigram buckets) —
broadcastable, read-only. Hashing is zlib.crc32 per TOKEN (process-stable)
combined with a vectorizable integer mix per BIGRAM, so batch scoring
hashes each unique token once instead of crc32-ing every bigram string
(the scoring hot spot — VERDICT r1 next-round #8). Training shares the
same functions, keeping the bucket space consistent.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

import numpy as np

from .. import rules
from ..vocab import LANGS, training_corpus

_MASK = (1 << rules.PPL_HASH_BITS) - 1
_V = 4096.0  # smoothing vocabulary size constant


def _mix2(x, y):
    """Bigram bucket from two token crc32s (scalar int or numpy int64):
    linear mix (crc < 2^32, coeffs < 2^17 -> products < 2^49) + xor-fold."""
    h = x * 40503 + y * 69069
    h = h ^ (h >> 18)
    return h & _MASK


def _h1(w: str) -> int:
    return zlib.crc32(w.encode("utf-8")) & _MASK


def _h2(w1: str, w2: str) -> int:
    return int(_mix2(zlib.crc32(w1.encode("utf-8")), zlib.crc32(w2.encode("utf-8"))))


@dataclass
class PerplexityModel:
    bigram: np.ndarray   # int64[2**bits]
    unigram: np.ndarray  # int64[2**bits]

    def ppl_one(self, text: str) -> float:
        toks = ["<s>"] + str(text).lower().split() + ["</s>"]
        if len(toks) < 2:
            return float(rules.PPL_MAX) * 10
        k = rules.PPL_ADD_K
        lp = 0.0
        for a, b in zip(toks, toks[1:]):
            c12 = float(self.bigram[_h2(a, b)])
            c1 = float(self.unigram[_h1(a)])
            lp += np.log((c12 + k) / (c1 + k * _V))
        return float(np.exp(-lp / (len(toks) - 1)))

    def ppl_batch(self, texts) -> np.ndarray:
        """Batch scoring with no per-bigram Python: crc32 each UNIQUE token
        once (pd.factorize over the flat token stream), then build every
        row's (<s>, w0), inner, (w_last, </s>) bigram buckets with
        vectorized _mix2, one gather + one bincount for the log-prob sums.
        Per-row accumulation order matches ppl_one (start, inners, end), so
        results are bit-identical."""
        import pandas as pd

        n = len(texts)
        toks_per_row = [("" if t is None else str(t)).lower().split() for t in texts]
        wlens = np.array([len(t) for t in toks_per_row], dtype=np.int64)
        flat = np.asarray([w for ts in toks_per_row for w in ts], dtype=object)
        if len(flat):
            codes, uniq = pd.factorize(flat)
            crc_u = np.array(
                [zlib.crc32(u.encode("utf-8")) for u in uniq], dtype=np.int64
            )
            crc = crc_u[codes]
        else:
            crc = np.zeros(0, dtype=np.int64)
        row_of = np.repeat(np.arange(n, dtype=np.int64), wlens)
        crc_s = np.int64(zlib.crc32(b"<s>"))
        crc_e = np.int64(zlib.crc32(b"</s>"))

        offs = np.concatenate([[0], np.cumsum(wlens)])
        rows_w = np.flatnonzero(wlens > 0)          # rows with words
        rows_0 = np.flatnonzero(wlens == 0)         # bare (<s>, </s>) rows
        first = offs[:-1][wlens > 0]
        last = offs[1:][wlens > 0] - 1
        same = row_of[:-1] == row_of[1:]            # inner bigrams

        idx2 = np.concatenate([
            _mix2(np.full(len(first), crc_s), crc[first]),
            _mix2(crc[:-1][same], crc[1:][same]),
            _mix2(crc[last], np.full(len(last), crc_e)),
            np.full(len(rows_0), _mix2(crc_s, crc_e), dtype=np.int64),
        ])
        idx1 = np.concatenate([
            np.full(len(first), int(crc_s) & _MASK, dtype=np.int64),
            crc[:-1][same] & _MASK,
            crc[last] & _MASK,
            np.full(len(rows_0), int(crc_s) & _MASK, dtype=np.int64),
        ])
        rows = np.concatenate([rows_w, row_of[:-1][same], rows_w, rows_0])
        k = rules.PPL_ADD_K
        lp = np.log((self.bigram[idx2] + k) / (self.unigram[idx1] + k * _V))
        sums = np.bincount(rows, weights=lp, minlength=n)
        return np.exp(-sums / (wlens + 1))


def train_perplexity(langs=LANGS) -> PerplexityModel:
    bigram = np.zeros(_MASK + 1, dtype=np.int64)
    unigram = np.zeros(_MASK + 1, dtype=np.int64)
    for lang in langs:
        for sent in training_corpus(lang):
            toks = ["<s>"] + sent.lower().split() + ["</s>"]
            for a, b in zip(toks, toks[1:]):
                bigram[_h2(a, b)] += 1
                unigram[_h1(a)] += 1
    return PerplexityModel(bigram=bigram, unigram=unigram)
