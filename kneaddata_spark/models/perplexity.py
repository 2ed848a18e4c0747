"""Hashed word-bigram perplexity model (the second contaminant "database").

Analog of kneaddata's BMTagger index (/root/reference/kneaddata/run.py:
213-274): a second, independent scorer over the same rows; clean = pass ALL
scorers (intersection semantics, run.py:174-185 == conjunction of keep
flags, SURVEY.md J1).

Artifacts are two int64 count arrays (bigram buckets, unigram buckets) —
broadcastable, read-only. Hashing uses zlib.crc32 for cross-process
determinism.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

import numpy as np

from .. import rules
from ..vocab import LANGS, training_corpus

_MASK = (1 << rules.PPL_HASH_BITS) - 1
_V = 4096.0  # smoothing vocabulary size constant


def _h1(w: str) -> int:
    return zlib.crc32(w.encode("utf-8")) & _MASK


def _h2(w1: str, w2: str) -> int:
    return zlib.crc32((w1 + "\x1f" + w2).encode("utf-8")) & _MASK


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
        """Batch scoring: hash all bigrams of the Arrow batch into flat index
        arrays, one fancy-index gather per batch (no per-bigram python in the
        probability math)."""
        out = np.full(len(texts), rules.PPL_MAX * 10, dtype=np.float64)
        idx2, idx1, row_of = [], [], []
        lens = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = ["<s>"] + ("" if t is None else str(t)).lower().split() + ["</s>"]
            if len(toks) < 2:
                continue
            lens[i] = len(toks) - 1
            for a, b in zip(toks, toks[1:]):
                idx2.append(_h2(a, b))
                idx1.append(_h1(a))
                row_of.append(i)
        if not idx2:
            return out
        idx2 = np.asarray(idx2, dtype=np.int64)
        idx1 = np.asarray(idx1, dtype=np.int64)
        row_of = np.asarray(row_of, dtype=np.int64)
        k = rules.PPL_ADD_K
        lp = np.log((self.bigram[idx2] + k) / (self.unigram[idx1] + k * _V))
        sums = np.bincount(row_of, weights=lp, minlength=len(texts))
        has = lens > 0
        out[has] = np.exp(-sums[has] / lens[has])
        return out


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
