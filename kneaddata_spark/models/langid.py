"""Character-trigram language-ID model (fastText-style, hashed features).

Plays the role of kneaddata's first contaminant "database" (bowtie2 index,
/root/reference/kneaddata/run.py:53-164): a read-only side input broadcast
to every executor; scoring a transcript against it yields the keep/drop
signal. The model is a dense (n_langs x 2^LANGID_HASH_BITS) float32 matrix
of L2-normalized trigram profiles — small enough to broadcast (~640 KB),
exactly like a bowtie2 index is a read-only artifact shipped to workers.

Deterministic: trained from vocab.training_corpus (seeded), hashed with a
process-stable vectorizable codepoint mix (a per-trigram zlib.crc32 loop
was the scoring hot spot — VERDICT r1 next-round #8; training and scoring
share the hash, so the bucket space stays consistent).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import rules
from ..vocab import LANGS, training_corpus

_MASK = (1 << rules.LANGID_HASH_BITS) - 1
_BITS = rules.LANGID_HASH_BITS


def _tri_hash(c0, c1, c2):
    """Bucket hash of a trigram of codepoints (scalar or numpy int64):
    linear mix (products < 2^38, no int64 overflow) + xor-fold."""
    h = c0 * 40503 + c1 * 69069 + c2 * 54469
    h = h ^ (h >> 13)
    return h & _MASK


def _trigram_hashes(text: str) -> np.ndarray:
    s = f"  {text.lower()} "
    codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    return _tri_hash(codes[:-2], codes[1:-1], codes[2:])


@dataclass
class LangIdModel:
    langs: tuple
    profiles: np.ndarray  # (n_langs, 2**bits) float32, rows L2-normalized

    def score_one(self, text: str) -> tuple[str, float]:
        """(predicted_lang, confidence). confidence = cos_top - cos_second."""
        if not text or not text.strip():
            return "und", 0.0
        h = _trigram_hashes(text)
        counts = np.bincount(h, minlength=_MASK + 1).astype(np.float32)
        nrm = float(np.linalg.norm(counts))
        if nrm == 0.0:
            return "und", 0.0
        cos = self.profiles @ (counts / nrm)
        order = np.argsort(-cos)
        conf = float(cos[order[0]] - (cos[order[1]] if len(cos) > 1 else 0.0))
        return self.langs[int(order[0])], conf

    def score_batch(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """One vectorized pass for the whole Arrow batch (no per-row numpy
        calls): concatenate all padded texts into a single codepoint array,
        hash every trigram with one vectorized mix, count per-(row, bucket)
        keys with one np.unique, and score with n_langs bincount gathers.
        Agrees with score_one to float rounding (1e-4 conf tolerance in
        tests/test_synth_models.py)."""
        n = len(texts)
        langs = np.full(n, "und", dtype=object)
        confs = np.zeros(n, dtype=np.float64)
        padded, idx = [], []
        for i, t in enumerate(texts):
            if t is None:
                continue
            s = str(t)
            if not s.strip():
                continue
            padded.append(f"  {s.lower()} ")
            idx.append(i)
        if not padded:
            return langs, confs
        idx = np.asarray(idx, dtype=np.int64)
        lens = np.array([len(p) for p in padded], dtype=np.int64)
        codes = np.frombuffer(
            "".join(padded).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        row_of = np.repeat(np.arange(len(padded), dtype=np.int64), lens)
        same = row_of[:-2] == row_of[2:]  # trigrams must not span rows
        h = _tri_hash(codes[:-2][same], codes[1:-1][same], codes[2:][same])
        uk, cnt = np.unique((row_of[:-2][same] << _BITS) | h, return_counts=True)
        krow = uk >> _BITS
        kb = uk & _MASK
        cntf = cnt.astype(np.float64)
        m = len(padded)
        norms = np.sqrt(np.bincount(krow, weights=cntf * cntf, minlength=m))
        L = len(self.langs)
        scores = np.empty((L, m), dtype=np.float64)
        for li in range(L):
            scores[li] = np.bincount(
                krow, weights=self.profiles[li, kb].astype(np.float64) * cntf, minlength=m
            )
        scores /= norms  # every padded text has >= 1 trigram -> norm > 0
        best = np.argmax(scores, axis=0)  # lowest index on ties == argsort(-cos)
        ar = np.arange(m)
        topv = scores[best, ar].copy()
        scores[best, ar] = -np.inf
        secondv = scores.max(axis=0) if L > 1 else np.zeros(m)
        langs[idx] = np.asarray(self.langs, dtype=object)[best]
        confs[idx] = topv - secondv
        return langs, confs


def train_langid(langs=LANGS) -> LangIdModel:
    profiles = np.zeros((len(langs), _MASK + 1), dtype=np.float32)
    for li, lang in enumerate(langs):
        for sent in training_corpus(lang):
            h = _trigram_hashes(sent)
            np.add.at(profiles[li], h, 1.0)
        nrm = np.linalg.norm(profiles[li])
        if nrm > 0:
            profiles[li] /= nrm
    return LangIdModel(langs=tuple(langs), profiles=profiles)
