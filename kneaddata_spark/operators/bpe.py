"""Distributed BPE tokenizer training + Arrow-stage encoding.

Completes the tokenizer story started by ``corpus.vocab_build`` (the
vocab-truncation decision table): this operator TRAINS the subword
vocabulary itself — byte-pair encoding (Sennrich et al. 2016, the
GPT-2/LLaMA tokenizer family) — as a cluster job, then applies it to the
corpus in one Arrow stage.

Why this shape scales (the classic BPE-training decomposition, used by
subword-nmt / HuggingFace trainers): BPE merges operate on the WORD-TYPE
frequency table, not the token stream. The cluster's job is the part
that is corpus-sized — one map-side-combinable ``groupBy(word)`` count —
and the merge loop runs locally over the bounded type table
(``top_types``, selected via ``orderBy().limit()`` =
TakeOrderedAndProject: per-partition heaps, no global sort). At 100 TB
the count agg is the same one-shuffle shape as ``vocab_build``; the type
table it reduces to is a few MB (natural-language type counts grow
~ Heaps' law, sublinearly), so "collect + local merge loop + broadcast
the merges back" is the production architecture, not a test shortcut.

Determinism contract: merge selection is (count DESC, pair ASC) — total
order, so the learned merge list is a pure function of the corpus.
Encoding applies merges greedily by training rank (lowest-rank pair
first, all its occurrences at once) — provably equivalent to replaying
the merges in training order, which is exactly how the independent
pytest replica encodes (different formulation, same stream; the parity
gate compares full token-stream crcs).

No DuckDB oracle for the driver query (iterative merge training and
application are not SQL-expressible — the dup_clusters recursive-CTE
trick does not extend to an argmax-per-iteration loop); the pytest gate
replays both training and encoding in independent pure python, which is
stronger than a row hash.

Reference lineage: the reference treats its trimmomatic adapter
dictionary and bowtie2 index as offline-built artifacts its pipeline
consumes (run.py --reference-db); here the artifact build is itself a
first-class distributed operator, like operators/lm.py.
"""

from __future__ import annotations

import zlib

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"


# ------------------------------------------------------------ training ----


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the lowercased whitespace-split corpus — the one
    corpus-sized job in BPE training (map-side combinable; output is
    vocabulary-bounded)."""
    words = F.filter(F.split(F.lower(F.col(text_col)), "\\s+"), lambda x: x != "")
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _pairs_of(sym: tuple) -> list:
    return [(sym[i], sym[i + 1]) for i in range(len(sym) - 1)]


def _merge_word(sym: tuple, a: str, b: str) -> tuple:
    """Replace all left-to-right non-overlapping (a, b) adjacencies."""
    out, i, n = [], 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def merge_loop(type_counts: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """The local BPE merge loop over the bounded word-type table.

    Incremental pair-count maintenance (the subword-nmt optimization):
    each merge touches only the words that CONTAIN the merged pair (via a
    pair -> word-index posting map), so the loop is
    O(n_merges x affected-words), not O(n_merges x types).
    Selection order: (count DESC, pair ASC); pairs whose count has
    decayed to 0 are dropped eagerly so max() never sees stale keys.
    """
    words = [(tuple(w) + (END,), int(n)) for w, n in type_counts if w]
    pair_n: dict = {}
    pair_w: dict = {}
    for wi, (sym, n) in enumerate(words):
        for p in _pairs_of(sym):
            pair_n[p] = pair_n.get(p, 0) + n
            pair_w.setdefault(p, set()).add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        live = [(-c, p) for p, c in pair_n.items() if c > 0]
        if not live:
            break
        # (count DESC, pair ASC) as one total order: min over (-count,
        # pair) — tuple-of-strings comparison IS lexicographic pair order
        _, (a, b) = min(live)
        merges.append((a, b))
        for wi in sorted(pair_w.get((a, b), ())):
            sym, n = words[wi]
            new = _merge_word(sym, a, b)
            if new == sym:
                continue
            for p in _pairs_of(sym):
                pair_n[p] -= n
                if pair_n[p] <= 0:
                    pair_n.pop(p)
                    pair_w.pop(p, None)
            for p in _pairs_of(new):
                pair_n[p] = pair_n.get(p, 0) + n
                pair_w.setdefault(p, set()).add(wi)
            words[wi] = (new, n)
        # the merged pair is consumed everywhere it occurred
        pair_n.pop((a, b), None)
        pair_w.pop((a, b), None)
    return merges


def train_bpe(
    docs: DataFrame,
    n_merges: int = 64,
    text_col: str = "text",
    top_types: int = 20_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus: distributed type
    counting, then the local merge loop over the top ``top_types`` types
    by (n DESC, word ASC) — bounded by construction, so the collect is
    safe at any corpus size (the vocab_build TakeOrderedAndProject
    shape)."""
    top = (
        word_counts(docs, text_col)
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(int(top_types))
        .collect()
    )
    return merge_loop([(r["word"], r["n"]) for r in top], n_merges)


# ------------------------------------------------------------ encoding ----


def encode_word(word: str, ranks: dict) -> list[str]:
    """Greedy lowest-training-rank merge application (the GPT-2
    algorithm): repeatedly merge every occurrence of the present pair
    with the smallest rank. Equivalent to replaying the merge list in
    training order (the replica's formulation)."""
    sym = tuple(word) + (END,)
    while len(sym) > 1:
        ranked = [
            (ranks[p], p) for p in set(_pairs_of(sym)) if p in ranks
        ]
        if not ranked:
            break
        _, (a, b) = min(ranked)
        sym = _merge_word(sym, a, b)
    return list(sym)


# per-python-worker memoization: the token stream is corpus-sized but the
# word-type table is Heaps'-law-bounded, so encode cost per worker decays
# to a dict hit per word (the same long-lived-worker caching that holds
# the QC model broadcast, CLAUDE.md)
_RANKS: dict = {}
_CACHE: dict = {}

_BPE_T = T.StructType(
    [
        T.StructField("n_words", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("tok_crc", T.LongType()),
    ]
)


def _make_udf(merges: list[tuple[str, str]]):
    merges = [tuple(m) for m in merges]
    fp = zlib.crc32(repr(merges).encode())

    @F.arrow_udf(_BPE_T)
    def _encode(text: pa.Array) -> pa.Array:
        ranks = _RANKS.get(fp)
        if ranks is None:
            ranks = _RANKS[fp] = {p: i for i, p in enumerate(merges)}
        cache = _CACHE.setdefault(fp, {})
        out = []
        for t in text.to_pylist():
            if t is None:
                out.append(None)
                continue
            n_words = n_tokens = 0
            crc = 0
            for w in t.lower().split():
                toks = cache.get(w)
                if toks is None:
                    toks = cache[w] = encode_word(w, ranks)
                n_words += 1
                n_tokens += len(toks)
                for tok in toks:
                    crc = zlib.crc32(tok.encode(), crc)
            out.append({"n_words": n_words, "n_tokens": n_tokens, "tok_crc": crc})
        return pa.array(
            out,
            type=pa.struct(
                [("n_words", pa.int64()), ("n_tokens", pa.int64()), ("tok_crc", pa.int64())]
            ),
        )

    # pin to one evaluation per row: CollapseProject would otherwise
    # re-run the UDF once per extracted struct field (the resample_audio
    # lesson)
    return _encode.asNondeterministic()


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with a learned merge list in ONE Arrow stage,
    zero shuffles: (id, n_words, n_tokens, tok_crc) where tok_crc is the
    running crc32 of the utf-8 token stream — the full-stream equality
    key the parity gate compares. Token TEXT stays Python-side (the
    resample/resize payload rule); the merge list rides in the task
    closure (a few KB — a production-sized vocab would ship as a Spark
    broadcast through the same seam)."""
    enc = _make_udf(merges)
    e = docs.select(F.col(id_col), enc(F.col(text_col)).alias("e"))
    return e.select(
        F.col(id_col),
        F.col("e.n_words").alias("n_words"),
        F.col("e.n_tokens").alias("n_tokens"),
        F.col("e.tok_crc").alias("tok_crc"),
    )
