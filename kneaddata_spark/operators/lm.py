"""Distributed n-gram LM training: build the QC perplexity model's
hashed-bigram count tables as a Spark aggregation.

Closes the last driver-side loop in the QC pipeline: the perplexity
"contaminant database" (models/perplexity) is trained by a pure-python
loop over the built-in seed corpus — fine for the synthetic seed, but a
production deployment trains the reference LM on a real (possibly huge)
clean corpus, which must be a cluster job. This operator IS that job,
producing BIT-IDENTICAL count tables to the python trainer (pytest-
gated: same buckets, same counts, so a model trained here scores every
clip exactly like the shipped one).

Hash fidelity, all JVM Column algebra (zero Python): the model's token
hash is zlib.crc32, which is exactly Spark's ``crc32()`` (CRC-32/IEEE);
the bigram mix ``(c1*40503 + c2*69069) ^ (h >> 18) & MASK`` is integer
Column arithmetic. Tokenization mirrors python ``str.split()`` (any-
whitespace, empties dropped) with <s>/</s> sentinels.

Scale shape: one explode of per-row bucket arrays + one
map-side-combinable groupBy(kind, bucket) — output cardinality is
bounded by 2 * 2^PPL_HASH_BITS regardless of corpus size, so
``counts_to_model`` may safely collect it to build the broadcastable
arrays (the same artifact shape the QC pipeline broadcasts today).

No DuckDB oracle: DuckDB has no crc32 — the correctness gate is exact
array equality with the independent python trainer, which is stronger.

Reference lineage: building the bowtie2/BMTagger index is a separate
offline job in the reference tool chain (docs/databases; run.py consumes
a prebuilt index) — here the index build joins the engine as a
first-class distributed operator.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import rules

_MASK = (1 << rules.PPL_HASH_BITS) - 1


def _crc(col):
    return F.crc32(F.encode(col, "UTF-8"))


def _mix2_col(ca, cb):
    h = ca * F.lit(40503) + cb * F.lit(69069)
    return (h.bitwiseXOR(F.shiftright(h, 18))).bitwiseAND(F.lit(_MASK).cast("long"))


def train_ngram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(kind, bucket, n) counts over the corpus — kind in
    {'bigram', 'unigram'}, buckets/counts exactly equal to running
    models/perplexity.train_perplexity's python loop over the same
    sentences (pytest-proven)."""
    # python str.split(): any-whitespace split, empties dropped
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "\\s+"), lambda x: x != ""
    )
    toks = F.concat(F.array(F.lit("<s>")), words, F.array(F.lit("</s>")))
    n = F.size(toks)
    a_arr = F.slice(toks, 1, n - 1)
    b_arr = F.slice(toks, 2, n - 1)
    big = F.zip_with(a_arr, b_arr, lambda a, b: _mix2_col(_crc(a), _crc(b)))
    uni = F.transform(a_arr, lambda a: _crc(a).bitwiseAND(F.lit(_MASK).cast("long")))
    buckets = F.concat(
        F.transform(big, lambda h: F.struct(F.lit("bigram").alias("kind"), h.alias("bucket"))),
        F.transform(uni, lambda h: F.struct(F.lit("unigram").alias("kind"), h.alias("bucket"))),
    )
    return (
        docs.select(F.explode(buckets).alias("e"))
        .select("e.kind", F.col("e.bucket").cast("long").alias("bucket"))
        .groupBy("kind", "bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )


def counts_to_model(counts: DataFrame):
    """Materialize the bounded (<= 2 * 2^PPL_HASH_BITS rows) count table
    into the broadcastable PerplexityModel arrays."""
    from ..models.perplexity import PerplexityModel

    bigram = np.zeros(_MASK + 1, dtype=np.int64)
    unigram = np.zeros(_MASK + 1, dtype=np.int64)
    for r in counts.collect():
        (bigram if r["kind"] == "bigram" else unigram)[int(r["bucket"])] = int(r["n"])
    return PerplexityModel(bigram=bigram, unigram=unigram)


def train_perplexity_distributed(spark: SparkSession, langs=None):
    """The shipped model's training corpus, trained on the cluster:
    exactly models/perplexity.train_perplexity, as a Spark job."""
    from ..vocab import LANGS, training_corpus

    sents = [
        (s,) for lang in (langs or LANGS) for s in training_corpus(lang)
    ]
    return counts_to_model(
        train_ngram_counts(spark.createDataFrame(sents, "text string"), "text")
    )


# ---------------------------------------------------------------- langid --
# Same story for the FIRST contaminant database: the language-ID trigram
# profiles (models/langid) train driver-side over the seed corpus; at
# production scale the clean per-language corpus is a table and the
# profile build is a cluster job. Character trigrams as Column algebra:
# split('') yields per-character arrays whose ascii() codes equal python
# ord() for all BMP codepoints (probe-tested; the vocab has no astral
# chars), and the mix (c0*40503 + c1*69069 + c2*54469) ^ (h >> 13) & MASK
# is integer arithmetic.

_LMASK = (1 << rules.LANGID_HASH_BITS) - 1


def train_trigram_counts(
    docs: DataFrame, lang_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """(lang, bucket, n) character-trigram counts, buckets exactly equal
    to models/langid._trigram_hashes over '  ' + text.lower() + ' '
    (pytest-proven). One explode + one combinable agg; output bounded by
    n_langs * 2^LANGID_HASH_BITS."""
    s = F.concat(F.lit("  "), F.lower(F.col(text_col)), F.lit(" "))
    codes = F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("long"))

    def mix(i):
        h = (
            F.element_at(codes, i) * F.lit(40503)
            + F.element_at(codes, i + 1) * F.lit(69069)
            + F.element_at(codes, i + 2) * F.lit(54469)
        )
        return (h.bitwiseXOR(F.shiftright(h, 13))).bitwiseAND(
            F.lit(_LMASK).cast("long")
        )

    tris = F.transform(F.sequence(F.lit(1), F.size(codes) - 2), mix)
    return (
        docs.select(F.col(lang_col).alias("lang"), F.explode(tris).alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )


def counts_to_langid(counts: DataFrame, langs):
    """Materialize the bounded count table into the broadcastable
    LangIdModel (same float32 accumulate + L2 normalization as the
    python trainer — counts are exact integers < 2^24, so float32
    conversion is lossless and the profiles match bit-for-bit)."""
    from ..models.langid import LangIdModel

    li = {lang: i for i, lang in enumerate(langs)}
    profiles = np.zeros((len(langs), _LMASK + 1), dtype=np.float32)
    for r in counts.collect():
        if r["lang"] in li:
            profiles[li[r["lang"]], int(r["bucket"])] = np.float32(r["n"])
    for i in range(len(langs)):
        nrm = np.linalg.norm(profiles[i])
        if nrm > 0:
            profiles[i] /= nrm
    return LangIdModel(langs=tuple(langs), profiles=profiles)


def train_langid_distributed(spark: SparkSession, langs=None):
    """The shipped langid model's training corpus, trained on the
    cluster: exactly models/langid.train_langid, as a Spark job."""
    from ..vocab import LANGS, training_corpus

    langs = tuple(langs or LANGS)
    rows = [(lang, s) for lang in langs for s in training_corpus(lang)]
    return counts_to_langid(
        train_trigram_counts(
            spark.createDataFrame(rows, "lang string, text string")
        ),
        langs,
    )
