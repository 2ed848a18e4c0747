"""Bloom-filter decontamination (operators/bloom): bit geometry == a
python mix32 replica; no false negatives on planted contamination;
false positives are exactly the replica's; word tables merge like
sketches (bloom(A ∪ B) == bit_or of bloom(A), bloom(B)); the corpus
probe plan is shuffle-free over the corpus side."""

import pytest

from kneaddata_spark.operators.bloom import (
    BLOOM_K,
    BLOOM_M_BITS,
    _H2_SALT,
    bloom_decontaminate,
    bloom_words,
    key_int_col,
)
from kneaddata_spark.operators.sketches import M32, MIX_K1, MIX_K2

KNUTH = 2654435761
C1 = 1315423911
C2 = 2246822519


def _mix32(x: int) -> int:
    h1 = (x * MIX_K1) % M32
    h2 = ((h1 ^ (h1 >> 16)) * MIX_K2) % M32
    return h2 ^ (h2 >> 15)


def _key_int(text: str) -> int:
    toks = text.strip().lower().split(" ")
    s = 0
    for i, t in enumerate(toks):
        th = (len(t) * KNUTH + (ord(t[0]) if t else 0) * C1
              + (ord(t[-1]) if t else 0) * C2) % M32
        s += (i + 1) * th
    return s % M32


def _bits(key: int, m: int = BLOOM_M_BITS, k: int = BLOOM_K):
    h1 = _mix32(key)
    h2 = _mix32(key ^ _H2_SALT) | 1
    return [(h1 + j * h2) % m for j in range(k)]


def _docs(n):
    # distinct texts, plus two exact-dup pairs of a contaminated text
    rows = [(i, f"tok{i} alpha beta w{i % 13} gamma end{i}") for i in range(n)]
    rows.append((n, rows[0][1]))      # dup of doc 0 (0 % 17 == 0: contaminated)
    rows.append((n + 1, rows[3][1]))  # dup of doc 3 (clean)
    return rows


def test_bloom_flags_match_replica(spark):
    rows = _docs(60)
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(4)
    contam = df.where("doc_id % 17 = 0")
    got = {r["doc_id"]: r for r in
           bloom_decontaminate(df, contam, "doc_id", "text").collect()}
    assert len(got) == len(rows)

    contam_texts = {t for i, t in rows if i % 17 == 0}
    # replica bit table
    words = {}
    for i, t in rows:
        if i % 17 == 0:
            for b in _bits(_key_int(t)):
                words[b >> 5] = words.get(b >> 5, 0) | (1 << (b % 32))
    n_fp = 0
    for i, t in rows:
        maybe = all(words.get(b >> 5, 0) & (1 << (b % 32)) for b in _bits(_key_int(t)))
        confirmed = 1 if (maybe and t in contam_texts) else 0
        assert got[i]["bloom_maybe"] == int(maybe), i
        assert got[i]["confirmed"] == confirmed, i
        # the Bloom guarantee: a true member is NEVER bloom-negative
        if t in contam_texts:
            assert got[i]["bloom_maybe"] == 1
        n_fp += int(maybe and t not in contam_texts)
    # planted dup of a contaminated doc is confirmed; dup of a clean one not
    assert got[60]["confirmed"] == 1
    assert got[61]["confirmed"] == 0
    # the decontaminated corpus drops exactly the confirmed rows
    n_conf = sum(r["confirmed"] for r in got.values())
    assert n_conf == len(contam_texts) + 1  # each contam doc + the planted dup


def test_bloom_words_merge_like_sketches(spark):
    rows = _docs(40)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    keys = df.select(key_int_col("text").alias("k"))
    a = keys.where("k % 2 = 0")
    b = keys.where("k % 2 = 1")
    from pyspark.sql import functions as F

    merged = (
        bloom_words(a, "k").unionByName(bloom_words(b, "k"))
        .groupBy("word").agg(F.bit_or("bits").alias("bits"))
    )
    whole = bloom_words(keys, "k")
    assert {(r["word"], r["bits"]) for r in merged.collect()} == \
           {(r["word"], r["bits"]) for r in whole.collect()}


def test_bloom_probe_corpus_side_shuffle_free(spark):
    rows = _docs(40)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    contam = df.where("doc_id % 17 = 0")
    from kneaddata_spark.operators.bloom import bloom_probe_flags

    keys = contam.select(key_int_col("text").alias("__key"))
    words = bloom_words(keys, "__key")
    tagged = df.select("doc_id", key_int_col("text").alias("__key"))
    plan = (
        bloom_probe_flags(tagged, words, "__key")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the corpus side sees only a BroadcastExchange (the one-row map);
    # the ONLY shuffle Exchanges are the tiny bit-table build (word agg)
    # and the one-row map collapse — never more, and never the corpus
    shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "Broadcast" not in ln and "Reused" not in ln
    ]
    assert len(shuffles) <= 2, shuffles
    assert "EvalPython" not in plan
