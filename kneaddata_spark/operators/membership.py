"""Broadcast Bloom-filter membership screen — the runtime-filter pattern a
100 TB pipeline needs for blocklist / contamination joins.

The reference's membership screens are driver-side Python sets over FASTQ
ids (``intersect_fastq``, utilities.py:963-1005; bmtagger extract lists,
run.py:310-352) — fine at single-node scale, impossible at corpus scale.
The Spark-first reshape: the exact screen is an anti-join, but a plain
anti-join shuffles the ENTIRE corpus on the join key even when only a
tiny fraction of rows can possibly match. A Bloom filter of the key set
is orders of magnitude smaller than the set itself (10 bits/key at ~1%
false positives vs ~100 bytes/key for the strings), ships to every task
as a broadcast, and definitively clears non-members map-side — only the
(tiny) candidate set reaches the exact join. This is what Spark's own
runtime row-level filtering (``spark.sql.optimizer.runtime.bloomFilter``)
does for equi-joins; implementing it as an operator makes it available
to multi-stage screens (shingle probes, normalized-hash blocklists)
where the optimizer cannot infer it.

Everything stays JVM-side Column algebra: the bit array is BUILT with a
groupBy(word).bit_or aggregation (map-side combined, ≤ m_bits/64 rows
ever shuffle), densified into one array<long> row, and joined onto the
probe side as a broadcast one-row frame (house pattern: corpus scalars as
broadcast 1-row frames — no driver collect, no Python). The probe is k
xxhash64 + shift/mask Column expressions inside whole-stage codegen.

No false negatives by construction (every build bit is set before any
probe reads it; both sides compute identical positions), so

    bloom_anti_join(corpus, keys) == corpus LEFT ANTI JOIN keys   (exactly)

which is what the DuckDB oracle for the driver query checks.

Sizing: m_bits ~ 10 bits per distinct key gives ~1% false positives with
k=4 (FP ≈ (1 - e^{-kn/m})^k). The one-row array literal approach holds to
~tens of MB of bit array (Spark broadcasts up to 8 GB); past that, ship
the words via a real sc.broadcast into a pandas UDF probe instead — the
operator keeps the same contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_words", "bloom_maybe_col", "bloom_anti_join"]


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions in [0, m_bits) for a key: xxhash64(key, seed=i).
    pmod (not %) so negative hashes land in range."""
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def _mask(p: Column) -> Column:
    """1L << (p % 64). call_function because the Python shiftleft binding
    only takes a literal bit count; the SQL function accepts a Column."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(p, F.lit(64)).cast("int")
    )


def bloom_words(keys: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 4) -> DataFrame:
    """ONE-ROW frame ``(bloom_words: array<long>)`` of length m_bits/64.

    Build shape at scale: explode each key into k (word, mask) pairs,
    groupBy(word).bit_or(mask) — map-side combined, so at most m_bits/64
    distinct words cross the shuffle regardless of key count — then one
    bounded global aggregate (≤ m_bits/64 rows, documented fan-in) packs
    the sparse words into a dense array via sequence+map lookup.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // 64
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, m_bits, k))).alias("p")
    sparse = (
        keys.select(pos)
        .select(
            F.shiftright(F.col("p"), 6).alias("word"),
            _mask(F.col("p")).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("w"))
    )
    idx = F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1).cast("long"))
    return sparse.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "w"))).alias("m")
    ).select(
        F.transform(idx, lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0).cast("long"))).alias(
            "bloom_words"
        )
    )


def bloom_maybe_col(key: Column, words: Column, m_bits: int, k: int = 4) -> Column:
    """Boolean Column: True iff all k bits for ``key`` are set in ``words``
    (possible member); False is a DEFINITIVE non-member. Pure shift/mask
    Column algebra — whole-stage codegen, no Python."""
    out = None
    for p in _positions(key, m_bits, k):
        word = F.element_at(words, (F.shiftright(p, 6) + 1).cast("int"))
        bit = word.bitwiseAND(_mask(p)) != 0
        out = bit if out is None else (out & bit)
    return out


def bloom_anti_join(
    corpus: DataFrame,
    keys: DataFrame,
    corpus_key: str,
    keys_key: str,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """EXACT ``corpus LEFT ANTI JOIN keys`` with a Bloom pre-screen: rows
    whose key fails the broadcast Bloom probe are kept without touching
    the join (no false negatives → they cannot be members); only Bloom
    candidates — true members plus the ~1% false-positive tail — reach
    the exact anti-join, so the join's probe-side volume is ~|members|,
    not |corpus|, and AQE sees a small enough side to broadcast.

    Output columns = corpus columns (the probe key may be an expression
    pre-projected by the caller). At 100 TB the two branches mean two
    column-pruned scans of the corpus (or one scan of a persisted
    annotated frame); the shuffle eliminated is corpus-sized, the scan
    added is one cheap column — the trade every runtime filter makes.
    """
    bloom = bloom_words(keys, keys_key, m_bits, k)
    annotated = corpus.join(F.broadcast(bloom), how="cross")
    maybe = bloom_maybe_col(F.col(corpus_key), F.col("bloom_words"), m_bits, k)
    definite_keep = annotated.where(~maybe).drop("bloom_words")
    candidates = annotated.where(maybe).drop("bloom_words")
    survivors = candidates.join(
        keys.select(F.col(keys_key).alias(corpus_key)).distinct(),
        on=corpus_key,
        how="left_anti",
    )
    return definite_keep.unionByName(survivors)
