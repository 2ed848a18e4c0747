"""Bloom-filter decontamination: broadcast bit table + map-side probe.

The pattern that makes benchmark decontamination (and any membership
screen) free at 100 TB: compress the contamination set into an m-bit
Bloom filter (k double-hashed bits per key, Kirsch-Mitzenmacher 2006),
broadcast the bit table (m/32 rows of 32-bit words — a few KB) to every
executor, and probe the corpus MAP-SIDE. The corpus never shuffles and
never joins row-for-row; only the bloom-positive sliver (true hits +
the ~(1-e^-kn/m)^k false-positive rate) reaches the exact verify join.
`dedup.decontaminate` ships the exact broadcast semi-join; THIS is its
scale precursor for contamination sets too big to broadcast raw but
trivial to broadcast as bits (a 1e9-key set at 10 bits/key is ~1.2 GB
of bits vs TBs of strings).

Everything is INTEGER-ONLY portable arithmetic (the sketches.py
discipline): key -> int64 via the doc_fingerprint position-weighted
token hash, two mix32 avalanche draws (h2 forced odd so it is coprime
with the power-of-two m, making the k double-hashed probes distinct),
explicit shiftleft/and/or word packing — so the driver's DuckDB oracle
rebuilds the SAME bit table and probes it bit-for-bit, proving both the
no-false-negative guarantee and the exact false-positive rows.

Engine shape: build = one explode(k) + one bit_or aggregate over <=
m/32 word rows (map-side combinable, mergeable sketch state like HLL
registers); probe = ONE broadcast one-row map + pure Column algebra
(try_element_at + bitwiseAND), zero shuffles over the corpus; verify =
broadcast left-semi join of the bloom-positive sliver only.

Reference lineage: BMTagger's extract-then-anti-join decontamination
(SURVEY §2 D6, reference run.py:213-274) — the membership test the
reference does with an external index, here as a mergeable bit sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sketches import M32, mix32, mix32_sql

__all__ = [
    "BLOOM_M_BITS",
    "BLOOM_K",
    "key_int_col",
    "bloom_words",
    "bit_sql",
    "bloom_probe_flags",
    "bloom_decontaminate",
]

BLOOM_M_BITS = 4096   # power of two (word/bit split uses shifts)
BLOOM_K = 3
_H2_SALT = 2654435761  # Knuth multiplicative constant, xor salt for h2

# doc_fingerprint's portable token hash constants (textstats.py:160-167)
_KNUTH = 2654435761
_C1 = 1315423911
_C2 = 2246822519


def key_int_col(text: Column) -> Column:
    """Portable string -> int64 key: the doc_fingerprint position-
    weighted token-hash sum (textstats.doc_fingerprint), reduced to
    [0, 2^32). Weaker dispersion than xxhash64 — it exists so the DuckDB
    oracle reproduces the bits exactly; swap xxhash64 in production."""
    toks = F.split(F.lower(F.trim(text)), " ")
    tok_h = (
        lambda x: (
            (F.length(x).cast("long") * F.lit(_KNUTH))
            + (F.ascii(x).cast("long") * F.lit(_C1))
            + (F.ascii(F.substring(x, -1, 1)).cast("long") * F.lit(_C2))
        )
        % F.lit(M32)
    )
    weighted = F.transform(toks, lambda x, i: (i.cast("long") + 1) * tok_h(x))
    fp = F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, h: acc + h)
    return fp % F.lit(M32)


def _bit_cols(key: Column, m_bits: int, k: int) -> list:
    """k double-hashed bit positions: bit_j = (h1 + j*h2) % m, h2 odd."""
    h1 = mix32(key)
    h2 = mix32(key.bitwiseXOR(F.lit(_H2_SALT))).bitwiseOR(F.lit(1))
    return [(h1 + F.lit(j) * h2) % F.lit(m_bits) for j in range(k)]


def bit_sql(key: str, m_bits: int, j: int) -> str:
    """DuckDB replica of _bit_cols[j] over a key expression already in
    [0, 2^32) — the oracle composes this into its CTE chain (the
    mix32_sql pattern) so bit geometry can never drift."""
    h1 = mix32_sql(key)
    h2 = f"(({mix32_sql(f'xor({key}, {_H2_SALT})')}) | 1)"
    return f"((({h1}) + {j} * {h2}) % {m_bits})"


def bloom_words(
    keys: DataFrame, key_col: str, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> DataFrame:
    """The bit table: (word, bits) with word = bit >> 5, bits = OR of
    32-bit masks — at most m_bits/32 rows, map-side combinable
    (mergeable sketch state, the HLL-register shape: two bloom word
    tables union + bit_or into the filter of the union set)."""
    key = F.col(key_col)
    bits = F.explode(F.array(*_bit_cols(key, m_bits, k))).alias("bit")
    e = keys.select(bits)
    return e.select(
        F.shiftright(F.col("bit"), 5).alias("word"),
        # python F.shiftleft() only takes an int bit-count (the HLL
        # lesson); the SQL builtin accepts a column expression
        F.expr("shiftleft(cast(1 as bigint), cast(bit % 32 as int))").alias("mask"),
    ).groupBy("word").agg(F.bit_or("mask").alias("bits"))


def bloom_probe_flags(
    corpus: DataFrame,
    words: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Attach `bloom_maybe` (INT 0/1) to every corpus row: 1 iff ALL k
    bits are set. The word table collapses to a ONE-ROW broadcast map;
    the probe is try_element_at + bitwiseAND Column algebra — the corpus
    neither shuffles nor joins."""
    bm = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("__bm")
    )
    probed = corpus.crossJoin(F.broadcast(bm))
    bit_cols = _bit_cols(F.col(key_col), m_bits, k)
    probed = probed.withColumns({f"__b{j}": b for j, b in enumerate(bit_cols)})
    hit = F.lit(True)
    for j in range(k):
        w = F.coalesce(
            F.try_element_at(F.col("__bm"), F.shiftright(F.col(f"__b{j}"), 5)),
            F.lit(0).cast("long"),
        )
        # python F.shiftleft() only takes an int bit-count (the HLL lesson)
        mask = F.expr(f"shiftleft(cast(1 as bigint), cast(__b{j} % 32 as int))")
        hit = hit & (w.bitwiseAND(mask) != 0)
    return (
        probed.withColumn("bloom_maybe", F.when(hit, 1).otherwise(0).cast("int"))
        .drop("__bm", *[f"__b{j}" for j in range(k)])
    )


def bloom_decontaminate(
    corpus: DataFrame,
    contam: DataFrame,
    id_col: str,
    text_col: str,
    contam_text_col: str | None = None,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """(id, bloom_maybe INT, confirmed INT) per corpus document:
    bloom_maybe from the broadcast bit probe, confirmed by the exact
    text match (no false negatives is the Bloom guarantee; pytest +
    oracle prove it, and the false-positive rows stay visible). The
    decontaminated corpus is `WHERE confirmed = 0`.

    ONE corpus pass: probe and verify share the same map-side stage (an
    earlier two-branch formulation re-derived the probe for the verify
    join — two full corpus scans at 100 TB). Here the exact set is
    broadcastable, so the verify is a broadcast left join; when the
    contamination set outgrows broadcast (the case the bloom exists
    for), swap the verify to a shuffle semi-join over `WHERE
    bloom_maybe = 1` ONLY — the bloom filter is what keeps the
    corpus-side shuffle input at the sliver, not the corpus."""
    ct = contam_text_col or text_col
    keys = contam.select(key_int_col(F.col(ct)).alias("__key"))
    words = bloom_words(keys, "__key", m_bits, k)
    tagged = corpus.select(
        F.col(id_col), F.col(text_col), key_int_col(F.col(text_col)).alias("__key")
    )
    flagged = bloom_probe_flags(tagged, words, "__key", m_bits, k)
    exact = contam.select(F.col(ct).alias("__ctext")).distinct()
    out = flagged.join(
        F.broadcast(exact), flagged[text_col] == F.col("__ctext"), "left"
    )
    return out.select(
        F.col(id_col),
        F.col("bloom_maybe"),
        F.when(
            (F.col("bloom_maybe") == 1) & F.col("__ctext").isNotNull(), 1
        )
        .otherwise(0)
        .cast("int")
        .alias("confirmed"),
    )
