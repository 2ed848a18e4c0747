"""Corpus deduplication operators — the training-data-pipeline extension of
the reference's duplicate screens (FastQC overrepresented sequences,
utilities.py:1094-1164; TRF repeats, run.py:452-480), scaled to documents.

All operators are pure DataFrame compositions (one explode + one or two
key-partitioned shuffles); nothing collects to the driver. Frequent-shingle
skew (the classic LSH hot-key) is handled by dropping shingles above a
document-frequency ceiling — they carry no discriminative signal anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .caching import persist_tracked

# ---------------------------------------------------------------- exact --


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: (canonical_id, dup_id) pairs for every
    duplicate row (canonical = min id per md5(text) group)."""
    h = F.md5(F.col(text_col)).alias("h")
    w = Window.partitionBy("h")
    return (
        df.select(F.col(id_col).alias("dup_id"), h)
        .withColumn("canonical_id", F.min("dup_id").over(w))
        .where(F.col("dup_id") != F.col("canonical_id"))
        .select("canonical_id", "dup_id")
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row (min id) per exact-duplicate text group."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return df.withColumn("__rn", F.row_number().over(w)).where("__rn = 1").drop("__rn")


# ------------------------------------------------------------- shingles --


# Auto skew-guard parameters (VERDICT r1 #3: the guard must be ON by
# default — one corpus-scale stop-shingle makes the shingle self-join
# quadratic in that key's document frequency). A shingle present in more
# than max(AUTO_DF_MIN, n_docs div AUTO_DF_DIV) documents is dropped: it
# carries no near-dup signal and is the classic LSH hot key. Integer
# arithmetic only (div, not float cast) so the DuckDB oracle can mirror it
# exactly (Spark casts double->int by truncation, DuckDB by rounding).
AUTO_DF_MIN = 5
AUTO_DF_DIV = 100  # ceiling = 1% of corpus size


def _hot_fingerprints(
    dfc: DataFrame, corpus: DataFrame, max_df: int | str
) -> DataFrame:
    """Fingerprints/shingles above the document-frequency ceiling.

    `dfc` is a (key, __df) count frame; `max_df="auto"` computes the
    ceiling INSIDE the plan (corpus size enters as a broadcast 1-row frame
    — no driver-side count job), an int caps df directly. Shared by the
    shingle guard and the winnowing-fingerprint guard so the threshold
    algebra can't drift between them (VERDICT r4 #7)."""
    if max_df == "auto":
        n_docs = corpus.select(F.count("*").alias("__nd"))
        ceiling = F.greatest(
            F.lit(AUTO_DF_MIN), F.expr(f"__nd div {AUTO_DF_DIV}")
        )
        return dfc.crossJoin(F.broadcast(n_docs)).where(F.col("__df") > ceiling)
    return dfc.where(F.col("__df") > int(max_df))


def word_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_df: int | str | None = "auto",
) -> DataFrame:
    """Distinct (id, shingle) word n-grams with the stop-shingle skew guard
    ON by default: max_df='auto' drops shingles whose document frequency
    exceeds max(AUTO_DF_MIN, n_docs div AUTO_DF_DIV); an int caps df
    absolutely; None disables the guard (tests/micro corpora only).

    Precondition: `id_col` is unique per row (true of every caller —
    doc_id/clip_id are primary keys). Distinctness is enforced per-row
    via array_distinct, which equals the old global distinct exactly
    under that precondition while costing zero shuffles."""
    toks = F.split(F.lower(F.col(text_col)), "\\s+")
    # guard short docs: sequence(1, 0) in Spark is the DESCENDING [1, 0]
    # (unlike SQL generate_series, which is empty) and slice(.., 0, ..)
    # throws — a < n-token document must yield zero shingles, not an error.
    # array_distinct() dedups WITHIN the row (ids are unique, so per-row
    # distinct == the old global .distinct()) — r6: this removes a full
    # corpus-scale shuffle that the old global distinct paid, and paid
    # TWICE (the df-count pass and the probe pass each re-evaluated it).
    grams = F.expr(
        f"CASE WHEN size(tokens) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size(tokens) - {n - 1}), "
        f"i -> array_join(slice(tokens, i, {n}), ' '))) "
        f"ELSE array() END"
    )
    # r6: shingle construction is CPU-bound string work; a compact
    # single-row-group parquet source plans as ONE scan task, so the
    # whole tokenize+explode ran single-threaded (measured 9.9 s of a
    # 15 s query at sf1.0). widen() repartitions by id ONLY when the
    # source has fewer splits than the session's shuffle width — a no-op
    # at real scale (operators/partitioning.py).
    from .partitioning import widen

    src = widen(df.select(F.col(id_col).alias("id"), F.col(text_col)), "id")
    sh = src.select("id", toks.alias("tokens")).select(
        "id", F.explode(grams).alias("shingle")
    )
    if max_df is None:
        return sh
    # Guard: document-frequency count + broadcast hot-list anti-join.
    # The count is a plain groupBy(shingle) — hash-aggregate partial
    # (map-side) combine already bounds a corpus-scale stop-shingle's
    # reduce-side fan-in at one partial row PER MAP TASK, so the r2
    # salted two-phase count was an extra shuffle for skew that partial
    # aggregation already absorbs (guide §2.3 "aggregate before you
    # shuffle"); r6 drops it. The hot list is provably broadcastable:
    # |hot| <= total (id,shingle) pairs / ceiling <= avg_shingles_per_doc
    # * AUTO_DF_DIV rows, INDEPENDENT of corpus size. The probe is a
    # broadcast anti-join — no shuffle of the shingle frame anywhere in
    # this function now (the explode subtree is map-only and evaluated
    # twice: count pass + probe pass; at corpus scale recompute of a
    # map-only projection beats caching a corpus-sized intermediate, and
    # every caller caches the guarded OUTPUT).
    dfc = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
    hot = _hot_fingerprints(dfc, df, max_df)
    return sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti").select(
        "id", "shingle"
    )


def _hashed_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_df: int | str | None,
    part_col: str,
) -> DataFrame:
    """Shared r6 basis of the three pair screens: the (id, h) shingle
    frame with h = xxhash64(shingle), persisted hash-partitioned on
    `part_col` ("h" for shingle self-joins, "id" for signature/verify
    paths), df-guard applied FROM the same cache.

    Why hashes: the pair screens never need shingle text — only equality
    and counts — and a 16-byte (id, h) row beats a ~25-byte string row
    across every join/aggregate (guide §2.3 narrower types). Counts
    change only if two DISTINCT shingles of the SAME doc pair collide in
    xxhash64 — P < 1e-12 per corpus, the same primitive and argument as
    the MinHash signature/band hashing this module already trusts.

    Why one cache: the explode is evaluated ONCE (the old shape paid it
    twice — df-count pass + probe pass); the df-guard's count and the
    hot-list anti-join both read the cache. The partition count is
    EXPLICIT (session shuffle.partitions, the global_rank convention):
    downstream join-output work is quadratic in per-key df, which AQE's
    byte-based coalescing under-counts — and a narrow frame that slips
    under the broadcast threshold must never collapse the self-join into
    a single-partition probe (measured 166 s at sf1.0 when it did).
    The guard ceiling is df-count over HASHES == over shingles (same
    collision argument)."""
    n_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    raw = persist_tracked(
        word_shingles(df, id_col, text_col, n, max_df=None)
        .select("id", F.xxhash64("shingle").alias("h"))
        .repartition(n_parts, F.col(part_col))
    )
    if max_df is None:
        return raw
    dfc = raw.groupBy("h").agg(F.count("*").alias("__df"))
    hot = _hot_fingerprints(
        dfc.withColumnRenamed("h", "shingle"), df, max_df
    ).select(F.col("shingle").alias("h"))
    # broadcast anti-join: preserves the cache's partitioning, no shuffle
    return raw.join(F.broadcast(hot), "h", "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | str | None = "auto",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >= t).

    Self-join on shingle -> pair intersection counts; |A|,|B| joined in;
    J = inter / (|A| + |B| - inter). The shingle join is the only big
    shuffle; max_df caps its worst key. The shingle frame feeds both the
    self-join and the size aggregate — persist_tracked (MEMORY_AND_DISK +
    released when the next tracked-cache query is built,
    operators/caching.py)."""
    # r6: hashed-long shingle basis, one cache partitioned on h so the
    # self-join needs no further exchange — see _hashed_shingles.
    sh = _hashed_shingles(df, id_col, text_col, n, max_df, part_col="h")
    # r6 session 3: sizes is joined back TWICE (id_a and id_b sides), so
    # without a pin each join side re-aggregates the corpus-scale cache
    # (guide §7.2; measured 15.3 -> 10.4 s cold-session, ~0.5 s
    # steady-state at sf1.0). |docs| rows.
    sizes = persist_tracked(sh.groupBy("id").agg(F.count("*").alias("sz")))
    a = sh.alias("a")
    b = sh.alias("b")
    # Pair counting repartitions the raw join output by (id_a, id_b) and
    # aggregates once, instead of groupBy's partial+final split: the
    # candidate-pair stream is nearly duplicate-free (measured 127M join
    # rows -> 114M distinct pairs at sf1.0 — per-pair multiplicity ~1.1),
    # so map-side partial aggregation built ~4M-entry hash maps per task
    # to save ~10% of shuffle bytes (measured 9.7 s -> 6.8 s without it).
    # This holds at any scale: background pairs sharing ONE template
    # shingle dominate the join output of every real corpus (sum C(df,2)
    # over low-multiplicity shingles), while high-multiplicity rows are
    # bounded by actual-dup-pair count x doc size — orders smaller.
    n_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    inter = (
        a.join(b.hint("shuffle_hash"), "h")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .repartition(n_parts, F.col("id_a"), F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    # sizes is |docs| rows — NOT broadcastable at corpus scale; keyed joins
    # (AQE picks broadcast automatically when it is actually small)
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | str | None = "auto",
) -> DataFrame:
    """Asymmetric near-dup pairs by n-gram CONTAINMENT:
    C = inter / min(|A|, |B|) >= threshold (id_a < id_b), plus
    contained_id = the smaller-shingle-set side (ties -> id_a).

    The case Jaccard structurally misses: a short document quoted
    verbatim inside a long one has J = |A|/|B| (tiny) but C = 1.0 —
    the quote-inclusion / subset-page class (Broder 1997 'roughly
    contained'). Same machinery and scale shape as ngram_jaccard_pairs:
    one shingle self-join (df-guard bounded), sizes joined back keyed
    (AQE broadcasts when small), persist_tracked shingle frame."""
    # r6: hashed-long join/aggregate keys + h-partitioned cache +
    # shuffled-hash self-join + repartition-then-aggregate pair counting
    # — see ngram_jaccard_pairs for the measurements (identical here).
    sh = _hashed_shingles(df, id_col, text_col, n, max_df, part_col="h")
    # r6 session 3: sizes is joined back TWICE (id_a and id_b sides), so
    # without a pin each join side re-aggregates the corpus-scale cache
    # (guide §7.2; measured 15.3 -> 10.4 s cold-session, ~0.5 s
    # steady-state at sf1.0). |docs| rows.
    sizes = persist_tracked(sh.groupBy("id").agg(F.count("*").alias("sz")))
    a = sh.alias("a")
    b = sh.alias("b")
    n_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    inter = (
        a.join(b.hint("shuffle_hash"), "h")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .repartition(n_parts, F.col("id_a"), F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("containment", F.col("inter") / F.least("sz_a", "sz_b"))
        .where(F.col("containment") >= threshold)
        .select(
            "id_a",
            "id_b",
            F.round("containment", 6).alias("containment"),
            F.when(F.col("sz_a") <= F.col("sz_b"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("contained_id"),
        )
    )
    return out


# -------------------------------------------------------------- minhash --

# Mersenne prime 2^31-1: (x%p)*a + b stays < 2^62, no int64 overflow
# under ANSI arithmetic
_P = (1 << 31) - 1


def _perm_coeffs(num_hashes: int, seed: int = 7):
    import numpy as np

    rng = np.random.default_rng(np.random.Philox(key=[seed, 0]))
    a = rng.integers(1, _P, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, _P, size=num_hashes, dtype=np.int64)
    return a.tolist(), b.tolist()


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 64, seed: int = 7, hash_col: str | None = None
) -> DataFrame:
    """(id, sig array<long>) MinHash signatures over a (id, shingle) frame.

    One shuffle: groupBy(id) with num_hashes min() partial aggregates —
    map-side combine keeps the shuffle at |ids| x num_hashes, independent
    of shingle count. Permutations are (a*x + b) mod p over xxhash64.

    The base hash is MATERIALIZED in a projection before the aggregate:
    referencing the xxhash64 expression inside all num_hashes aggregates
    would re-evaluate it num_hashes times per row (codegen duplicates
    subtrees per use — measured 64x hash work without this)."""
    a, b = _perm_coeffs(num_hashes, seed)
    # hash_col: caller already materialized xxhash64(shingle) (r6 — the
    # pair-join path shares one hashed frame); values are identical.
    base = (
        F.pmod(F.col(hash_col), F.lit(_P))
        if hash_col
        else F.pmod(F.xxhash64("shingle"), F.lit(_P))
    )
    hashed = sh.select("id", base.alias("__x"))
    x = F.col("__x")
    mins = [
        F.min((x * F.lit(int(a[i])) + F.lit(int(b[i]))) % F.lit(_P)).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = hashed.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_candidates(
    sigs: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Band the signature, bucket-join: pairs sharing ANY band bucket.
    (id_a < id_b, distinct). Classic (bands x rows) S-curve tuning."""
    assert bands * rows_per_band <= 10_000
    banded = sigs.select(
        "id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b as band, xxhash64(array_join(slice(sig, b * {rows_per_band} + 1, {rows_per_band}), '_')) as bucket))"
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 32,
    max_df: int | str | None = "auto",
) -> DataFrame:
    """Full MinHash+LSH pipeline: shingle -> signature -> band candidates
    -> exact-Jaccard verification of candidates only. At corpus scale the
    verification join touches only the candidate pair set, not all pairs.
    Shingles persist MEMORY_AND_DISK, released at the next tracked-cache
    query build (operators/caching.py)."""
    # r6: one hashed-long shingle frame (see _hashed_shingles) feeds
    # signatures, sizes and verification alike. Partitioned on id: the
    # signature groupBy(id), the size aggregate and both verification
    # joins all key on an id — one exchange at cache build serves all.
    sh = _hashed_shingles(df, id_col, text_col, n, max_df, part_col="id")
    # r6 session 3: persist the signature frame — the band self-join's two
    # sides otherwise each re-evaluate the 64-min aggregate over the
    # corpus-scale shingle cache (guide §7.2 duplicated subtrees; measured
    # ~1 s per extra evaluation at sf1.0). |docs| x (num_hashes+1) longs —
    # bounded like the sh cache, same persist_tracked release discipline.
    sigs = persist_tracked(minhash_signatures(sh, num_hashes, hash_col="h"))
    cand = minhash_lsh_candidates(sigs, bands, num_hashes // bands)
    # r6 verification: per-doc shingle-hash ARRAYS + array_intersect,
    # replacing the old candidate⋈shingle⋈shingle join chain. The band
    # screen is recall-oriented — at (bands=32, r=2) a template-heavy
    # corpus yields ~150x more candidates than final pairs (measured
    # 405k cand -> 2.6k pairs at sf1.0), so the old verify shuffled
    # |cand| x avg_doc_size (~21M) rows; here the doc array table is
    # |docs| rows (bounded by doc length), built WITHOUT an exchange
    # (the cache is already id-partitioned), and each candidate pair is
    # verified row-locally. Exact: arrays hold the distinct per-doc hash
    # set, so size(array_intersect) == the old equi-join inter count and
    # size(hs) == the old per-doc size aggregate. A band-collision pair
    # sharing ZERO shingles now scores jaccard 0 instead of vanishing
    # from the inner join — identical output for any threshold > 0
    # (every caller uses 0.5-0.7).
    # persisted for the same reason: aa and bb below otherwise re-run the
    # collect_list aggregate once per verification join side (measured
    # base 6.4 / sigs 5.4-6.0 / sigs+arrs 4.4 s best-of-3 at sf1.0).
    arrs = persist_tracked(
        sh.groupBy("id").agg(F.collect_list("h").alias("hs"))
    )
    aa = arrs.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"))
    bb = arrs.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"))
    paired = cand.join(aa, "id_a").join(bb, "id_b")
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    sz_a, sz_b = F.size("hs_a"), F.size("hs_b")
    return (
        paired.select(
            "id_a",
            "id_b",
            (inter / (sz_a + sz_b - inter)).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# -------------------------------------------------------------- simhash --

# Portable token-hash mixing constants (shared with the generated DuckDB
# oracle in plans/entry_queries.py — keep in lockstep). Two independent
# linear mixes over (length, first, second, last, second-to-last code
# points): lo is 32 bits, hi 31 bits -> a 63-bit hash (bit 63 always 0,
# which contributes a constant simhash bit — harmless for hamming).
PORTABLE_HASH_COEFFS = {
    "lo": (2654435761, 1315423911, 2246822519, 3266489917, 668265263),
    "hi": (374761393, 3130571291, 4053974081, 2869860233, 1541459225),
}
_M32_ = 1 << 32
_M31_ = 1 << 31


def portable_token_hash64(tok) -> F.Column:
    """63-bit token hash computable identically in Spark Column algebra and
    ANSI SQL (verified: length/ascii/substring semantics agree between
    Spark and DuckDB on empty, 1-char and multibyte tokens). Weaker
    dispersion than xxhash64 — it exists so the driver's DuckDB oracle can
    reproduce SimHash exactly; production paths keep xxhash64."""
    feats = [
        F.length(tok).cast("long"),
        F.ascii(tok).cast("long"),
        F.ascii(F.substring(tok, 2, 1)).cast("long"),
        F.ascii(F.substring(tok, -1, 1)).cast("long"),
        F.ascii(F.substring(tok, -2, 1)).cast("long"),
    ]
    lo = sum(f * F.lit(c) for f, c in zip(feats, PORTABLE_HASH_COEFFS["lo"])) % F.lit(_M32_)
    hi = sum(f * F.lit(c) for f, c in zip(feats, PORTABLE_HASH_COEFFS["hi"])) % F.lit(_M31_)
    return hi * F.lit(_M32_) + lo


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, token_hash=None
) -> DataFrame:
    """64-bit SimHash per document, fully JVM-side: explode tokens,
    hash each (xxhash64 by default; pass ``portable_token_hash64`` for the
    SQL-oracle-reproducible variant), per-bit +/-1 sums via 64 conditional
    aggregates (map-side combined), sign -> bit. One shuffle of
    |ids| x 64 longs."""
    from .partitioning import widen

    # r6: widen a degenerate single-split source before the tokenize +
    # per-token hash (CPU-heavy row-local stage; no-op at real scale)
    toks = widen(df, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.col(text_col)), "\\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    # materialize the token hash ONCE per row before the 64 aggregates —
    # referencing the hash expression inside each bit-sum would re-evaluate
    # it 64x per token (codegen duplicates subtrees per use)
    hexpr = token_hash(F.col("tok")) if token_hash is not None else F.xxhash64("tok")
    hashed = toks.select("id", hexpr.alias("__h"))
    h = F.col("__h")
    # r6: aggregate plain bit COUNTS (sum of (h>>i)&1 — no conditional
    # branch per token per bit) and reconstruct the ±1 sums exactly as
    # b_i = 2*c_i - n in a post-aggregate projection: a token with bit
    # set contributes +1 = 2*1-1, unset contributes -1 = 2*0-1, so the
    # values (not just the signs) are bit-identical to the old
    # when(+1/-1) aggregates at ~half the per-row expression cost.
    bit_counts = [
        F.sum(F.shiftright(h, i).bitwiseAND(F.lit(1))).alias(f"c{i}")
        for i in range(64)
    ]
    agg = (
        hashed.groupBy("id")
        .agg(F.count("*").alias("__n"), *bit_counts)
        .select(
            "id",
            *[
                (F.lit(2) * F.col(f"c{i}") - F.col("__n")).alias(f"b{i}")
                for i in range(64)
            ],
        )
    )
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << i).cast("long") if i < 63 else F.when(F.col("b63") > 0, F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return agg.select("id", sig.alias("simhash"))


def simhash_near_dup_pairs(
    sigs: DataFrame, max_hamming: int = 3, chunks: int = 4
) -> DataFrame:
    """Near-dup pairs with hamming(sig_a, sig_b) <= max_hamming via the
    chunk-index trick: pigeonhole — any pair within distance k < chunks
    shares at least one exact 16-bit chunk; join per chunk, then verify
    with bit_count(xor)."""
    width = 64 // chunks
    # r6 session 3: the self-join's two sides otherwise each re-evaluate
    # the whole signature build (the 64-bit-count aggregate over token
    # hashes — guide §7.2 duplicated subtrees; measured 6.9 -> 2.3 s on a
    # cold session, ~0.4 s steady-state at sf1.0). |docs| x 2 longs.
    sigs = persist_tracked(sigs)
    chunked = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {chunks - 1}), "
                f"c -> struct(c as chunk, shiftright(simhash, c * {width}) & {(1 << width) - 1} as piece))"
            )
        ).alias("cp"),
    ).select("id", "simhash", "cp.chunk", "cp.piece")
    a = chunked.alias("a")
    b = chunked.alias("b")
    return (
        a.join(b, ["chunk", "piece"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --------------------------------------------- duplicate-cluster resolve --


def dup_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over a near-dup pair graph: (id, cluster_id)
    where cluster_id = min id in the component — the transitive closure the
    pairwise screens (jaccard/minhash/simhash/cosine) need before a
    keep-one-per-cluster policy (dropping id_b per PAIR mis-handles chains
    a~b~c).

    Iterative min-label propagation WITH pointer jumping (ADVICE r2): each
    round first takes the min over graph neighbors, then compresses one
    pointer hop (cluster_id := label(cluster_id)) — label paths halve per
    round, so convergence is O(log diameter) rounds, not O(diameter), and
    a 2^20-long templated-doc chain converges inside max_iter=20. Each
    round's frame is localCheckpoint()ed: at 10^12 scale an unbroken
    20-round lineage would re-execute the whole chain on any retry and
    blow up plan compilation. (localCheckpoint blocks are executor-local;
    a production run on a preemptible cluster should use setCheckpointDir
    + .checkpoint() for fault-tolerant truncation — same plan otherwise.)
    The per-round convergence check is ONE scalar count action
    (documented driver round-trip, bounded by max_iter).

    Raises RuntimeError if labels are still changing after max_iter rounds
    (ADVICE r2: silently returning unmerged clusters would make a
    keep-one-per-cluster policy retain extra near-dups with no signal).
    """
    # materialize the (possibly expensive) upstream pair plan ONCE — every
    # iteration joins against sym, and without this each round would
    # re-execute the whole candidate-generation pipeline. r6: checkpoint
    # the DIRECTED edges BEFORE symmetrizing — a union of two instances
    # of the pair plan executes that plan TWICE (exchange reuse shares
    # the shuffle, not the downstream pair aggregate; measured 19 s vs
    # 10.6 s on the sf1.0 jaccard screen). The symmetric view is then a
    # trivial union over the checkpointed rows.
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).localCheckpoint()
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # r6: lazy checkpoint — materializes inside round 1's convergence
    # count instead of as its own job (one fewer action; same blocks)
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
        .localCheckpoint(eager=False)
    )
    changed = -1
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("cluster_id").alias("nbr_label"))
        )
        # carry the round's starting label as __old so convergence is a
        # scan of the checkpointed frame, NOT a shuffle join back to the
        # previous label table — one fewer shuffle per round, and at
        # corpus scale the convergence check costs a filter instead of a
        # re-partition of the full label table
        new = labels.join(nbr_min, "id", "left").select(
            "id",
            F.col("cluster_id").alias("__old"),
            F.least(
                F.col("cluster_id"), F.coalesce("nbr_label", F.col("cluster_id"))
            ).alias("cluster_id"),
        )
        # pointer jump: follow the label one hop through the label table
        # itself (labels are monotone non-increasing and the component min
        # is a fixpoint, so compression preserves the answer)
        parent = new.select(
            F.col("id").alias("__pid"), F.col("cluster_id").alias("__plabel")
        )
        new = (
            new.join(parent, new.cluster_id == parent.__pid, "left")
            .select(
                "id",
                "__old",
                F.least(
                    F.col("cluster_id"), F.coalesce("__plabel", F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            # r6: eager=False — the convergence count below is the action
            # that materializes this round's blocks, so each round costs
            # ONE job (join+jump+persist+count fused) instead of two
            # (checkpoint job, then count job). Lineage truncation is
            # identical once the blocks exist.
            .localCheckpoint(eager=False)
        )
        changed = new.where(F.col("cluster_id") != F.col("__old")).count()
        labels = new.select("id", "cluster_id")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"dup_clusters did not converge within max_iter={max_iter} rounds "
            f"({changed} labels still changing) — raise max_iter; with pointer "
            f"jumping this bounds component diameter at 2^max_iter"
        )
    return labels


def canonical_per_cluster(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str,
    score,
) -> DataFrame:
    """Canonical selection — the step AFTER clustering that production
    dedup actually ships: keep exactly ONE document per near-dup cluster,
    chosen by QUALITY (highest ``score``; ties broken by smallest id so
    the choice is deterministic), not by arbitrary min-id. The reference's
    keep-one policy keeps the FIRST occurrence (first_occurrence_dedup,
    fastq.py basis); at corpus scale you keep the best-scored member
    (longest text / highest quality-classifier score / canonical URL).

    ``clusters`` is (id, cluster_id) from :func:`dup_clusters`; documents
    absent from it are singletons and keep themselves (cluster key
    coalesces to the doc's own id). One keyed window over cluster_id —
    partition size is bounded by the largest dup cluster, the same bound
    dedup_exact's md5 window carries.

    Returns the kept rows: all ``docs`` columns + ``cluster_id``.
    """
    labeled = docs.join(
        clusters.select(F.col("id").alias(id_col), "cluster_id"), id_col, "left"
    ).withColumn("cluster_id", F.coalesce("cluster_id", F.col(id_col)))
    w = Window.partitionBy("cluster_id").orderBy(
        score.desc(), F.col(id_col).asc()
    )
    return (
        labeled.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .drop("__rn")
    )


# ---------------------------------------------------- incremental dedup --


def incremental_dedup_exact(
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    seen_hashes: DataFrame,
    hash_col: str = "h",
) -> tuple[DataFrame, DataFrame]:
    """Production-shaped INCREMENTAL exact dedup: a new batch arrives, the
    existing corpus is represented only by its stored content-hash table
    (what a real pipeline persists between runs — never the texts).
    Two steps: keep one row per hash WITHIN the batch (min id), then
    anti-join the batch's hashes against the seen table. Returns
    (clean_new_rows, their hashes to append to the seen table).

    Scale shape: the seen table is corpus-scale but the probe is a keyed
    anti-join on the uniform md5 key — only the NEW BATCH shuffles
    (|batch| rows), the seen side streams; bucket the stored hash table on
    `h` in production so the join is co-located with zero shuffle of
    either side. The within-batch step is one window over md5(batch).
    """
    batch_first = dedup_exact(new_docs, id_col, text_col)
    hashed = batch_first.withColumn("__h", F.md5(F.col(text_col)))
    clean = hashed.join(
        seen_hashes.select(F.col(hash_col).alias("__h")), "__h", "left_anti"
    )
    return clean.drop("__h"), clean.select(F.col("__h").alias(hash_col))


def incremental_band_screen(
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    band_table: DataFrame,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup flavor of the incremental screen: the existing corpus is
    represented by its stored MinHash BAND table ((band, bucket) rows —
    the LSH index a production near-dup pipeline persists). New docs whose
    signature shares ANY band bucket with the corpus are FLAGGED as
    near-dup candidates (recall-oriented screen; exact verification needs
    the flagged originals fetched separately). Returns
    (survivors, flagged). The probe is an equi-join on (band, bucket) —
    the new batch's bands only; the corpus index streams/co-locates."""
    sh = word_shingles(new_docs, id_col, text_col, n)
    sigs = minhash_signatures(sh, num_hashes)
    banded = sigs.select(
        "id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b as band, xxhash64(array_join(slice(sig, b * {num_hashes // bands} + 1, {num_hashes // bands}), '_')) as bucket))"
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    flagged_ids = (
        banded.join(band_table, ["band", "bucket"], "left_semi")
        .select(F.col("id").alias(id_col))
        .distinct()
    )
    flagged = new_docs.join(flagged_ids, id_col, "left_semi")
    survivors = new_docs.join(flagged_ids, id_col, "left_anti")
    return survivors, flagged


def corpus_band_table(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
) -> DataFrame:
    """Build the persistable (band, bucket) LSH index of a corpus — the
    artifact incremental_band_screen probes against."""
    sh = word_shingles(docs, id_col, text_col, n)
    sigs = minhash_signatures(sh, num_hashes)
    r = num_hashes // bands
    return sigs.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b as band, xxhash64(array_join(slice(sig, b * {r} + 1, {r}), '_')) as bucket))"
            )
        ).alias("bb")
    ).select("bb.band", "bb.bucket").distinct()


# ------------------------------------------------- decontamination screen --


def decontaminate_against(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    max_df: int | str | None = None,
) -> DataFrame:
    """Test-set decontamination (the GPT-3/Pile-style screen a training
    corpus MUST run): drop every corpus document sharing at least one word
    n-gram (default 8-gram) with the benchmark set.

    Shape at scale: benchmark shingles are the SMALL side — distinct
    n-grams of the eval suites — so the membership probe is a broadcast
    semi-join against the corpus shingle stream; the corpus is never
    shuffled. Returns the clean corpus (original columns).

    max_df defaults to None (ADVICE r2): the skew guard exists to stop
    quadratic self-join blowup, but this probe is a broadcast semi-join —
    no self-join — and dropping high-df corpus shingles would silently
    EXEMPT exactly the mass-contamination case the screen exists for (a
    benchmark n-gram leaked into >1% of the corpus). Setting max_df is a
    RECALL-REDUCING option for when corpus shingling itself needs the df
    cap; it never caps the benchmark side.
    """
    bench_sh = word_shingles(benchmark, id_col, text_col, n, max_df=None).select(
        "shingle"
    ).distinct()
    corpus_sh = word_shingles(corpus, id_col, text_col, n, max_df)
    dirty = (
        corpus_sh.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select(F.col("id").alias(id_col))
        .distinct()
    )
    # dirty-id cardinality is corpus-dependent — keyed anti-join, let AQE
    # choose broadcast when it is actually small
    return corpus.join(dirty, id_col, "left_anti")


def decontaminate_substrings(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    window: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Substring-level decontamination via winnowing fingerprints — the
    screen that catches what exact n-gram matching misses: winnowed
    fingerprints survive token insertions/deletions SHIFTING gram
    boundaries (any shared run of >= k + window - 1 tokens is guaranteed
    to share a fingerprint VALUE), so a benchmark passage lightly edited
    into a training document still collides. Drops corpus documents
    sharing >= min_shared DISTINCT fingerprint values with the benchmark
    set (min_shared=2 suppresses single-hash coincidences of the 31-bit
    portable hash).

    Scale shape mirrors decontaminate_against: benchmark fingerprints are
    the SMALL side (selection density ~2/(window+1) of the eval-suite
    grams) and broadcast; the corpus fingerprint stream is probed by a
    broadcast semi-join, then only the MATCHED (doc, fp) rows — tiny by
    construction — shuffle into the per-doc threshold count. The corpus
    text itself never reshuffles."""
    from .textstats import winnowing_fingerprints

    bfp = winnowing_fingerprints(benchmark, id_col, text_col, k, window).select(
        "fp"
    ).distinct()
    cfp = winnowing_fingerprints(corpus, id_col, text_col, k, window).select(
        F.col(id_col), "fp"
    ).distinct()
    dirty = (
        cfp.join(F.broadcast(bfp), "fp", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("__n_shared"))
        .where(F.col("__n_shared") >= min_shared)
        .select(id_col)
    )
    return corpus.join(dirty, id_col, "left_anti")


def benchmark_fingerprints(
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    window: int = 4,
) -> DataFrame:
    """Distinct winnowing fingerprint VALUES of a benchmark/eval set — the
    small broadcastable probe side of every substring screen. Compute (and
    persist) it ONCE when screening many batches against the same
    benchmark (streaming/excise_stream.py); excise_substrings accepts it
    via benchmark_fps."""
    from .textstats import winnowing_fingerprints

    return (
        winnowing_fingerprints(benchmark, id_col, text_col, k, window)
        .select("fp")
        .distinct()
    )


def excise_substrings(
    corpus: DataFrame,
    benchmark: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    window: int = 4,
    merge_gap: int | None = None,
    benchmark_fps: DataFrame | None = None,
) -> DataFrame:
    """Substring-span EXCISION — the production half of Lee et al. (2022)
    that `decontaminate_substrings` leaves on the table: instead of
    dropping every corpus document that shares winnowed fingerprints with
    the benchmark set, CUT the duplicated/contaminated token spans out and
    keep the remainder. Reference analog: the trim stages remove
    contaminated SPANS of a read and keep the rest (run.py:372-450); they
    never discard the whole read for one bad window.

    Span location: each matched corpus fingerprint at token position p
    witnesses a shared k-gram [p, p+k-1], PADDED by window-1 tokens on
    both sides. The pad is what makes coverage COMPLETE: winnowing
    selects one fingerprint per window of `window` consecutive k-grams,
    so the first/last selected print of a shared run can sit up to
    window-1 k-grams inside it — unpadded spans would leave up to
    window-1 duplicated tokens at each end, and for decontamination the
    failure mode is LEAVING benchmark text, not over-cutting <= window-1
    adjacent tokens. Witnesses within `merge_gap` uncovered tokens of
    each other merge into one span (default merge_gap=window — inside a
    single shared run, selected prints are at most `window` k-grams
    apart, so the run coalesces into ONE span). Emits one row per corpus
    document — untouched docs pass through with n_cut = 0:
    (id, clean_text, n_tokens, n_cut, n_spans).

    clean_text is rebuilt over the NORMALIZED token stream (lower,
    whitespace-collapsed — the same stream the fingerprints are computed
    on), so span arithmetic and emission share one tokenization.

    Plan shape: benchmark fingerprint values broadcast into a semi-join
    probe of the corpus fingerprint stream (exactly the
    decontaminate_substrings screen); the surviving (doc, pos) witnesses
    — tiny by construction — merge into spans with doc-keyed windows (no
    global window), collect to <= one array row per CONTAMINATED doc, and
    broadcast-left-join back onto the corpus, so the corpus text never
    reshuffles. The rebuild is pure JVM higher-order algebra
    (transform/filter/exists/concat_ws) — no Python in the emission path.
    """
    from .textstats import winnowing_fingerprints

    if merge_gap is None:
        merge_gap = window
    if (benchmark is None) == (benchmark_fps is None):
        raise ValueError("pass exactly one of benchmark / benchmark_fps")

    bfp = (
        benchmark_fps
        if benchmark_fps is not None
        else benchmark_fingerprints(benchmark, id_col, text_col, k, window)
    )
    cfp = winnowing_fingerprints(corpus, id_col, text_col, k, window).select(
        F.col(id_col).alias("id"), "fp_pos", "fp"
    )
    witnesses = cfp.join(F.broadcast(bfp), "fp", "left_semi").select(
        "id", "fp_pos"
    )
    return _excise_from_witnesses(
        corpus, witnesses, id_col, text_col, k, window, merge_gap
    )


def _excise_from_witnesses(
    corpus: DataFrame,
    witnesses: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    window: int,
    merge_gap: int,
) -> DataFrame:
    """Shared excision tail: pad witness k-grams ((id, fp_pos) rows) by
    window-1 per side, merge gaps-and-islands on doc-keyed windows, and
    rebuild the kept token stream JVM-side. See excise_substrings for the
    coverage-slop argument behind the pad."""
    from pyspark.sql import Window as W

    pad = window - 1
    hits = witnesses.select(
        "id",
        F.greatest(F.col("fp_pos") - pad, F.lit(0)).alias("s"),
        (F.col("fp_pos") + k - 1 + pad).alias("e"),
    ).distinct()

    # gaps-and-islands merge, doc-keyed windows only: a witness starts a
    # new span iff it leaves > merge_gap uncovered tokens after everything
    # seen so far
    w_ord = W.partitionBy("id").orderBy("s", "e")
    prev_end = F.max("e").over(w_ord.rowsBetween(W.unboundedPreceding, -1))
    brk = F.when(
        F.col("s") > F.coalesce(prev_end, F.lit(-(1 << 40))) + 1 + merge_gap, 1
    ).otherwise(0)
    grp = hits.withColumn(
        "g", F.sum(brk).over(w_ord.rowsBetween(W.unboundedPreceding, 0))
    )
    spans = grp.groupBy("id", "g").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    per_doc = spans.groupBy("id").agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("__spans")
    )

    norm_toks = F.split(
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")), " "
    )
    base = corpus.select(F.col(id_col), norm_toks.alias("__toks"))
    joined = base.join(
        F.broadcast(per_doc.withColumnRenamed("id", id_col)), id_col, "left"
    ).withColumn(
        "__spans",
        F.coalesce(
            "__spans", F.expr("cast(array() as array<struct<s:bigint,e:bigint>>)")
        ),
    )
    kept = F.expr(
        "filter(transform(__toks, (t, i) -> struct(t as t, i as i)), "
        "x -> NOT exists(__spans, sp -> x.i >= sp.s AND x.i <= sp.e))"
    )
    return (
        joined.withColumn("__kept", kept)
        .select(
            id_col,
            F.concat_ws(" ", F.expr("transform(__kept, x -> x.t)")).alias(
                "clean_text"
            ),
            F.size("__toks").cast("long").alias("n_tokens"),
            (F.size("__toks") - F.size("__kept")).cast("long").alias("n_cut"),
            F.size("__spans").cast("long").alias("n_spans"),
        )
    )


def excise_dup_substrings(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    window: int = 4,
    merge_gap: int | None = None,
) -> DataFrame:
    """INTRA-corpus duplicate-span excision — Lee et al. (2022)
    ExactSubstr semantics: when a passage appears in several documents,
    KEEP its first occurrence (the min-id document) intact and cut the
    span out of every later document, so exactly one copy of every
    passage survives. The keep-first rule mirrors paragraph_dedup /
    first_occurrence_dedup; the span machinery is excise_substrings'.

    Scale shape — NO pair expansion anywhere: one winnowing pass, a
    count>1 filter on the per-fingerprint frame (map-side combinable
    min/count agg) so only genuinely shared fingerprint values — a tiny
    fraction of the corpus — re-join the fingerprint stream (fp-keyed
    hash join), and a witness is any (doc, pos) whose doc is NOT the
    value's min-id keeper. Hot boilerplate fingerprints are the point
    here, not a skew hazard: cost is linear in occurrences (each yields
    one witness row), never quadratic pairs. Corpus text still never
    reshuffles (broadcast span-array join, bounded by contaminated-doc
    count)."""
    from .textstats import winnowing_fingerprints

    if merge_gap is None:
        merge_gap = window

    fp = winnowing_fingerprints(corpus, id_col, text_col, k, window).select(
        F.col(id_col).alias("id"), "fp_pos", "fp"
    )
    shared = (
        fp.groupBy("fp")
        .agg(F.min("id").alias("__keep_id"), F.count("*").alias("__n"))
        .where(F.col("__n") > 1)
        .select("fp", "__keep_id")
    )
    witnesses = (
        fp.join(shared, "fp")
        .where(F.col("id") != F.col("__keep_id"))
        .select("id", "fp_pos")
    )
    return _excise_from_witnesses(
        corpus, witnesses, id_col, text_col, k, window, merge_gap
    )


# ---------------------------------------------------- paragraph dedup --


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: "str | None" = None,
    window: int = 3,
) -> DataFrame:
    """Exact paragraph-level dedup, keep-first (CCNet / RefinedWeb style):
    split every document into paragraphs, keep each distinct paragraph
    ONLY at its first occurrence — ordered by (id, position) — and
    reassemble documents from their surviving paragraphs. This is the
    boilerplate remover every web-scale text pipeline runs before
    document-level dedup (headers, nav bars, cookie banners repeat across
    millions of pages while the documents containing them are distinct).

    Splitting: `delim` (a literal separator, e.g. "\\n\\n") for corpora
    with real paragraph structure — blank/whitespace-only paragraphs are
    excluded from dedup (they are layout, and would otherwise all collide
    and delete each other); or token windows of `window` tokens when no
    delimiter exists (slice + array_join over an index sequence — the
    doc_chunks idiom, JVM-only).

    Returns (id, clean_text, n_kept, n_total) — one row per input
    document, clean_text == '' when every paragraph was first seen
    elsewhere (the all-boilerplate page), so drop-rate audits need no
    outer join back to the corpus.

    Scale shape — two properties make this 100-TB-safe:
    * keep-first needs NO join-back: min(struct(id, pos)) per paragraph
      IS the kept set (each distinct paragraph survives exactly once, at
      its minimum). One hash-partitioned aggregate keyed on the paragraph
      text, and min() is map-side combinable, so a paragraph repeated
      10^8 times partial-aggregates to one row per map task — corpus-hot
      boilerplate creates NO reduce-side skew (contrast the shingle df
      guard, which must salt because collect-style aggregation is not
      combinable).
    * reassembly and totals both hash-partition by id, so their final
      join is co-partitioned (no third distribution of the data).
    Keying on the paragraph STRING keeps the oracle gate exact; at
    production scale key the aggregate on xxhash64(para) instead to cut
    shuffle width (2^-64 collision odds, documented trade).

    Reference lineage: the first-occurrence dedup policy of SAM->FASTQ
    conversion (utilities.py:63-106) applied at sub-document granularity.
    """
    from .partitioning import widen

    # r6: widen a degenerate single-split source before the CPU-heavy
    # paragraph split/chunk explode (no-op at real scale)
    df = widen(df, id_col)
    if delim is not None:
        paras = df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), F.lit(delim), -1)).alias(
                "pidx", "para"
            ),
        ).where(F.length(F.trim("para")) > 0)
        sep = delim
    else:
        chunks = F.expr(
            f"transform(sequence(0, greatest((size(split({text_col}, ' ')) - 1) "
            f"div {window}, 0)), i -> struct(i as pidx, array_join(slice("
            f"split({text_col}, ' '), i * {window} + 1, {window}), ' ') as para))"
        )
        paras = df.select(F.col(id_col).alias("id"), F.explode(chunks).alias("c")).select(
            "id", F.col("c.pidx").alias("pidx"), "c.para"
        )
        sep = " "
    firsts = (
        paras.groupBy("para")
        .agg(F.min(F.struct("id", "pidx")).alias("f"))
        .select(F.col("f.id").alias("id"), F.col("f.pidx").alias("pidx"), "para")
    )
    kept = firsts.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pidx", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("clean_text"),
        F.count("*").cast("long").alias("n_kept"),
    )
    totals = paras.groupBy("id").agg(F.count("*").cast("long").alias("n_total"))
    return (
        totals.join(kept, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            "n_total",
        )
    )


def substring_dup_pairs(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    window: int = 4,
    min_shared: int = 2,
    max_df: "int | str" = "auto",
) -> DataFrame:
    """Intra-corpus SUBSTRING-level near-dup pairs: (id_a, id_b, n_shared)
    for document pairs sharing >= min_shared distinct winnowing
    fingerprint values — the self-join counterpart of
    decontaminate_substrings, and the granularity n-gram MinHash misses
    (a long passage pasted into an otherwise-unrelated document moves
    whole-document Jaccard barely, but shares every fingerprint in the
    pasted run; winnowing guarantees a shared value for any shared run of
    >= k + window - 1 tokens, robust to edits shifting gram boundaries).

    Scale shape (the audiodup screen, value-keyed): distinct (id, fp) rows
    persisted once, a count-per-fp guard (count IS map-side combinable, so
    unlike the collect-style shingle guard no salting is needed) dropping
    values in more docs than max(AUTO_DF_MIN, n_docs div AUTO_DF_DIV)
    under max_df='auto' — corpus-boilerplate phrases carry no pairing
    signal and are the quadratic hot keys; the hot list is broadcastable
    by the word_shingles argument (|hot| <= fp_rows/ceiling, corpus-size
    independent, with n_docs entering the plan as a broadcast 1-row
    frame). Then bucket-collect pair expansion (one scan, each pair once
    per shared value) and a keyed count >= min_shared; pair fan-out is
    bounded by ceiling^2 per fingerprint value.

    Reference lineage: the TRF repeat screen's role (run.py:452-480) —
    flag sequences sharing long exact runs — executed corpus-vs-itself.
    """
    from .textstats import winnowing_fingerprints

    fp = (
        winnowing_fingerprints(corpus, id_col, text_col, k, window)
        .select(F.col(id_col).alias("id"), "fp")
        .distinct()
    )
    fp = persist_tracked(fp)
    dfc = fp.groupBy("fp").agg(F.count("*").alias("__df"))
    hot = _hot_fingerprints(dfc, corpus, max_df).select("fp")
    kept = fp.join(F.broadcast(hot), "fp", "left_anti")
    buckets = (
        kept.groupBy("fp")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.expr(
                    "transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> struct(x as id_a, y as id_b)))"
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def normalized_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact dedup keyed on the NORMALIZED text (functions.text.
    normalize_col: lowercase / strip punctuation / collapse whitespace):
    (doc_id, keep, canonical_id, n_copies) for every row. Catches the
    case/punctuation/spacing near-dup class — reposts with an added
    exclamation mark, shouted copies, double-spaced rescrapes — at
    exact-dedup cost: one keyed window over md5(normalized), the same
    shuffle shape (and hot-key bound: dup-group size) as dedup_exact,
    zero Python. Emission keeps original text; only the KEY is
    normalized.

    Sits between dedup_exact (raw md5) and MinHash (token-set overlap)
    in the dedup ladder: cheaper than shingling, strictly more recall
    than raw md5.
    """
    from ..functions.text import normalize_col

    w = Window.partitionBy(F.md5(normalize_col(F.col(text_col))))
    return df.select(
        F.col(id_col),
        (F.col(id_col) == F.min(id_col).over(w)).cast("int").alias("keep"),
        F.min(id_col).over(w).alias("canonical_id"),
        F.count("*").over(w).cast("long").alias("n_copies"),
    )
