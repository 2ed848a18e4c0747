"""Text-analysis operators for the documents table: token counting,
quality scoring, stopword-based language signals, fingerprinting.

All JVM-side Column algebra (split / filter / aggregate higher-order
functions) — zero Python in the hot path; each has an exact ANSI-SQL
oracle for the driver's DuckDB check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import KNUTH, M32

# tiny per-language stopword lists (subset of vocab.LANG_VOCAB heads)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "that", "it", "was", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "se", "no", "por"],
}


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token count (whitespace), BPE-ish subword count (runs of letters /
    digits / single punctuation — a cheap tokenizer-budget proxy), char
    count, mean word length."""
    toks = F.split(F.trim(F.col(text_col)), "\\s+")
    subword = F.size(
        F.expr(
            rf"regexp_extract_all({text_col}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)"
        )
    )
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        subword.alias("n_subwords"),
        F.length(text_col).alias("n_chars"),
        F.round(
            F.try_divide(
                F.aggregate(toks, F.lit(0).cast("long"), lambda s, t: s + F.length(t)),
                F.size(toks),
            ),
            4,
        ).alias("mean_word_len"),
    )


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features: punct ratio, digit ratio, space ratio,
    uppercase ratio, stopword(en) ratio — the document analog of the
    reference's quality-trim heuristics (config.py:44-49)."""
    t = F.col(text_col)
    n = F.length(t).cast("double")
    toks = F.split(F.lower(F.trim(t)), "\\s+")
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_sw = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return df.select(
        F.col(id_col),
        F.round(F.try_divide(n - F.length(F.regexp_replace(t, r"[^\w\s]", "")), n), 4).alias("punct_ratio"),
        F.round(F.try_divide(n - F.length(F.regexp_replace(t, r"[0-9]", "")), n), 4).alias("digit_ratio"),
        F.round(F.try_divide(n - F.length(F.regexp_replace(t, r"[A-Z]", "")), n), 4).alias("upper_ratio"),
        F.round(F.try_divide(n_sw.cast("double"), F.size(toks)), 4).alias("stopword_ratio"),
    )


def lang_stopword_votes(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Language-ID heuristic over documents: per-language stopword hit
    counts + argmax vote (ties -> lexicographically first lang)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), "\\s+")

    def _vote(lang: str):
        arr = F.array([F.lit(w) for w in STOPWORDS[lang]])
        # single-arg lambda only: a second (default) arg would make PySpark
        # treat it as an (element, index) lambda
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    votes = {lang: _vote(lang) for lang in STOPWORDS}
    # r6: tokenize + per-language array scans are the whole cost and run
    # before any exchange — widen the degenerate single-split scan
    # (no-op at real scale, operators/partitioning.py)
    from .partitioning import widen

    df = widen(df, id_col)
    out = df.select(F.col(id_col), *[v.alias(f"votes_{k}") for k, v in votes.items()])
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"votes_{k}") for k in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):
        pred = F.when(F.col(f"votes_{lang}") == best, lang).otherwise(pred)
    return out.withColumn("pred_lang", F.when(best > 0, pred).otherwise("und"))


def overrepresented_ngrams(
    df: DataFrame, text_col: str, n: int = 2, min_count: int = 30
) -> DataFrame:
    """FastQC overrepresented-sequence harvest (A6/F5 analog,
    /root/reference/kneaddata/utilities.py:1094-1164): corpus-level n-gram
    frequency aggregation; grams above min_count are 'adapters'."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    # short docs: sequence(1,0) is descending in Spark -> guard with CASE
    grams = F.expr(
        f"CASE WHEN size(tokens) >= {n} THEN "
        f"transform(sequence(1, size(tokens) - {n - 1}), "
        f"i -> array_join(slice(tokens, i, {n}), ' ')) "
        f"ELSE array() END"
    )
    from .partitioning import widen

    # r6: widen a degenerate single-split source before the n-gram
    # construction explode (no-op at real scale)
    return (
        widen(df.select(toks.alias("tokens")))
        .select(F.explode(grams).alias("ngram"))
        .where(F.col("ngram") != "")
        .groupBy("ngram")
        .agg(F.count("*").alias("n_occ"))
        .where(F.col("n_occ") >= min_count)
    )


def adaptive_scrub(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    min_count: int = 30,
    repl: str = "<DUP>",
) -> DataFrame:
    """F5 two-phase adaptive trim (--run-trim-repetitive,
    /root/reference/kneaddata/utilities.py:1094-1164 + knead_data.py:519-532):
    phase 1 aggregates corpus statistics (overrepresented n-grams), phase 2
    rewrites every row with a plan PARAMETERIZED by those statistics — the
    reference's 'statistics-dependent plan parameter' shape (FastQC report
    -> adapter file -> re-trim), as one small agg job + one map job.

    The harvested gram set is tiny by construction (count >= min_count
    bounds it at |corpus tokens| / min_count) -> collected to the driver
    and compiled into one alternation regex, longest-first so Java/RE2
    leftmost-first alternation is deterministic and engine-portable."""
    grams = [
        r["ngram"]
        for r in overrepresented_ngrams(df, text_col, n, min_count).collect()
    ]
    # bounded by construction: each surviving gram occurs >= min_count
    # times, so |grams| <= |corpus token positions| / min_count. Assert the
    # practical regex-compilation ceiling rather than trusting it silently
    # (VERDICT r1 minor #4).
    assert len(grams) <= 1_000_000, (
        f"adaptive_scrub harvested {len(grams)} grams; raise min_count "
        f"(driver collect + alternation regex would be unreasonable)"
    )
    if not grams:
        return df.select(F.col(id_col), F.lower(F.col(text_col)).alias("scrubbed"))
    grams.sort(key=lambda g: (-len(g), g))
    import re as _re

    pat = "|".join(_re.escape(g) for g in grams)
    return df.select(
        F.col(id_col),
        F.regexp_replace(F.lower(F.col(text_col)), pat, repl).alias("scrubbed"),
    )


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-sensitive document fingerprint: position-weighted sum of
    portable token hashes mod 2^61 (rolling-hash flavor; deterministic and
    expressible in ANSI SQL for the oracle). Token hash = Knuth multiplier
    over (length, first/last code points)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), " ")
    tok_h = (
        lambda x: (
            (F.length(x).cast("long") * F.lit(KNUTH))
            + (F.ascii(x).cast("long") * F.lit(1315423911))
            + (F.ascii(F.substring(x, -1, 1)).cast("long") * F.lit(2246822519))
        )
        % F.lit(M32)
    )
    # position-weighted (1-based) sum of portable token hashes: associative,
    # overflow-safe in int64 (hash < 2^32, positions < 2^13)
    weighted = F.transform(toks, lambda x, i: (i.cast("long") + 1) * tok_h(x))
    fp = F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, h: acc + h)
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def repetition_screen(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher/MassiveText-style repetition screen (Rae et al. 2021, table
    A1) — the corpus-quality rule family the reference's TRF/low-complexity
    screens (run.py:452-480) play at read level, promoted to document
    level: drop documents dominated by a repeated n-gram.

    Per document: token count, distinct-token fraction (type/token ratio),
    and the fraction of tokens covered by the MOST FREQUENT word 2-gram /
    3-gram (overlapping occurrences count, so the fraction can exceed 1 on
    degenerate text — 'a a a a' has top2_frac 1.5; the keep thresholds are
    Gopher's: top-2-gram > 20% or top-3-gram > 18% drops).

    Scale shape: one explode emits BOTH gram sizes tagged (n, gram); two
    map-side-combined key-partitioned aggregations (per-(doc, n, gram)
    counts, then per-doc maxima) — never a corpus shuffle of raw text. The
    keep verdict is INTEGER arithmetic (10*m2 <= n, 50*m3 <= 3*n), so the
    cross-engine gate never rides a float rounding boundary; the reported
    fractions divide exact integers identically on both engines."""
    norm = F.split(
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")), " "
    )
    toks = df.select(F.col(id_col).alias("id"), norm.alias("toks"))
    base = toks.select(
        "id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
    )
    grams = toks.select(
        "id",
        F.explode(
            F.expr(
                "concat("
                "CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1), "
                "i -> struct(2 as n, array_join(slice(toks, i, 2), ' ') as g)) "
                "ELSE array() END, "
                "CASE WHEN size(toks) >= 3 THEN transform(sequence(1, size(toks) - 2), "
                "i -> struct(3 as n, array_join(slice(toks, i, 3), ' ') as g)) "
                "ELSE array() END)"
            )
        ).alias("ng"),
    ).select("id", F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))
    tops = (
        grams.groupBy("id", "n", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(
            F.max(F.when(F.col("n") == 2, F.col("c"))).cast("long").alias("m2"),
            F.max(F.when(F.col("n") == 3, F.col("c"))).cast("long").alias("m3"),
        )
    )
    j = base.join(tops, "id", "left").select(
        "id",
        "n_tokens",
        "n_distinct",
        F.coalesce("m2", F.lit(0)).alias("m2"),
        F.coalesce("m3", F.lit(0)).alias("m3"),
    )
    return j.select(
        F.col("id").alias(id_col),
        "n_tokens",
        F.round(F.col("n_distinct").cast("double") / F.col("n_tokens"), 6).alias(
            "distinct_frac"
        ),
        F.round(F.lit(2.0) * F.col("m2") / F.col("n_tokens"), 6).alias("top2_frac"),
        F.round(F.lit(3.0) * F.col("m3") / F.col("n_tokens"), 6).alias("top3_frac"),
        (
            (10 * F.col("m2") <= F.col("n_tokens"))
            & (50 * F.col("m3") <= 3 * F.col("n_tokens"))
        )
        .cast("int")
        .alias("keep"),
    )


# winnowing parameters (Schleimer/Wilkerson/Aiken, SIGMOD'03): k-gram
# size, window width, and the rolling-hash modulus/base shared with the
# generated DuckDB oracle (plans/entry_queries). MAXPOS bounds the
# position payload packed under the hash in the tie-breaking encoding;
# the operator ENFORCES it by truncating fingerprinting at the first
# 2^20 tokens per document (chunk giant docs first — doc_chunks).
WINNOW_P = (1 << 31) - 1
WINNOW_B = 1000003
WINNOW_MAXPOS = 1 << 20


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints — the substring-level dedup/
    plagiarism primitive (MOSS; Schleimer/Wilkerson/Aiken SIGMOD'03):
    hash every k-token gram, then keep one fingerprint per sliding window
    of `window` consecutive gram hashes — the window MINIMUM, ties broken
    toward the RIGHTMOST position. Guarantees a shared fingerprint for any
    shared run of >= k + window - 1 tokens, at ~2/(window+1) selection
    density — unlike fixed-stride sampling, robust to insertions shifting
    gram boundaries. Returns (doc_id, fp_pos, fp); equal fp values across
    documents locate shared substrings (join on fp for the screen).

    Plan shape: posexplode -> per-token portable hash -> k-gram polynomial
    hash via (k-1) lead()s over ONE keyed window pass -> window-min over
    [current, +window-1] in a second frame on the SAME partitioning (one
    shuffle on doc id total) -> distinct. The min/tie rule is packed into
    one BIGINT (hash * 2^20 + (2^20-1-pos)) so plain min() implements
    argmin-with-rightmost-ties identically in Spark and DuckDB. All
    integer arithmetic; the token hash is the portable mix the SimHash
    oracle shares (dedup.portable_token_hash64)."""
    from pyspark.sql import Window as W

    from .dedup import portable_token_hash64

    norm = F.split(
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")), " "
    )
    from .partitioning import widen

    # r6: widen a degenerate single-split source before the tokenize +
    # per-token hash stage (no-op at real scale)
    toks = widen(df, id_col).select(
        F.col(id_col).alias("id"), F.posexplode(norm).alias("pos", "tok")
    ).where(
        # enforce the MAXPOS precondition instead of trusting it: beyond
        # 2^20 tokens the packed position payload would underflow and
        # BORROW into the hash part (corrupting fp and the min ordering,
        # identically in the SQL oracle — parity could never catch it).
        # Fingerprinting truncates at the first 2^20 tokens per document,
        # mirrored in the oracle; chunk giant docs first (doc_chunks).
        F.col("pos") < WINNOW_MAXPOS
    )
    hashed = toks.select(
        "id", "pos", (portable_token_hash64(F.col("tok")) % WINNOW_P).alias("th")
    )
    w_ord = W.partitionBy("id").orderBy("pos")
    kh = F.col("th")
    for j in range(1, k):
        kh = (kh * WINNOW_B + F.lead("th", j).over(w_ord)) % WINNOW_P
    kg = hashed.select("id", "pos", kh.alias("kh")).where(F.col("kh").isNotNull())
    enc = F.col("kh") * WINNOW_MAXPOS + (F.lit(WINNOW_MAXPOS - 1) - F.col("pos"))
    w_min = W.partitionBy("id").orderBy("pos").rowsBetween(0, window - 1)
    sel = (
        kg.select("id", F.min(enc).over(w_min).alias("enc"))
        .distinct()
    )
    return sel.select(
        F.col("id").alias(id_col),
        (F.lit(WINNOW_MAXPOS - 1) - F.col("enc") % WINNOW_MAXPOS)
        .cast("long")
        .alias("fp_pos"),
        F.expr(f"enc div {WINNOW_MAXPOS}").alias("fp"),
    )


# DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): hashed-bigram bucket
# counts, target-vs-raw distribution weights, per-doc importance score.
# The paper's log-probability ratio is replaced by an integer
# PROBABILITY-DIFFERENCE weight (same selection direction) for the same
# reason bm25_topk uses a rational ln-free idf: ln differs in last-ulp
# across libm builds and float sums differ by order across engines —
# integer arithmetic is exact on both. Q*(cnt+1) must stay under 2^63:
# fine below ~2^33 bigrams per corpus at Q=2^30; shrink DSIR_Q for
# bigger corpora (weights only need relative precision).
DSIR_NB = 1021        # hash buckets (prime — the bucket mix keeps both tokens)
DSIR_Q = 1 << 30      # integer probability quantum
DSIR_K = 4099         # bigram bucket mixing multiplier
DSIR_HM = 1 << 20     # per-token hash truncation before mixing


def importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_col: str,
    n_buckets: int = DSIR_NB,
) -> DataFrame:
    """Per-document importance score for targeted data selection: how much
    more likely is this document under the TARGET subset's hashed-bigram
    distribution than under the full-corpus distribution? `target_col` is
    a boolean/int column marking target-domain rows (e.g. a trusted
    source or language). Output (id, n_bigrams, score, keep): score is an
    exact BIGINT (sum over the doc's buckets of count * integer weight,
    weight = Q*smoothed-target-prob - Q*smoothed-raw-prob, add-one
    smoothing); keep = score > 0 (more target-like than corpus-average).
    Documents with < 2 tokens have no bigram evidence and are omitted.
    Contract: total corpus bigrams must exceed `n_buckets` by a wide
    margin (true at any real scale) — otherwise add-one smoothing
    dominates and every weight degenerates to ~(ct - cr)/NB <= 0.

    Plan shape: bigram buckets are computed JVM-side per row (zip_with
    over two token-array slices — no sequence(), no Python) and exploded
    ONCE; per-(doc, bucket) partial counts are persisted and re-aggregated
    into the bucket table (the rollup_lattice partial-reuse pattern), so
    raw text is never shuffled and the corpus scans once. The weight
    table is exactly `n_buckets` rows — broadcast back onto the partials;
    corpus totals ride a 1-row broadcast frame (no driver action).

    Reference lineage: the two-model contaminate-vs-clean scoring of the
    reference's BMTagger stage (run.py:334-395) — a target-vs-background
    likelihood ratio deciding keep/drop — re-expressed over hashed
    n-gram count distributions."""
    from .caching import persist_tracked
    from .dedup import portable_token_hash64

    norm = F.split(
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")), " "
    )
    # r6: hash every token ONCE via transform() in a materialized
    # projection, then combine adjacent hashes. The old shape called
    # portable_token_hash64 inside the zip_with lambda on both slices —
    # each token's ~15-expression hash was evaluated twice (as t1 and as
    # t2), and `norm` itself (split+lower+regexp) was inlined into both
    # slice() arguments (guide §4: duplicated expression subtrees).
    hashed = F.transform(
        norm, lambda t: portable_token_hash64(t) % F.lit(DSIR_HM)
    )
    from .partitioning import widen

    # r6: widen a degenerate single-split source — the per-token hash
    # transform is the query's heaviest stage (no-op at real scale)
    pre = widen(df, id_col).select(
        F.col(id_col).alias("id"),
        F.col(target_col).cast("long").alias("tgt"),
        hashed.alias("__h"),
    )
    harr = F.col("__h")
    n1 = F.greatest(F.size(harr) - 1, F.lit(0))
    buckets = F.zip_with(
        F.slice(harr, F.lit(1), n1),
        F.slice(harr, F.lit(2), n1),
        lambda h1, h2: (h1 * DSIR_K + h2) % n_buckets,
    )
    ex = pre.select("id", "tgt", F.explode(buckets).alias("b"))
    # per-(doc, bucket) partials — the one corpus-scale aggregation; the
    # bucket table and the final per-doc scores both re-aggregate it
    partials = persist_tracked(
        ex.groupBy("id", "b").agg(
            F.count("*").alias("c"), F.first("tgt").alias("tgt")
        )
    )
    bucket_tot = partials.groupBy("b").agg(
        F.sum("c").alias("cr"), F.sum(F.col("c") * F.col("tgt")).alias("ct")
    )
    totals = bucket_tot.groupBy().agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    )
    w = bucket_tot.join(F.broadcast(totals)).select(
        "b",
        (
            F.expr(f"({DSIR_Q}L * (ct + 1)) div (tt + {n_buckets})")
            - F.expr(f"({DSIR_Q}L * (cr + 1)) div (tr + {n_buckets})")
        ).alias("w"),
    )
    scored = (
        partials.join(F.broadcast(w), "b")
        .groupBy("id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("w")).cast("long").alias("score"),
        )
    )
    return scored.select(
        F.col("id").alias(id_col),
        "n_bigrams",
        "score",
        (F.col("score") > 0).cast("int").alias("keep"),
    )


def speech_rate_screen(
    df: DataFrame,
    id_col: str = "clip_id",
    text_col: str = "transcript",
    dur_col: str = "dur_ms",
    min_cps_centi: int = 300,
    max_cps_centi: int = 3000,
) -> DataFrame:
    """Transcript/audio COHERENCE screen: characters-per-second outside
    [min, max] marks a clip whose transcript cannot plausibly belong to
    its audio — the cross-modal QC rule ASR-data pipelines run after
    per-modality checks pass (a 2 s clip with a 400-char transcript is a
    mis-alignment or hallucinated transcript; a 30 s clip with 4 chars
    is music/silence mislabeled as speech). Human speech sits around
    10-18 chars/s for alphabetic languages; the defaults (3-30 cps)
    bracket that generously.

    Pure integer arithmetic end-to-end (the cross-engine determinism
    rule): cps_centi = n_chars * 100000 div dur_ms (chars/sec x 100,
    truncated — Spark `div` == DuckDB `//`), and the verdict compares
    cps_centi against integer bounds. Zero shuffles, zero Python — a
    row-local projection that fuses into whatever scan precedes it.

    Reference lineage: the paired length/quality coherence checks
    (run.py:318-341 MINLEN after trimming — a duration-vs-content rule)
    generalized across modalities.
    """
    n_chars = F.length(F.col(text_col)).cast("long")
    # the div is INSIDE the zero-guard CASE: ANSI mode raises on a plain
    # div-by-zero even for rows the verdict would discard anyway
    cps_centi = F.expr(
        f"CASE WHEN {dur_col} > 0"
        f" THEN (length({text_col}) * 100000L) div {dur_col} END"
    )
    keep = (
        (F.col(dur_col) > 0)
        & (cps_centi >= F.lit(int(min_cps_centi)))
        & (cps_centi <= F.lit(int(max_cps_centi)))
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        F.col(dur_col).cast("long").alias("dur_ms"),
        cps_centi.alias("cps_centi"),
        F.coalesce(keep, F.lit(False)).cast("int").alias("keep"),
    )


def pii_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-rule PII DETECTION report over the corpus: (rule_idx, tag,
    n_docs, n_hits) for every rules.SCRUB_PATTERNS entry — the
    observability table a scrub deployment watches (a sudden email-rule
    spike in one ingest source is an upstream leak alarm; the scrub
    itself, functions.text.scrub_col, stays a row-level transform).

    Counts are SEQUENTIAL exactly like the scrub: rule i is counted on
    text already scrubbed of rules < i, so a credit-card number consumed
    by the CCNUM rule is not double-counted by the PHONE rule — report
    numbers always reconcile with what scrub_col actually replaced.

    Scale shape: a row-local projection (size of regexp_extract_all per
    rule, JVM regex, zero Python) exploded to |rules| tagged rows, then
    one map-side-combinable aggregation to |rules| output rows.
    """
    from .. import rules
    from .partitioning import widen

    # r6: the sequential regex chain (|rules| extract_all + replace per
    # row) is the whole cost and runs on the scan's splits — widen the
    # degenerate single-split case; the explode+groupBy below partial-
    # aggregates, so this is the plan's only exchange at bench scale
    # (no-op at real scale).
    df = widen(df)
    cur = F.col(text_col)
    structs = []
    for i, (pat, tag) in enumerate(rules.SCRUB_PATTERNS):
        hits = F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        structs.append(
            F.struct(
                F.lit(i).cast("long").alias("rule_idx"),
                F.lit(tag).alias("tag"),
                hits.cast("long").alias("h"),
            )
        )
        cur = F.regexp_replace(cur, pat, tag)
    return (
        df.select(F.explode(F.array(*structs)).alias("r"))
        .select("r.*")
        .groupBy("rule_idx", "tag")
        .agg(
            F.sum((F.col("h") > 0).cast("long")).alias("n_docs"),
            F.sum("h").alias("n_hits"),
        )
    )


def lang_segments(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Code-switch segmentation: maximal runs of equal per-token language
    vote — the gaps-and-islands operator over token streams (sessionize
    is its time-gap sibling). A transcript that flips en->es->en mid-run
    is the mixed_lang defect class the QC perplexity rule drops at clip
    grain; this reports WHERE the switches are, the evidence a
    bilingual-corpus curator reads.

    Per-token vote: first stopword list containing the token (en before
    es — deterministic precedence), else 'und'. Islands by the classic
    boundary-flag running sum: boundary = vote IS DISTINCT FROM
    lag(vote), seg_idx = running sum of boundaries — both windows AND the
    closing groupBy key on (doc, seg) are doc_id-clustered, so the whole
    operator is ONE shuffle (HashPartitioning(doc_id) satisfies every
    downstream ClusteredDistribution refinement; plan-audit-enforced).

    Output: (doc_id, seg_idx 1-based, vote, start_pos, end_pos,
    n_tokens) with pos = 0-based token index.
    """
    from pyspark.sql import Window as W

    from .partitioning import widen

    toks = F.split(F.lower(F.trim(F.col(text_col))), "\\s+")
    # r6: widen BY doc_id — tokenize + posexplode + the vote chain run
    # 32-wide instead of on the single scan split, and because the
    # repartition hash-clusters on doc_id it SATISFIES the window's
    # ClusteredDistribution: still exactly one exchange end-to-end
    # (the audited invariant), just moved below the scan (no-op at scale).
    t = widen(df.select(F.col(id_col).alias("doc_id"), F.col(text_col)), "doc_id").select(
        "doc_id", F.posexplode(toks).alias("pos", "tok")
    ).where(F.col("tok") != "")
    vote = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        arr = F.array([F.lit(w) for w in STOPWORDS[lang]])
        vote = F.when(F.array_contains(arr, F.col("tok")), lang).otherwise(vote)
    v = t.select("doc_id", "pos", vote.alias("vote"))
    w = W.partitionBy("doc_id").orderBy("pos")
    boundary = (~F.lag("vote").over(w).eqNullSafe(F.col("vote"))).cast("int")
    s = v.select(
        "doc_id",
        "pos",
        "vote",
        F.sum(boundary)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("seg_idx"),
    )
    return s.groupBy("doc_id", "seg_idx", "vote").agg(
        F.min("pos").cast("long").alias("start_pos"),
        F.max("pos").cast("long").alias("end_pos"),
        F.count("*").cast("long").alias("n_tokens"),
    )


def pmi_collocations(
    df: DataFrame, text_col: str, min_count: int = 5, k: int = 50
) -> DataFrame:
    """Corpus-level collocation mining: top-k adjacent token bigrams by a
    pointwise-mutual-information-ordered INTEGER score.

    PMI = ln(p(ab) / (p(a) p(b))) is monotone in c_ab * N / (c_a * c_b),
    so the ranking never needs the transcendental: the emitted score is

        score_ppm = (c_ab * N * 10^6) div (c_a * c_b)

    — exact integer arithmetic on both engines (headroom: c_ab * N * 10^6
    must stay < 2^63, i.e. fine up to ~9e12 bigram-mass; for larger
    corpora drop the ppm scale or score per shard). Plan: one explode to
    unigram counts, one explode to bigram counts (both map-side
    combined), two token-keyed equi-joins to attach c_a / c_b, corpus
    total N folded in as a broadcast one-row frame (never a driver
    action), then TakeOrderedAndProject for the top-k. Nothing global,
    nothing Python.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), " ")
    from .partitioning import widen

    # r6: widen a degenerate single-split source before the two token
    # explodes (no-op at real scale)
    t = widen(df.select(toks.alias("toks")))
    uni = (
        t.select(F.explode("toks").alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    n_total = uni.agg(F.sum("c").cast("long").alias("n_total"))
    big = t.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("toks"), 1, F.size("toks") - 1).alias("a"),
                F.slice(F.col("toks"), 2, F.size("toks") - 1).alias("b"),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("w1"), F.col("p.b").alias("w2"))
    cb = (
        big.where((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c_ab"))
        .where(F.col("c_ab") >= min_count)
    )
    ca = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c_a"))
    cbk = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c_b"))
    scored = (
        cb.join(ca, "w1")
        .join(cbk, "w2")
        .crossJoin(F.broadcast(n_total))
        .select(
            "w1",
            "w2",
            "c_ab",
            "c_a",
            "c_b",
            F.expr("(c_ab * n_total * 1000000) div (c_a * c_b)")
            .cast("long")
            .alias("score_ppm"),
        )
    )
    return scored.orderBy(
        F.col("score_ppm").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(k)


def distinctive_terms(
    df: DataFrame,
    text_col: str,
    group_col: str,
    min_count: int = 5,
    k: int = 10,
) -> DataFrame:
    """Contrastive per-group keywords: the top-k tokens each group uses
    disproportionately vs the REST of the corpus — the corpus-diff half
    of a corpus card (which source contributed the legalese, which one
    the code comments). The Dunning log-likelihood ranking is replaced by
    an INTEGER lift (the pmi_collocations ln-free rule):

        in_permille   = 1000 * c(g,t)            div c(g)
        rest_permille = 1000 * (c(t) - c(g,t))   div max(N - c(g), 1)
        lift_permille = 1000 * in_permille       div max(rest_permille, 1)

    kept when c(g,t) >= min_count AND in_permille > rest_permille; ranked
    per group by (lift desc, count desc, token) — fully deterministic.

    Plan shape: docs pay ONE explode + map-side-combined (group, token)
    count; that frame is persist_tracked (vocab x groups rows — corpus-
    independent-ish) and re-aggregated for group totals (broadcast:
    #groups rows), token totals (vocab-keyed equi-join), and the corpus
    total (broadcast 1-row frame, never a driver action). The only
    window is keyed by group (no global windows rule). At 100 TB the
    corpus is scanned once; everything downstream is vocabulary-sized.
    """
    from pyspark.sql import Window

    from .caching import persist_tracked

    toks = F.split(F.lower(F.trim(F.col(text_col))), " ")
    from .partitioning import widen

    # r6: widen a degenerate single-split source before the token explode
    st = persist_tracked(
        widen(df.select(F.col(group_col).alias("grp"), toks.alias("__t")))
        .select("grp", F.explode("__t").alias("token"))
        .where(F.col("token") != "")
        .groupBy("grp", "token")
        .agg(F.count("*").cast("long").alias("n_in"))
    )
    grp_tot = st.groupBy("grp").agg(F.sum("n_in").cast("long").alias("n_grp"))
    tok_tot = st.groupBy("token").agg(F.sum("n_in").cast("long").alias("n_tok"))
    n_total = st.agg(F.sum("n_in").cast("long").alias("n_total"))
    scored = (
        st.where(F.col("n_in") >= min_count)
        .join(F.broadcast(grp_tot), "grp")
        .join(tok_tot, "token")
        .crossJoin(F.broadcast(n_total))
        .select(
            "grp",
            "token",
            "n_in",
            F.expr("(1000 * n_in) div n_grp").alias("in_permille"),
            F.expr(
                "(1000 * (n_tok - n_in)) div greatest(n_total - n_grp, 1)"
            ).alias("rest_permille"),
        )
        .where(F.col("in_permille") > F.col("rest_permille"))
        .withColumn(
            "lift_permille",
            F.expr("(1000 * in_permille) div greatest(rest_permille, 1)"),
        )
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("lift_permille").desc(), F.col("n_in").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            F.col("grp").alias(group_col),
            "token",
            "n_in",
            "in_permille",
            "rest_permille",
            "lift_permille",
            "rk",
        )
    )


def token_diversity(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document lexical-diversity screen: type/token ratio, Simpson
    repeat-rate, hapax share — the diversity axis of quality filtering
    (template/boilerplate docs score near-zero TTR and high Simpson long
    before repetition_screen's fixed n-gram rules fire). All integer:

        ttr_permille   = 1000 * n_types div n_tokens
        simpson_ppm    = 10^6 * sum(c_t * (c_t - 1)) div (n * (n - 1))
                         (the unbiased repeat-rate; null when n < 2)
        hapax_permille = 1000 * |{t : c_t = 1}| div n_types

    Scale shape: ZERO shuffles — per-token counts are computed row-
    locally with JVM higher-order functions (transform over the distinct
    tokens, filter-count against the row's own array), so the operator is
    embarrassingly parallel and lives entirely inside WholeStageCodegen's
    Arrow-free JVM path. Row cost is O(types * tokens) — bounded by doc
    length, the explode-free trade that wins until documents reach
    pathological length (then the explode+reagg form of the ORACLE is the
    fallback; both are implemented, the oracle proves them equal)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), " "), lambda x: x != ""
    )
    types = F.array_distinct(toks)
    counts = F.transform(
        types, lambda t: F.size(F.filter(toks, lambda x: x == t)).cast("long")
    )
    n = F.size(toks).cast("long")
    n_types = F.size(types).cast("long")
    s = F.aggregate(
        counts, F.lit(0).cast("long"), lambda acc, c: acc + c * (c - 1)
    )
    hapax = F.size(F.filter(counts, lambda c: c == 1)).cast("long")
    base = df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        n_types.alias("n_types"),
        s.alias("__s"),
        hapax.alias("__hapax"),
    )
    return base.select(
        id_col,
        "n_tokens",
        "n_types",
        F.when(
            F.col("n_tokens") > 0, F.expr("1000 * n_types div n_tokens")
        ).alias("ttr_permille"),
        F.when(
            F.col("n_tokens") >= 2,
            F.expr("1000000 * __s div (n_tokens * (n_tokens - 1))"),
        ).alias("simpson_ppm"),
        F.when(
            F.col("n_types") > 0, F.expr("1000 * __hapax div n_types")
        ).alias("hapax_permille"),
    )


def source_dup_stats(
    df: DataFrame, text_col: str, group_col: str
) -> DataFrame:
    """Per-source duplication card: how much of each source is internal
    copies, and how much of it also appears verbatim in OTHER sources —
    the first two numbers a corpus curator asks for per provider.

        dup_permille    = 1000 * (n_docs - n_texts) div n_docs
        shared_permille = 1000 * n_shared_docs     div n_docs

    Scale shape: docs pay one map-side-combined (source, md5) count;
    everything after is text-hash-keyed over the distinct-hash frame —
    per-hash source spans (bounded by #sources), one equi-join back, one
    small re-agg. No doc text ever reshuffles (the dedup_exact rule)."""
    h = F.md5(F.col(text_col))
    d1 = (
        df.select(F.col(group_col).alias("grp"), h.alias("h"))
        .groupBy("grp", "h")
        .agg(F.count("*").cast("long").alias("n"))
    )
    spans = d1.groupBy("h").agg(
        F.count("*").cast("long").alias("n_src")
    )
    per = d1.join(spans, "h").groupBy("grp").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_texts"),
        F.sum(F.when(F.col("n_src") > 1, F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_shared_docs"),
    )
    return per.select(
        F.col("grp").alias(group_col),
        "n_docs",
        "n_texts",
        F.expr("1000 * (n_docs - n_texts) div n_docs").alias("dup_permille"),
        "n_shared_docs",
        F.expr("1000 * n_shared_docs div n_docs").alias("shared_permille"),
    )


def source_concentration(
    df: DataFrame, group_col: str, source_col: str
) -> DataFrame:
    """Per-group provider-concentration card: the Herfindahl index over
    source shares plus the dominant provider — the diversification
    number next to source_dup_stats on a curator's dashboard (a corpus
    where one provider is 900 permille of a language is one takedown
    away from losing that language).

        hhi_ppm            = 10^6 * sum(n_i^2) div N^2   (10^6 = monoculture,
                             10^6/k = k equal sources)
        top_share_permille = 1000 * max(n_i) div N

    Ties on the top source break to the lexicographically smallest
    source (min over (-n, source) tuples — no window at all).

    Scale shape: one map-side-combinable (group, source) count, then one
    group-keyed re-agg over the bounded per-group source list; sum(n^2)
    stays in int64 for any group under ~3e9 docs (beyond that, compute
    shares first — noted, not needed at this corpus's group sizes)."""
    c = df.groupBy(group_col, source_col).agg(
        F.count("*").cast("long").alias("n")
    )
    t = c.groupBy(group_col).agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_sources"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("__ss"),
        F.min(
            F.struct(
                (-F.col("n")).alias("negn"), F.col(source_col).alias("src")
            )
        ).alias("__top"),
    )
    return t.select(
        group_col,
        "n_docs",
        "n_sources",
        F.expr("1000000 * __ss div (n_docs * n_docs)").alias("hhi_ppm"),
        F.col("__top.src").alias("top_source"),
        F.expr("1000 * (-__top.negn) div n_docs").alias("top_share_permille"),
    )


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int | None = None,
    max_words: int | None = None,
    min_stopwords: int | None = None,
) -> DataFrame:
    """Gopher/MassiveText document-quality gate (Rae et al. 2021, A1.1) —
    the rule family that, alongside repetition_screen, decided what
    entered MassiveText: word-count bounds, mean-word-length bounds,
    symbol-to-word ratio ('#' and '...'), alphabetic-word fraction, the
    2-of-8-stopwords requirement, and the bullet-/ellipsis-line caps.
    Reference analog: the read-level quality gates (MINLEN + alphabet
    predicate, /root/reference/kneaddata/run.py + config.py) promoted to
    document grain with the published thresholds.

    Every metric is an exact integer and every flag an integer comparison
    (rules.py constants; see the note there), so the verdicts are
    engine-portable with no float boundary. Word metrics are computed on
    whitespace-NORMALIZED text (the winnowing tokenization), line metrics
    on the RAW text's '\\n' split. Emits one row per document with the
    raw counters, the seven per-rule flags, and keep = AND of all —
    a curator reads which rule fired, not just the verdict.

    Scale shape: pure per-row Column algebra (split / filter / aggregate
    higher-order functions) — zero Python, zero shuffles, one codegen
    stage; survives any corpus size that scans."""
    from .. import rules

    lo_w = rules.GOPHER_MIN_WORDS if min_words is None else min_words
    hi_w = rules.GOPHER_MAX_WORDS if max_words is None else max_words
    min_stop = (
        rules.GOPHER_MIN_STOPWORDS if min_stopwords is None else min_stopwords
    )
    t = F.col(text_col)
    toks = F.split(F.regexp_replace(F.trim(t), r"\s+", " "), " ")
    lines = F.split(t, "\n")
    n_words = F.size(toks).cast("long")
    word_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda s, x: s + F.length(x)
    )
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))).cast("long")
    stop_arr = F.array([F.lit(w) for w in rules.GOPHER_STOPWORDS])
    n_stop = F.size(
        F.array_intersect(F.array_distinct(F.transform(toks, F.lower)), stop_arr)
    ).cast("long")
    n_hash = (F.length(t) - F.length(F.regexp_replace(t, "#", ""))).cast("long")
    n_ell = F.expr(
        f"(length({text_col}) - length(replace({text_col}, '...', ''))) div 3"
    ).cast("long")
    n_sym = (n_hash + n_ell).alias("n_sym")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: (F.ltrim(l).substr(1, 2) == "- ")
            | (F.ltrim(l).substr(1, 2) == "* "),
        )
    ).cast("long")
    n_ell_lines = F.size(
        F.filter(lines, lambda l: l.substr(F.lit(-3), F.lit(3)) == "...")
    ).cast("long")

    base = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        word_chars.alias("word_chars"),
        n_alpha.alias("n_alpha_words"),
        n_stop.alias("n_stop"),
        n_sym,
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet_lines"),
        n_ell_lines.alias("n_ellipsis_lines"),
    )
    w = F.col("n_words")
    flag = lambda c: F.when(c, 1).otherwise(0).cast("long")  # noqa: E731
    flags = base.select(
        "*",
        flag((w >= lo_w) & (w <= hi_w)).alias("wc_ok"),
        flag(
            (F.col("word_chars") >= rules.GOPHER_MIN_MEAN_WORD_LEN * w)
            & (F.col("word_chars") <= rules.GOPHER_MAX_MEAN_WORD_LEN * w)
        ).alias("mwl_ok"),
        flag(
            10 * F.col("n_sym") <= rules.GOPHER_SYMBOL_MAX_PER_10_WORDS * w
        ).alias("sym_ok"),
        flag(
            100 * F.col("n_alpha_words") >= rules.GOPHER_MIN_ALPHA_WORD_PCT * w
        ).alias("alpha_ok"),
        flag(F.col("n_stop") >= min_stop).alias("stop_ok"),
        flag(
            100 * F.col("n_bullet_lines")
            <= rules.GOPHER_MAX_BULLET_LINE_PCT * F.col("n_lines")
        ).alias("bullet_ok"),
        flag(
            100 * F.col("n_ellipsis_lines")
            <= rules.GOPHER_MAX_ELLIPSIS_LINE_PCT * F.col("n_lines")
        ).alias("ellipsis_ok"),
    )
    keep = (
        F.col("wc_ok")
        * F.col("mwl_ok")
        * F.col("sym_ok")
        * F.col("alpha_ok")
        * F.col("stop_ok")
        * F.col("bullet_ok")
        * F.col("ellipsis_ok")
    )
    return flags.select("*", keep.cast("long").alias("keep"))


def c4_line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_line_words: int = 3,
    min_kept_lines: int = 5,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2019, §2.2): keep only
    lines that end in a terminal punctuation mark ('.', '!', '?', '"'),
    have >= min_line_words words, and don't mention 'javascript'; drop
    whole pages that retain < min_kept_lines lines, contain 'lorem ipsum',
    or contain '{'. Reference analog: the trim stages cut bad SPANS and
    the empty-read gate then drops hollow reads (run.py trim + MINLEN) —
    here the span is a line and the hollow-page rule is C4's.

    Emits (id, n_lines, n_kept, has_lorem, has_brace, page_keep,
    clean_text): the kept lines re-joined in original order, plus integer
    accounting a curator can aggregate into retention cards. page_keep is
    an integer flag — downstream filters on it; emitting dropped pages
    with their reason beats silently deleting them.

    Scale shape: per-row Column algebra only (split / filter / array_join
    higher-order functions) — zero Python, zero shuffles, one codegen
    stage. Line verdicts are string/integer comparisons, engine-portable
    by construction."""
    t = F.col(text_col)
    lines = F.split(t, "\n")

    def _ok(l):
        rt = F.rtrim(l)
        punct = F.substring(rt, -1, 1).isin(".", "!", "?", '"')
        words = F.size(F.split(F.regexp_replace(F.trim(l), r"\s+", " "), " "))
        return punct & (words >= min_line_words) & ~F.lower(l).contains("javascript")

    kept = F.filter(lines, _ok)
    has_lorem = F.lower(t).like("%lorem ipsum%")
    has_brace = t.like("%{%")
    n_kept = F.size(kept).cast("long")
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.alias("n_kept"),
        F.when(has_lorem, 1).otherwise(0).cast("long").alias("has_lorem"),
        F.when(has_brace, 1).otherwise(0).cast("long").alias("has_brace"),
        F.when(
            (n_kept >= min_kept_lines) & ~has_lorem & ~has_brace, 1
        ).otherwise(0).cast("long").alias("page_keep"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def transcript_cer(
    df: DataFrame,
    id_col: str,
    ref_col: str,
    hyp_col: str,
) -> DataFrame:
    """Character error rate between two transcript columns — the ASR-eval
    primitive (and the transcript-drift monitor between pipeline
    versions): Levenshtein distance over CCNet-normalized text
    (functions/text.normalize_col — case/punctuation/spacing variants
    score 0, exactly as WER tooling normalizes before scoring), reported
    as exact-integer cer_permille = 1000 * dist div ref_chars.

    Levenshtein is a JVM built-in on both engines (unit-cost
    insert/delete/substitute), so the distances agree exactly and the
    whole operator is one codegen stage — zero Python, zero shuffles.
    O(len^2) per row: fine for transcript-length strings; chunk or band
    documents first if scoring book-length pairs."""
    from ..functions.text import normalize_col

    rn = normalize_col(F.col(ref_col))
    hn = normalize_col(F.col(hyp_col))
    base = df.select(
        F.col(id_col),
        F.length(rn).cast("long").alias("n_ref_chars"),
        F.length(hn).cast("long").alias("n_hyp_chars"),
        F.levenshtein(rn, hn).cast("long").alias("dist"),
    )
    return base.select(
        "*",
        F.when(F.col("n_ref_chars") > 0, F.expr("(dist * 1000) div n_ref_chars"))
        .cast("long")
        .alias("cer_permille"),
        F.when(F.col("dist") == 0, 1).otherwise(0).cast("long").alias("exact"),
    )


def transcript_wer(
    df: DataFrame,
    id_col: str,
    ref_col: str,
    hyp_col: str,
    max_vocab: int = 94,
) -> DataFrame:
    """Word error rate — THE ASR metric: word-level Levenshtein distance
    over CCNet-normalized transcripts, exact on both engines via the
    classic vocab-to-char reduction: the pair's distinct words (first-
    occurrence order, ref side first) map to single ASCII characters
    (chr(33)..chr(126)) and the native character levenshtein over the
    mapped strings IS the word-level distance. ASCII-only mapping
    matters: DuckDB's levenshtein counts BYTES, Spark's counts CHARS —
    they agree exactly on single-byte code points, so the fence is
    max_vocab = 94 distinct words per PAIR (generous for utterance
    transcripts; wer_status='vocab_overflow' reports the rows beyond it
    rather than mis-scoring them — at document scale run a Pandas-UDF DP
    instead).

    Emits (id, n_ref_words, n_hyp_words, n_vocab, dist, wer_permille,
    wer_status in {ok, empty_ref, vocab_overflow}); integer permille.
    Per-row higher-order functions only — zero Python, zero shuffles."""
    from ..functions.text import normalize_col

    rn = normalize_col(F.col(ref_col))
    hn = normalize_col(F.col(hyp_col))
    toks = lambda c: F.when(F.length(c) > 0, F.split(c, " ")).otherwise(  # noqa: E731
        F.expr("CAST(array() AS array<string>)")
    )
    b = df.select(
        F.col(id_col), toks(rn).alias("__rt"), toks(hn).alias("__ht")
    ).withColumn("__v", F.array_distinct(F.concat(F.col("__rt"), F.col("__ht"))))
    mapped = b.select(
        id_col,
        F.size("__rt").cast("long").alias("n_ref_words"),
        F.size("__ht").cast("long").alias("n_hyp_words"),
        F.size("__v").cast("long").alias("n_vocab"),
        F.expr(
            "array_join(transform(__rt, t -> char(32 + array_position(__v, t))), '')"
        ).alias("__rm"),
        F.expr(
            "array_join(transform(__ht, t -> char(32 + array_position(__v, t))), '')"
        ).alias("__hm"),
    )
    dist = F.when(
        F.col("n_vocab") <= max_vocab, F.levenshtein(F.col("__rm"), F.col("__hm"))
    ).cast("long")
    scored = mapped.select(
        id_col, "n_ref_words", "n_hyp_words", "n_vocab", dist.alias("dist")
    )
    status = (
        F.when(F.col("n_vocab") > max_vocab, "vocab_overflow")
        .when(F.col("n_ref_words") == 0, "empty_ref")
        .otherwise("ok")
    )
    return scored.select(
        "*",
        F.when(
            (F.col("n_ref_words") > 0) & F.col("dist").isNotNull(),
            F.expr("(dist * 1000) div n_ref_words"),
        )
        .cast("long")
        .alias("wer_permille"),
        status.alias("wer_status"),
    )


def boilerplate_screen(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    n_words: int = 3,
    min_permille: int = 150,
) -> DataFrame:
    """Per-source template detection (the CCNet/RefinedWeb "most common
    line in the shard" rule at source granularity): a document's opening
    n-word prefix that opens >= min_permille/1000 of its SOURCE's docs is
    boilerplate (subscribe banners, cookie walls, forum headers), and
    every doc carrying it is flagged. Differs from c4_line_filter (fixed
    global per-line rules): the template is LEARNED per source from the
    corpus itself. Reference analog: overrepresented-sequence harvest ->
    targeted trim (SURVEY F5 two-phase shape), applied to doc openings.

    Shape at 100 TB: two map-side-combinable aggs (docs-per-source,
    prefix document-frequency) and a broadcast join-back of the HOT
    prefix list (above-threshold templates are few by definition — the
    same two-phase df-guard shape as dedup's shingle hot-list); document
    text itself never shuffles. Integer permille (df*1000 div n_docs)
    for cross-engine equality. The n_docs broadcast assumes source
    granularity (provider/crawl: thousands of rows); running at DOMAIN
    granularity (~1e8 keys) drop that one hint and let the
    post-aggregation (source, prefix) -> source join shuffle — both
    sides are already reduced, so the shuffle is count-table-sized, not
    corpus-sized."""
    pat = "^(" + r"\S+" + (r" \S+" * (n_words - 1)) + ")"
    base = df.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        F.regexp_extract(F.col(text_col), pat, 1).alias("prefix"),
    )
    n_docs = base.groupBy("source").agg(F.count("*").alias("n_docs"))
    dfreq = (
        base.where(F.col("prefix") != "")
        .groupBy("source", "prefix")
        .agg(F.count("*").alias("df"))
    )
    hot = (
        dfreq.join(F.broadcast(n_docs), "source")
        .withColumn("df_permille", F.expr("(df * 1000) div n_docs").cast("long"))
        .where(F.col("df_permille") >= min_permille)
        .select("source", "prefix", "df_permille")
    )
    return base.join(F.broadcast(hot), ["source", "prefix"]).select(
        F.col(id_col), "source", "prefix", "df_permille"
    )


def readability_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade (Kincaid et al. 1975) as
    EXACT integer milli scores — the classic prose-complexity gate a
    curation pipeline uses to stratify training text (too-simple
    boilerplate vs unreadable scrape junk), complementing gopher_rules'
    structural checks. Syllables = non-overlapping [aeiouy]+ groups (the
    standard heuristic); sentences = terminal-punct runs, floored at 1 so
    unpunctuated scrape text scores instead of dividing by zero.

    All arithmetic is integer: 1.015*(W/S) in milli == (1015*W) div S on
    non-negative operands, where Spark div and DuckDB // agree — the
    hot_keys/permille portability rule. Pure per-row Column algebra: zero
    Python, zero shuffles, one codegen stage at any corpus size.
    fre_milli = 206835 - (1015*W*1000) div (S*1000)-style terms; verdict
    buckets on the standard 90/70/50/30 thresholds."""
    t = F.col(text_col)
    n_words = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+"))
    )
    n_syll = F.size(F.expr(f"regexp_extract_all(lower({text_col}), '[aeiouy]+', 0)"))
    n_sent = F.greatest(
        F.lit(1),
        F.size(F.expr(f"regexp_extract_all({text_col}, '[.!?]+', 0)")),
    )
    base = df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        n_syll.cast("long").alias("n_syllables"),
    )
    wps = F.expr("(1015 * n_words) div n_sentences")
    spw = F.expr("(84600 * n_syllables) div n_words")
    fre = (F.lit(206835) - wps - spw).cast("long")
    fkg = (
        F.expr("(390 * n_words) div n_sentences")
        + F.expr("(11800 * n_syllables) div n_words")
        - F.lit(15590)
    ).cast("long")
    verdict = (
        F.when(F.col("n_words") == 0, "empty")
        .when(fre >= 90000, "very_easy")
        .when(fre >= 70000, "easy")
        .when(fre >= 50000, "medium")
        .when(fre >= 30000, "difficult")
        .otherwise("very_difficult")
    )
    return base.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(F.col("n_words") > 0, fre).alias("fre_milli"),
        F.when(F.col("n_words") > 0, fkg).alias("fkg_milli"),
        verdict.alias("readability"),
    )


# (script, java regex class, RE2 class) — Java spells Unicode scripts
# \p{IsX}, RE2 spells them \p{X}; membership agrees on the common planes.
# Priority order doubles as the deterministic dominant-script tiebreak.
SCRIPTS = (
    ("latin", r"[A-Za-z]", "[A-Za-z]"),
    ("cyrillic", r"\p{IsCyrillic}", r"\p{Cyrillic}"),
    ("han", r"\p{IsHan}", r"\p{Han}"),
    ("arabic", r"\p{IsArabic}", r"\p{Arabic}"),
    ("greek", r"\p{IsGreek}", r"\p{Greek}"),
)


def script_mix(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Unicode-script histogram per document + dominant-script verdict —
    the multilingual curation signal langid's stopword votes can't give
    (stopword lists only cover spaced Latin-alphabet languages; script
    counts catch CJK/Cyrillic/Arabic content, mixed-script spam and
    mislabeled lang columns). Counts are code points matched by the
    script class (length minus length-after-strip — one regexp_replace
    per script, all JVM codegen, zero Python, zero shuffles).

    dominant = the highest-count script, ties broken by the fixed
    SCRIPTS priority order (identical CASE chain in the oracle); 'none'
    when no script matches. dominant_permille is over n_chars (total
    code points incl. spaces/digits), exact integer."""
    t = F.col(text_col)
    counts = {
        name: (F.length(t) - F.length(F.regexp_replace(t, java_re, "")))
        .cast("long")
        .alias(name)
        for name, java_re, _ in SCRIPTS
    }
    base = df.select(F.col(id_col), F.length(t).cast("long").alias("n_chars"), *counts.values())
    g = F.greatest(*[F.col(n) for n, _, _ in SCRIPTS])
    dom = F.when(g == 0, F.lit("none"))
    for name, _, _ in SCRIPTS:
        dom = dom.when(F.col(name) == g, F.lit(name))
    return base.select(
        id_col,
        "n_chars",
        *[n for n, _, _ in SCRIPTS],
        dom.alias("dominant"),
        F.when(
            (g > 0) & (F.col("n_chars") > 0),
            F.expr(
                "(greatest("
                + ", ".join(n for n, _, _ in SCRIPTS)
                + ") * 1000) div n_chars"
            ),
        )
        .cast("long")
        .alias("dominant_permille"),
    )


def text_gate(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The fused one-pass text-quality gate — the documents-table analog
    of the audio QC verdict (pipeline.py first-failing-rule when-chain)
    and of the fused audio screen: ONE projection computes the structural
    (Gopher A1.1), script, stopword and readability evidence and emits
    the FIRST failing rule, so a curator reads one verdict column instead
    of joining four screens (and the corpus is scanned once, not four
    times). Thresholds come from rules.py (single source of truth).

    Rule order (first failing wins): empty -> too_short -> word_len ->
    symbol -> non_latin -> stopword -> unreadable -> ok. All evidence is
    exact integers (word chars vs 3x/10x word count, 10x symbol count vs
    words, script code-point counts, DISTINCT stopword hits, integer
    milli Flesch with the sentence floor) — the cross-engine equality
    contract of every gate here. Zero Python, zero shuffles, one codegen
    stage at any corpus size."""
    from .. import rules as _rules

    t = F.col(text_col)
    toks = F.split(F.regexp_replace(F.trim(t), r"\s+", " "), " ")
    n_words = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(toks))
    word_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda s, x: s + F.length(x)
    )
    n_sym = (
        (F.length(t) - F.length(F.regexp_replace(t, "#", "")))
        + (F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))) / 3
    ).cast("long")
    sw = F.array(*[F.lit(w) for w in _rules.GOPHER_STOPWORDS])
    n_stop = F.size(
        F.array_intersect(F.transform(toks, lambda x: F.lower(x)), sw)
    )
    latin = F.length(t) - F.length(F.regexp_replace(t, "[A-Za-z]", ""))
    non_latin = F.greatest(
        *[
            F.length(t) - F.length(F.regexp_replace(t, java_re, ""))
            for name, java_re, _ in SCRIPTS
            if name != "latin"
        ]
    )
    n_syll = F.size(F.expr(f"regexp_extract_all(lower({text_col}), '[aeiouy]+', 0)"))
    n_sent = F.greatest(
        F.lit(1), F.size(F.expr(f"regexp_extract_all({text_col}, '[.!?]+', 0)"))
    )
    base = df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        word_chars.alias("word_chars"),
        n_sym.alias("n_sym"),
        latin.cast("long").alias("latin"),
        non_latin.cast("long").alias("non_latin"),
        n_stop.cast("long").alias("n_stop"),
        n_syll.cast("long").alias("n_syll"),
        n_sent.cast("long").alias("n_sent"),
    )
    fre = (
        F.lit(206835)
        - F.expr("(1015 * n_words) div n_sent")
        - F.expr("(84600 * n_syll) div n_words")
    ).cast("long")
    verdict = (
        F.when(F.col("n_words") == 0, "empty")
        .when(F.col("n_words") < _rules.GOPHER_MIN_WORDS, "too_short")
        .when(
            (F.col("word_chars") < _rules.GOPHER_MIN_MEAN_WORD_LEN * F.col("n_words"))
            | (F.col("word_chars") > _rules.GOPHER_MAX_MEAN_WORD_LEN * F.col("n_words")),
            "word_len",
        )
        .when(10 * F.col("n_sym") > F.col("n_words"), "symbol")
        .when(F.col("non_latin") > F.col("latin"), "non_latin")
        .when(F.col("n_stop") < _rules.GOPHER_MIN_STOPWORDS, "stopword")
        .when(fre < 0, "unreadable")
        .otherwise("ok")
    )
    return base.select(
        id_col,
        "n_words",
        "word_chars",
        "n_sym",
        "latin",
        "non_latin",
        "n_stop",
        F.when(F.col("n_words") > 0, fre).alias("fre_milli"),
        verdict.alias("verdict"),
    )
