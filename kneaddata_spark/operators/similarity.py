"""Similarity search over an embedding column (array<float>).

Operators return FULL-PRECISION cos; callers round once at the edge.
Rounding twice (round(round(x, 6), 4)) is a double-rounding trap: the
6-digit intermediate lands exactly on the decimal grid, so the second
round can HALF_UP across a boundary the raw double was below — found as a
cross-engine oracle mismatch at sf0.001.

Baseline: brute-force cosine top-k — broadcast the (small) query set,
JVM-side dot products via zip_with/aggregate, per-query top-k window.
Scale path: sign-LSH bucketing (deterministic hyperplanes) so each query
probes one bucket; candidates verified with exact cosine. The bucketing is
a Pandas-UDF matmul (one BLAS call per Arrow batch — the vectorized slow
path, never per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: str, b: str) -> F.Column:
    # cast BEFORE multiplying: float32 products then double-summed would
    # diverge from a pure-double oracle at the rounding boundary
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"0D, (s, v) -> s + v)"
    )


def _norm(c: str) -> F.Column:
    return F.sqrt(
        F.expr(f"aggregate({c}, 0D, (s, v) -> s + cast(v as double) * cast(v as double))")
    )


def _with_norm(
    df: DataFrame, id_col: str, vec_col: str, id_alias: str, vec_alias: str, n_alias: str
) -> DataFrame:
    """(id, raw vec, norm) — norm computed once per row. cos is then
    dot(a, b) / (|a| * |b|) over RAW vectors: the same float-op order as
    the DuckDB oracle's list_dot_product formulation. (Pre-normalizing the
    vectors is mathematically equal but divides before summing — a
    last-ulp difference that flips round(cos, 4) at a rounding boundary;
    observed at sf0.001.)"""
    from .partitioning import widen

    # r6: vector scoring runs through interpreted higher-order lambdas
    # (dot/fold per element) — widen a degenerate single-split source so
    # the corpus side streams sweep-wide (no-op at real scale; a tiny
    # query frame widening is harmless)
    return widen(df, id_col).select(
        F.col(id_col).alias(id_alias), F.col(vec_col).alias(vec_alias)
    ).withColumn(n_alias, _norm(vec_alias))


# ------------------------------------------------ sampled codebook fits --

# Codebook/centroid fits run on a bounded seeded SAMPLE, never the full
# corpus (VERDICT r4 #4; the faiss train/encode split): 100k rows x 64
# dims x 8 B = ~50 MB of driver memory regardless of corpus size, while
# ENCODING stays full-corpus and distributed. The collect here is the
# bounded-model exemption (same class as the langid/perplexity trainers),
# not a corpus pull.
FIT_SAMPLE_CAP = 100_000


def _collect_fit_sample(
    df: DataFrame, vec_col: str, cap: int, seed: int
) -> np.ndarray:
    """<= ~cap vectors as an (n, dim) float64 array, seeded Bernoulli
    sample when the frame is larger than cap (deterministic for a fixed
    input layout; the ANN oracles are codebook-independent by design, so
    layout-sensitivity of the sample cannot flip a result)."""
    # r6: one evaluation in the common under-cap case — limit(cap+1)
    # returns EVERY row (in the same partition-major order a bare
    # collect() yields) when the frame fits, so the separate count()
    # pass (a second full evaluation of the upstream plan) only runs
    # when the corpus is actually larger than the cap.
    # r6 session 3: toPandas instead of collect — the Arrow transfer
    # path (guide §6), measured ~2x faster for the 20k x 64 sample and
    # bit-equal (same rows, same order, exact float round-trip).
    pdf = df.select(vec_col).limit(cap + 1).toPandas()
    probe = pdf[pdf.columns[0]]
    if len(probe) <= cap:
        return np.asarray([np.asarray(v, dtype=np.float64) for v in probe])
    n = df.count()
    rows = df.sample(False, cap / n, seed).select(vec_col).toPandas()
    return np.asarray(
        [np.asarray(v, dtype=np.float64) for v in rows[rows.columns[0]]]
    )


def _np_kmeans(
    X: np.ndarray, k: int, seed: int, max_iter: int, n_init: int = 4
) -> np.ndarray:
    """Deterministic in-driver Lloyd k-means over the (bounded) fit
    sample: n_init k-means++ restarts (seeds seed..seed+n_init-1), each
    Lloyd-iterated to max_iter or convergence, keep the lowest-inertia
    run. Replaces pyspark.ml KMeans for the ANN coarse quantizers: a
    COARSE quantizer needs centroid-quality, not a converged distributed
    fit, and the ML fit costs ~2 jobs per iteration per codebook — the
    dominant wall of ann_ivf/ann_pq at every scale. In-driver restarts
    are nearly free at sample scale (<= cap x dim floats), and the
    multi-restart closes the init-quality gap to k-means|| (measured in
    ANN_RECALL.json). Returns a (k, dim) float64 centroid matrix."""
    n = X.shape[0]
    if n == 0:
        raise ValueError("empty fit sample")
    best_C, best_inertia = None, np.inf
    for trial in range(n_init):
        rng = np.random.RandomState(seed + trial)
        # k-means++ seeding (deterministic given seed)
        centers = [X[rng.randint(n)]]
        d2 = ((X - centers[0]) ** 2).sum(axis=1)
        while len(centers) < k:
            tot = float(d2.sum())
            if tot <= 0.0:  # all points coincide with a center already
                centers.append(X[rng.randint(n)])
            else:
                idx = int(np.searchsorted(np.cumsum(d2), rng.rand() * tot))
                centers.append(X[min(idx, n - 1)])
            d2 = np.minimum(d2, ((X - centers[-1]) ** 2).sum(axis=1))
        C = np.asarray(centers, dtype=np.float64)
        for _ in range(max_iter):
            d = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
            assign = d.argmin(axis=1)
            # r6: when dim <= k (the PQ subspace case: dim 8, k 16),
            # per-dimension bincount sums replace the k-way masked
            # fancy-index mean loop (k full passes over X per iteration
            # -> dim C-loop passes; the PQ fit was 4.5 s of the sf1.0
            # query wall). Summation order changes (sequential vs numpy
            # pairwise) — codebooks may drift by ulps, which the ANN
            # contracts absorb by design: oracles are planted-dup
            # codebook-INDEPENDENT and the recall gate has wide margin.
            # When dim > k (IVF: dim 64, k 16 lists) the masked loop is
            # the cheaper direction and keeps its exact arithmetic.
            newC = C.copy()
            if X.shape[1] <= k:
                counts = np.bincount(assign, minlength=k).astype(np.float64)
                sums = np.empty_like(C)
                for dim_i in range(X.shape[1]):
                    sums[:, dim_i] = np.bincount(
                        assign, weights=X[:, dim_i], minlength=k
                    )
                nz = counts > 0
                newC[nz] = sums[nz] / counts[nz, None]
            else:
                for j in range(k):
                    mask = assign == j
                    if mask.any():
                        newC[j] = X[mask].mean(axis=0)
            if np.allclose(newC, C):
                break
            C = newC
        d = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        inertia = float(d.min(axis=1).sum())  # + const ||x||^2: same argmin
        if inertia < best_inertia:
            best_C, best_inertia = C, inertia
    return best_C


def _np_kmeans_pq(
    blocks: np.ndarray, k: int, seed: int, max_iter: int, n_init: int = 4
) -> np.ndarray:
    """Batched PQ codebook fit (r6): all m_subspaces x n_init Lloyd runs
    advance TOGETHER through vectorized batched ops instead of m x n_init
    sequential _np_kmeans calls. The per-call shape (k-means++ seeding
    sequence per (subspace, trial) with RandomState(seed + s + trial),
    bincount centroid updates, allclose convergence that KEEPS the
    pre-update centers, lowest-inertia trial with first-trial tie-break)
    is replicated problem-by-problem — only the arithmetic is batched
    (einsum/batched-bincount vs per-problem dot/bincount), so centroids
    can drift by ulps exactly like the r6 bincount rewrite already
    documented in _np_kmeans: absorbed by design, the ANN oracles are
    planted-dup codebook-INDEPENDENT and the recall gate has wide margin.
    Measured driver-side fit wall at sf1.0 (20k x 64 sample, m=8, k=16):
    4.8 s sequential -> ~0.6 s batched. Input (n, m, sub); returns
    (m, k, sub) float64 codebooks."""
    n, m, sub = blocks.shape
    if n == 0:
        raise ValueError("empty fit sample")
    P = m * n_init
    Xs = np.ascontiguousarray(
        np.transpose(blocks, (1, 0, 2)), dtype=np.float64
    )  # (m, n, sub)
    # k-means++ seeding per problem — scalar RNG draws are inherently
    # sequential (each center depends on d2 of the previous); k * P small
    # vector ops are a measured ~5% of the old wall, not worth batching
    C = np.empty((P, k, sub))
    for s in range(m):
        X = Xs[s]
        for trial in range(n_init):
            rng = np.random.RandomState(seed + s + trial)
            centers = [X[rng.randint(n)]]
            d2 = ((X - centers[0]) ** 2).sum(axis=1)
            while len(centers) < k:
                tot = float(d2.sum())
                if tot <= 0.0:
                    centers.append(X[rng.randint(n)])
                else:
                    idx = int(np.searchsorted(np.cumsum(d2), rng.rand() * tot))
                    centers.append(X[min(idx, n - 1)])
                d2 = np.minimum(d2, ((X - centers[-1]) ** 2).sum(axis=1))
            C[s * n_init + trial] = np.asarray(centers, dtype=np.float64)
    # Lloyd: the n_init trials of one subspace SHARE the sample block, so
    # each subspace advances through ONE (n, sub) @ (sub, n_init*k) GEMM
    # per iteration — (n, n_init*k) temporaries stay cache-resident. (A
    # fully-batched (P, n, k) form was tried first and ran memory-bound:
    # three ~80 MB temporaries per iteration made it SLOWER than the
    # sequential per-problem loop.)
    act = np.ones((m, n_init), dtype=bool)
    toff = np.arange(n_init)[None, :] * k
    # distances/argmin in float32 (the embeddings are float32 at source;
    # halves the per-iteration memory traffic of the dominant GEMM +
    # argmin pass). Centroid UPDATES stay float64 — only the assignment
    # can drift, at exact float32 distance ties: the same
    # codebooks-drift-by-ulps class the docstring covers.
    Xs32 = Xs.astype(np.float32)
    for _ in range(max_iter):
        moved = False
        for s in range(m):
            if not act[s].any():
                continue
            X = Xs[s]
            Cs = C[s * n_init : (s + 1) * n_init]  # (n_init, k, sub) view
            CsT = Cs.reshape(n_init * k, sub).T.astype(np.float32)
            d = (CsT * CsT).sum(axis=0)[None, :] - 2.0 * (Xs32[s] @ CsT)
            assign = d.reshape(n, n_init, k).argmin(axis=2)  # (n, n_init)
            # trial-major flat labels: per-trial bincount order == the
            # scalar loop's row order, so sums match bit-for-bit
            flat = (assign + toff).T.ravel()
            counts = (
                np.bincount(flat, minlength=n_init * k)
                .reshape(n_init, k)
                .astype(np.float64)
            )
            sums = np.empty((n_init, k, sub))
            for dim_i in range(sub):
                sums[:, :, dim_i] = np.bincount(
                    flat,
                    weights=np.tile(X[:, dim_i], n_init),
                    minlength=n_init * k,
                ).reshape(n_init, k)
            newC = Cs.copy()
            nz = counts > 0
            newC[nz] = sums[nz] / counts[nz, None]
            for t in range(n_init):
                if not act[s, t]:
                    continue
                if np.allclose(newC[t], Cs[t]):
                    # converged: keep the PRE-update centers (the scalar
                    # loop breaks BEFORE C = newC)
                    act[s, t] = False
                else:
                    C[s * n_init + t] = newC[t]
                    moved = True
        if not moved:
            break
    books = np.empty((m, k, sub))
    for s in range(m):
        X = Xs[s]
        Cs = C[s * n_init : (s + 1) * n_init]
        CsT = Cs.reshape(n_init * k, sub).T
        d = (CsT * CsT).sum(axis=0)[None, :] - 2.0 * (X @ CsT)
        # + const ||x||^2 per row: same argmin over trials
        inertia = d.reshape(n, n_init, k).min(axis=2).sum(axis=0)
        books[s] = Cs[int(np.argmin(inertia))]
    return books


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors for each query row. queries must be small
    (broadcast); vectors can be arbitrarily large — the join is a
    broadcast-nested-loop scored entirely in codegen'd JVM expressions.
    Norms computed ONCE per row; the O(n²) stage is one dot + one divide."""
    v = _with_norm(vectors, id_col, vec_col, "nbr_id", "nbr_vec", "nbr_n")
    q = _with_norm(queries, id_col, vec_col, "query_id", "q_vec", "q_n")
    scored = v.crossJoin(F.broadcast(q)).where(F.col("query_id") != F.col("nbr_id"))
    scored = scored.select(
        "query_id",
        "nbr_id",
        (_dot("q_vec", "nbr_vec") / (F.col("q_n") * F.col("nbr_n"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "cos")
    )


def cosine_pairs_threshold(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    small: bool = False,
    dim: int = 64,
    bands: int = 16,
    planes_per_band: int = 12,
    seed: int = 11,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cos >= t) — the
    embedding flavor of the dedup family.

    DEFAULT path (VERDICT r2 #7) is banded sign-LSH candidates + exact
    verification: each vector gets `bands` codes of `planes_per_band` sign
    bits; pairs sharing ANY (band, code) are candidates, then scored with
    the exact cosine. The self-join is an equi-join on (band, code) — the
    100TB-shaped plan; random-pair collision ~ bands/2^r prunes ~256x at
    the defaults. Recall S-curve: miss(t) = (1-(1-acos(t)/pi)^r)^bands —
    ~1e-6 at t=0.99, ~0.93 recall at t=0.9 with the defaults (raise
    `bands` or lower `planes_per_band` for lower thresholds; identical
    vectors always collide in every band, so exact dups are never missed).
    `small=True` keeps the exact O(n^2) cross-join for corpora small
    enough to scan quadratically (<~10^5 rows)."""
    a = _with_norm(vectors, id_col, vec_col, "id_a", "va", "na")
    b = _with_norm(vectors, id_col, vec_col, "id_b", "vb", "nb")
    if small:
        return (
            a.crossJoin(b)
            .where(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b",
                (_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cos"),
            )
            .where(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos")
        )
    banded = add_lsh_band_codes(
        vectors, vec_col, dim, bands, planes_per_band, seed
    ).select(F.col(id_col).alias("id"), "band", "code")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "code"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    # exact verify: candidates (tiny after pruning) pull their vectors back
    # by keyed join; cos evaluated once per surviving pair
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a", "id_b",
            (_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(np.random.Philox(key=[seed, dim * 1000 + n_planes]))
    return rng.standard_normal((dim, n_planes)).astype(np.float32)


def add_lsh_bucket(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64, n_planes: int = 12, seed: int = 11
) -> DataFrame:
    """Append ``bucket`` = sign-LSH code (int) from deterministic random
    hyperplanes. One numpy matmul per Arrow batch."""
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(T.IntegerType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        mat = np.asarray([np.asarray(v, dtype=np.float32) for v in vecs])
        bits = (mat @ planes) > 0
        code = np.zeros(len(vecs), dtype=np.int32)
        for j in range(planes.shape[1]):
            code |= bits[:, j].astype(np.int32) << j
        return pd.Series(code)

    return df.withColumn("bucket", bucket_udf(F.col(vec_col)))


def add_lsh_band_codes(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    bands: int = 16,
    planes_per_band: int = 12,
    seed: int = 11,
) -> DataFrame:
    """Explode each row into `bands` rows of (band, code): sign-LSH codes
    from bands*planes_per_band deterministic hyperplanes — the banded
    (OR-of-ANDs) construction that tunes the match S-curve exactly like
    MinHash banding. One numpy matmul + one reshape-matmul per Arrow batch
    (no per-row Python); codes packed vectorized via a power-of-two dot."""
    r = planes_per_band
    planes = _hyperplanes(dim, bands * r, seed)
    weights = (1 << np.arange(r)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def codes_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray([np.asarray(v, dtype=np.float32) for v in vecs])
        bits = (mat @ planes) > 0                        # (n, bands*r)
        codes = bits.reshape(len(vecs), bands, r) @ weights  # (n, bands)
        return pd.Series(list(codes))

    return df.withColumn("__codes", codes_udf(F.col(vec_col))).select(
        "*", F.posexplode("__codes").alias("band", "code")
    ).drop("__codes")


def ann_ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 13,
    max_iter: int = 25,
    fit_sample_rows: int = FIT_SAMPLE_CAP,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize vectors with k-means
    (n_lists centroids, seeded -> deterministic), assign each vector to its
    nearest centroid's list, and score each query only against its n_probe
    nearest lists. The scale path: centroids are fit in-driver on a
    <= fit_sample_rows seeded sample (_collect_fit_sample — the faiss
    train/encode split; at 100 TB the fit input is bounded, only ENCODING
    streams over the corpus) and broadcast via UDF closure; the candidate
    join is an equi-join on list id (shuffle bounded by candidate lists),
    never a cross join. Recall tunes with n_probe; n_lists ~ sqrt(corpus)
    at scale.

    max_iter defaults to 8: a COARSE quantizer does not need a converged
    clustering — k-means++ init is already centroid-quality, and recall is
    governed by n_probe, not centroid polish (the deterministic-assignment
    property that the identical-vector oracle depends on holds for ANY
    centroids)."""
    dense = _with_norm(vectors, id_col, vec_col, "nbr_id", "nbr_vec", "nbr_n")
    X = _collect_fit_sample(dense, "nbr_vec", fit_sample_rows, seed)
    C = _np_kmeans(X, n_lists, seed, max_iter)   # (n_lists, dim)
    C_sq = (C * C).sum(axis=1)                   # (n_lists,)

    # nearest-centroid ranking, whole-batch (VERDICT r2 #5): argmin over
    # ||v - c||^2 = ||c||^2 - 2 v.c (+ const ||v||^2 per row), so ONE
    # (batch x centroids) matmul + argsort ranks every centroid for every
    # vector — no per-row Python loop. n_take=1 assigns the corpus,
    # n_take=n_probe fans out the queries.
    def _nearest_lists(n_take: int):
        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def nearest(vecs: pd.Series) -> pd.Series:
            if len(vecs) == 0:
                return pd.Series([], dtype=object)
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            scores = C_sq[None, :] - 2.0 * (mat @ C.T)  # (n, n_lists)
            order = np.argsort(scores, axis=1)[:, :n_take].astype(np.int32)
            return pd.Series(list(order))

        return nearest

    lists = dense.withColumn(
        "list_id", _nearest_lists(1)(F.col("nbr_vec")).getItem(0)
    )

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    q = (
        q.withColumn("q_n", _norm("q_vec"))
        .withColumn("list_id", F.explode(_nearest_lists(n_probe)(F.col("q_vec"))))
    )
    cand = lists.join(F.broadcast(q), "list_id").where(F.col("query_id") != F.col("nbr_id"))
    # norms were computed ONCE per row on each side (_with_norm / q_n) —
    # the per-candidate work is one dot + one divide
    cos = _dot("q_vec", "nbr_vec") / (F.col("q_n") * F.col("nbr_n"))
    scored = cand.select("query_id", "nbr_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "cos")
    )


def ann_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_planes: int = 12,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing the query's LSH
    bucket (equi-join on bucket replaces the cross join — this is the
     100TB-shaped plan). ``multiprobe=1`` additionally probes every
    Hamming-1 neighbor bucket of the query's code (the standard
    multi-probe LSH recall dial: 1+n_planes probes instead of 1, only
    the QUERY side fans out — the corpus index is untouched; measured in
    ANN_RECALL.json). Each (query, nbr) pair arises at most once: a
    neighbor has ONE bucket and the probe list is distinct buckets."""
    v = add_lsh_bucket(vectors, vec_col, dim, n_planes).select(
        F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("nbr_vec"), "bucket"
    ).withColumn("nbr_n", _norm("nbr_vec"))
    q = add_lsh_bucket(queries, vec_col, dim, n_planes).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "bucket"
    ).withColumn("q_n", _norm("q_vec"))
    if multiprobe:
        if multiprobe != 1:
            raise ValueError("multiprobe supports 0 (off) or 1 (Hamming-1)")
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << j))
                for j in range(n_planes)
            ],
        )
        q = q.withColumn("bucket", F.explode(probes))
    cand = v.join(F.broadcast(q), "bucket").where(F.col("query_id") != F.col("nbr_id"))
    cos = _dot("q_vec", "nbr_vec") / (F.col("q_n") * F.col("nbr_n"))
    scored = cand.select("query_id", "nbr_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "cos")
    )


# -------------------------------------------------- semantic dedup -------

# Integer hyperplane coefficients for the ORACLE-REPRODUCIBLE cluster
# assignment in semantic_dedup: small ints from a fixed LCG, inlined as
# literals in BOTH the Spark plan and the generated DuckDB SQL (one
# source of truth, like dedup.PORTABLE_HASH_COEFFS). Integer projections
# over floor-quantized components are exact — no float-sum-order
# divergence can flip a sign at the cluster boundary.
def int_planes(dim: int = 64, n_planes: int = 6, seed: int = 7) -> list[list[int]]:
    out, x = [], seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            x = (x * 1103515245 + 12345) % (1 << 31)
            row.append((x % 199) - 99)  # [-99, 99]
        out.append(row)
    return out


def semantic_dedup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    dim: int = 64,
    n_planes: int = 6,
) -> DataFrame:
    """SemDedup-style semantic deduplication (Abbas et al. 2023): cluster
    the embedding space, then greedily drop any vector that has a
    LOWER-id near-duplicate (cos >= threshold) within its own cluster.
    Returns (id, cluster, keep) for every input row.

    The clustering is deterministic sign-partitioning: each vector's
    components are floor-quantized to integers (floor(x * 2^20) — exact:
    a double times a power of two keeps every mantissa bit) and projected
    against `n_planes` integer hyperplanes (int_planes); the sign bits
    form the cluster id. All-integer arithmetic means the DuckDB oracle
    reproduces cluster assignment bit-for-bit — the reason this is not
    KMeans (ann_ivf_topk covers that quantizer; its centroids are not
    SQL-expressible, so its oracle is retrieval-only).

    Plan shape: quantization + projection + cluster code are pure JVM
    Column algebra (zero Python — unlike the matmul LSH paths); the only
    shuffle is the within-cluster self-equi-join on `cluster`; dropped
    ids (bounded by the dup count) broadcast back for the keep flag.
    At scale, `n_planes` ~ log2(n / target_cluster_size) bounds the
    per-cluster pairwise verify exactly like the banded-LSH candidate
    fence; the greedy lower-id rule (not connected components — that is
    dup_clusters' contract) keeps one representative per near-dup
    NEIGHBORHOOD without any iteration.

    Reference lineage: the keep-one-per-duplicate-set policy of the
    reference's SAM first-occurrence dedup (utilities.py:63-106), lifted
    to embedding space."""
    planes = int_planes(dim, n_planes)
    xq = F.expr(
        "transform(vec, x -> cast(floor(cast(x as double) * 1048576) as bigint))"
    )
    base = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).withColumn("__xq", xq)
    cluster = F.lit(0).cast("long")
    for p, row in enumerate(planes):
        arr = "array(" + ",".join(f"{c}L" for c in row) + ")"
        proj = F.expr(
            f"aggregate(zip_with(__xq, {arr}, (a, c) -> a * c), 0L, (s, v) -> s + v)"
        )
        cluster = cluster + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    clustered = base.select("id", "vec", cluster.alias("cluster")).withColumn(
        "n", _norm("vec")
    )
    a = clustered.select(
        F.col("id").alias("id_a"), F.col("cluster").alias("cluster"),
        F.col("vec").alias("va"), F.col("n").alias("na"),
    )
    b = clustered.select(
        F.col("id").alias("id_b"), F.col("cluster").alias("cluster"),
        F.col("vec").alias("vb"), F.col("n").alias("nb"),
    )
    dropped = (
        a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .where((_dot("va", "vb") / (F.col("na") * F.col("nb"))) >= threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
        .withColumn("__dropped", F.lit(1))
    )
    return (
        clustered.join(F.broadcast(dropped), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.when(F.col("__dropped").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("keep"),
        )
    )


# ------------------------------------------------- int8 quantization ----
# Scalar quantization — the ANN memory-scaling move: a 64-dim float32
# embedding is 256 bytes; symmetric int8 cuts it 4x (and real deployments
# push further with PQ). At 10^12 rows the quantized index is the one
# that fits. Integer DOT PRODUCT scoring makes the ranking exactly
# reproducible cross-engine (no float-summation-order or rounding-
# boundary fragility — the bm25 integer-score rule applied to ANN).


def quantize_embeddings(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, scale, qvec array<long>): symmetric per-vector int8
    quantization q_i = floor(v_i * 127 / max|v| + 0.5) in [-127, 127] —
    round-half-up spelled as floor(x + 0.5), because floor is the only
    cross-engine-safe float->int bridge (Spark casts truncate, DuckDB
    casts round, round() differs on halves, but both FLOOR identically;
    the doc_fingerprint/bm25 lesson) and nearest-rounding halves the
    per-component quantization error vs plain floor (measured: recall@5
    0.69 -> see ANN_RECALL.json). Scale-invariant (v and 2v quantize
    identically), so integer dot ranking approximates COSINE ranking.
    Elements pass through double so engine and SQL oracle see
    bit-identical products. Zero vectors drop (no direction to
    preserve). Pure Column algebra, zero Python."""
    from .partitioning import widen

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    s = F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    # r6: widen a degenerate single-split source — quantization + the
    # downstream integer-dot scoring are interpreted per-element lambdas
    out = widen(vectors, id_col).select(
        F.col(id_col).alias("id"), v.alias("__v"), s.alias("scale")
    )
    qvec = F.transform(
        F.col("__v"),
        lambda x: F.floor(x * F.lit(127.0) / F.col("scale") + F.lit(0.5)),
    )
    return out.where(F.col("scale") > 0).select("id", "scale", qvec.alias("qvec"))


def quantized_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """(query_id, nbr_id, rank, qdot): exact top-k by INTEGER quantized
    dot product (ties -> smaller nbr_id). Same broadcast-nested-loop
    shape as cosine_topk_bruteforce — queries broadcast, the corpus side
    streams through codegen — but the per-row payload is 4x smaller and
    the score is an int64 (deterministic ranking, no round() in the
    gate). The quality trade vs full-precision cosine is the standard SQ
    recall curve; re-scoring survivors with float cosine drops into the
    same plan as a post-filter."""
    qv = quantize_embeddings(vectors, id_col, vec_col).select(
        F.col("id").alias("nbr_id"), F.col("qvec").alias("nbr_q")
    )
    qq = quantize_embeddings(queries, id_col, vec_col).select(
        F.col("id").alias("query_id"), F.col("qvec").alias("q_q")
    )
    scored = qv.crossJoin(F.broadcast(qq)).where(F.col("query_id") != F.col("nbr_id"))
    qdot = F.aggregate(
        F.zip_with("q_q", "nbr_q", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = scored.select("query_id", "nbr_id", qdot.alias("qdot"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("qdot").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "qdot")
    )


# ---------------------------------------------------- product quantizer --


def ann_pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 1,
    m_subspaces: int = 8,
    n_codes: int = 16,
    seed: int = 17,
    max_iter: int = 25,
    fit_sample_rows: int = FIT_SAMPLE_CAP,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011 — the IVF-PQ family
    every billion-scale vector index ships): split the vector into
    m_subspaces blocks, k-means a tiny codebook per block, store each
    corpus vector as m_subspaces uint8 codes (64-dim float32 = 256 B ->
    8 B at these defaults, a 32x index shrink — the memory story that
    makes 10^12-row ANN possible at all), and score queries with
    ASYMMETRIC distance: the query stays full-precision, each candidate
    costs m_subspaces lookups into the query's per-subspace
    distance-to-codeword table.

    Plan shape: codebooks are tiny driver-side arrays fit on ONE
    <= fit_sample_rows seeded sample (m_subspaces in-driver numpy fits
    over the sample's blocks — never a distributed ML fit per subspace);
    corpus ENCODING is one
    Arrow-batched matmul stage (never per-row Python); each query ships
    its flattened LUT (m_subspaces x n_codes doubles) on the broadcast
    side; scoring is a JVM fold over the code array — the corpus side
    streams through codegen exactly like quantized_topk. Final ranking:
    PQ distance asc (ties by id), with the full-precision cosine of the
    winners emitted for the gate.

    Correctness anchor (the LSH/IVF oracle basis): recon(q) minimizes
    ||q - recon||^2 over ALL code combinations (per-subspace argmin), so
    an exact duplicate of the query attains the global PQ-distance
    minimum and top-1 retrieval of planted duplicates is
    codebook-independent.
    """
    v = _with_norm(vectors, id_col, vec_col, "nbr_id", "nbr_vec", "nbr_n")
    # per-subspace codebooks from ONE bounded sample collect: slice the
    # sample into blocks driver-side, m in-driver numpy fits (each over
    # (n_sample, sub) floats). The r4 shape — m_subspaces DISTRIBUTED
    # KMeans fits, each a multi-job ML pipeline — paid ~m x fit-overhead
    # for codebooks whose quality a sample already saturates.
    X = _collect_fit_sample(v, "nbr_vec", fit_sample_rows, seed)
    dim = X.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    sub = dim // m_subspaces
    blocks_fit = X.reshape(X.shape[0], m_subspaces, sub)
    # r6: ONE batched fit for all m_subspaces x n_init Lloyd problems
    # (driver wall 4.8 s -> ~0.6 s at sf1.0) — see _np_kmeans_pq
    B = _np_kmeans_pq(blocks_fit, n_codes, seed, max_iter)  # (m, n_codes, sub)
    B_sq = (B * B).sum(axis=2)  # (m, n_codes)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in vecs])
        n = mat.shape[0]
        blocks = mat.reshape(n, m_subspaces, sub)
        codes = np.empty((n, m_subspaces), dtype=np.int32)
        for s in range(m_subspaces):
            # argmin ||x - c||^2 = ||c||^2 - 2 x.c (+ const per row)
            d = B_sq[s][None, :] - 2.0 * (blocks[:, s, :] @ B[s].T)
            codes[:, s] = d.argmin(axis=1)
        return pd.Series(list(codes))

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def lut(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in vecs])
        n = mat.shape[0]
        blocks = mat.reshape(n, m_subspaces, sub)
        out = np.empty((n, m_subspaces * n_codes))
        for s in range(m_subspaces):
            x = blocks[:, s, :]
            out[:, s * n_codes : (s + 1) * n_codes] = (
                (x * x).sum(axis=1)[:, None] + B_sq[s][None, :] - 2.0 * (x @ B[s].T)
            )
        return pd.Series(list(out))

    coded = v.withColumn("codes", encode(F.col("nbr_vec")))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    q = q.withColumn("q_n", _norm("q_vec")).withColumn("q_lut", lut(F.col("q_vec")))

    cand = coded.crossJoin(F.broadcast(q)).where(F.col("query_id") != F.col("nbr_id"))
    # ADC: fold the m codes through the query LUT — pure JVM
    pq_dist = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m_subspaces - 1)),
            lambda c, s: F.element_at(
                F.col("q_lut"), (s * F.lit(n_codes) + c + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = cand.select(
        "query_id",
        "nbr_id",
        pq_dist.alias("pq_dist"),
        (_dot("q_vec", "nbr_vec") / (F.col("q_n") * F.col("nbr_n"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_dist").asc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "cos")
    )


def embedding_health(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-column audit card: per dimensionality, how many vectors
    exist, how many are all-zero (failed encoder batches emit zeros and
    silently poison every cosine downstream — a zero vector is "similar"
    to nothing and clusters with everything at distance 1), and how many
    are exact duplicates (re-encoded copies that bias ANN training
    negatives). The first sanity pass before any index build.

    Zero test is float-safe because it is only an equality with zero:
    a vector is zero iff no element is nonzero (NaN elements make a
    vector non-zero in both engines; empty vectors count as zero).

    Scale shape: one groupBy on (dim, vector) — the shuffle carries the
    vector once, the exact-dedup cost; at 100 TB you'd group on a
    128-bit content hash computed JVM-side and verify residually, but
    value-grouping is the formulation a cross-engine oracle can check
    bit-for-bit. Output is one row per distinct dimensionality (a
    healthy table has exactly one)."""
    b = df.where(F.col(vec_col).isNotNull()).select(
        F.size(F.col(vec_col)).cast("long").alias("dim"),
        F.col(vec_col).alias("v"),
        (~F.exists(F.col(vec_col), lambda x: x != F.lit(0.0))).alias(
            "is_zero"
        ),
    )
    g = b.groupBy("dim", "v", "is_zero").agg(
        F.count("*").cast("long").alias("n")
    )
    return (
        g.groupBy("dim")
        .agg(
            F.sum("n").cast("long").alias("n_vecs"),
            F.count("*").cast("long").alias("n_distinct"),
            F.sum(F.when(F.col("is_zero"), F.col("n")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_zero"),
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_dup_vecs"),
        )
        .select(
            "dim",
            "n_vecs",
            "n_distinct",
            "n_zero",
            "n_dup_vecs",
            F.expr("1000 * n_dup_vecs div n_vecs").alias("dup_permille"),
        )
    )


def cluster_balanced_sample(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
    per_cluster: int = 16,
) -> DataFrame:
    """Diversity-preserving subset selection: cap every region of
    embedding space at `per_cluster` representatives. The curation move
    behind cluster-balanced data selection (and SemDedup's 'spread over
    clusters' framing): a duplicate-heavy or boilerplate-heavy region of
    the space contributes at most per_cluster examples no matter how many
    raw documents landed there, so the sampled corpus covers the SPACE
    rather than the crawl-frequency distribution.

    Clusters are the same deterministic integer sign-partitions as
    semantic_dedup (int_planes; exact floor-quantized projections, so
    the DuckDB oracle reproduces assignment bit-for-bit). Within a
    cluster, representatives are chosen by a deterministic Fibonacci-hash
    rank of the id (NOT lowest-id-first — that would bias the sample
    toward whichever provider was ingested first), ties broken by id.
    Emits (id, cluster, pick_rank, sampled) for EVERY input row — the
    sampled flag filters, the kept/cut accounting aggregates.

    Plan shape: cluster assignment is per-row JVM Column algebra (zero
    Python); the only shuffle is the keyed window over `cluster`
    (bounded per-group by cluster occupancy — n_planes dials it exactly
    like semantic_dedup's verify fence). Payload columns are projected
    away before the shuffle; only (id, cluster) moves."""
    from ..operators.sampling import KNUTH, M32
    from pyspark.sql import Window

    planes = int_planes(dim, n_planes)
    xq = F.expr(
        "transform(vec, x -> cast(floor(cast(x as double) * 1048576) as bigint))"
    )
    base = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).withColumn("__xq", xq)
    cluster = F.lit(0).cast("long")
    for p, row in enumerate(planes):
        arr = "array(" + ",".join(f"{c}L" for c in row) + ")"
        proj = F.expr(
            f"aggregate(zip_with(__xq, {arr}, (a, c) -> a * c), 0L, (s, v) -> s + v)"
        )
        cluster = cluster + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    ids = base.select("id", cluster.alias("cluster")).withColumn(
        "__h", (F.col("id").cast("long") * F.lit(KNUTH)) % F.lit(M32)
    )
    w = Window.partitionBy("cluster").orderBy(F.col("__h").asc(), F.col("id").asc())
    return ids.select(
        "id", "cluster", F.row_number().over(w).cast("long").alias("pick_rank")
    ).select(
        F.col("id").alias(id_col),
        "cluster",
        "pick_rank",
        F.when(F.col("pick_rank") <= per_cluster, 1).otherwise(0).cast("long").alias("sampled"),
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
) -> DataFrame:
    """Semantic benchmark decontamination: flag every corpus vector whose
    embedding cosine against ANY benchmark vector reaches `threshold` —
    the embedding-space analog of dedup.decontaminate_against, catching
    the paraphrased/reformatted eval leakage that n-gram screens miss
    (reference analog: contaminant removal before downstream use,
    run.py:372-450 tag-and-remove semantics at corpus granularity).

    Shape at 100 TB: the benchmark side is small by construction (an eval
    suite, ~1e4-1e6 rows) -> broadcast nested-loop; the corpus makes ONE
    codegen'd JVM pass (dot + divide per pair, norms computed once per
    row, same float-op order as the oracle) and never shuffles; only the
    FLAGGED hits (<< corpus by construction) reach the per-id top-1
    window. Returns (id_col, bench_id, cos) for contaminated corpus rows:
    bench_id = best-matching benchmark row (max cos, min-id tiebreak),
    cos full-precision — callers round ONCE at the edge (module header)."""
    v = _with_norm(corpus, id_col, vec_col, "__cid", "c_vec", "c_n")
    b = _with_norm(benchmark, id_col, vec_col, "bench_id", "b_vec", "b_n")
    scored = (
        v.crossJoin(F.broadcast(b))
        .select(
            "__cid",
            "bench_id",
            (_dot("c_vec", "b_vec") / (F.col("c_n") * F.col("b_n"))).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
    w = Window.partitionBy("__cid").orderBy(F.col("cos").desc(), F.col("bench_id").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .select(F.col("__cid").alias(id_col), "bench_id", "cos")
    )


# Offset added per quantized element so every div dividend is positive:
# Spark `div` truncates toward zero while DuckDB `//` floors — they agree
# only on non-negative operands, and per-dim sums of centered embeddings
# are routinely negative. (raw + n*OFF) div n == floor(raw/n) + OFF
# exactly, so subtracting OFF back yields TRUE floor semantics on both
# engines. OFF > quant * max|x| for any sane embedding scale.
_DRIFT_OFF = 1 << 23


def quantized_dim_moments(
    df: DataFrame, vec_col: str = "embedding", quant: int = 1 << 20
) -> DataFrame:
    """(dim, n, s): exact-integer per-dimension moment cells over
    offset-positive floor(x*quant) values — MERGEABLE in any order and
    any grouping (sum of sums), which is what lets the streaming drift
    monitor accumulate them per micro-batch and merge at read time.
    posexplode multiplies rows by dim but the agg is map-side
    combinable: each task reduces to <= dim rows before the dim-key
    shuffle."""
    q = F.expr(
        f"transform({vec_col}, x -> cast(floor(cast(x as double) * {quant}) "
        f"as bigint) + {_DRIFT_OFF}L)"
    )
    return (
        df.select(F.posexplode(q).alias("dim", "xq"))
        .groupBy("dim")
        .agg(F.count("*").alias("n"), F.sum("xq").alias("s"))
    )


def drift_report(
    ma: DataFrame,
    mb: DataFrame,
    quant: int = 1 << 20,
    min_delta_micro: int = 10_000,
) -> DataFrame:
    """Join two raw moment tables (quantized_dim_moments schema) into the
    per-dimension drift report. Means are TRUE floor divisions on both
    engines thanks to the offset (see _DRIFT_OFF)."""
    a = ma.select(
        "dim",
        F.col("n").alias("n_a"),
        (F.expr("s div n") - F.lit(_DRIFT_OFF)).alias("mean_a_q"),
    )
    b = mb.select(
        "dim",
        F.col("n").alias("n_b"),
        (F.expr("s div n") - F.lit(_DRIFT_OFF)).alias("mean_b_q"),
    )
    j = a.join(b, "dim")
    delta = F.expr(f"abs(mean_a_q - mean_b_q) * 1000000L div {quant}").cast("long")
    return j.select(
        F.col("dim").cast("long").alias("dim"),
        "n_a",
        "n_b",
        "mean_a_q",
        "mean_b_q",
        delta.alias("delta_micro"),
        F.when(delta >= min_delta_micro, 1).otherwise(0).cast("long").alias("drifted"),
    )


def embedding_drift(
    snap_a: DataFrame,
    snap_b: DataFrame,
    vec_col: str = "embedding",
    quant: int = 1 << 20,
    min_delta_micro: int = 10_000,
) -> DataFrame:
    """Per-dimension embedding mean shift between two corpus snapshots —
    the monitor that catches a silent encoder-version bump or an upstream
    filter changing corpus COMPOSITION (the length_drift idea lifted to
    embedding space). All arithmetic is exact integer after one
    floor(x*2^20) quantization (the int_planes bridge), so both engines
    and the oracle agree bit-for-bit: mean_*_q is the floor per-dim mean
    in 2^-20 units, delta_micro = |mean_a - mean_b| in micro embedding
    units, drifted = delta_micro >= min_delta_micro.

    Shape at 100 TB: see quantized_dim_moments (one combinable agg per
    snapshot; nothing else moves). int64 headroom: |s| <= n *
    (quant*max|x| + offset) — switch the sum to decimal(38,0) past ~1e11
    rows per snapshot. Streaming variant: streaming/drift_stream.py
    accumulates the same cells per micro-batch."""
    return drift_report(
        quantized_dim_moments(snap_a, vec_col, quant),
        quantized_dim_moments(snap_b, vec_col, quant),
        quant,
        min_delta_micro,
    )


def embedding_pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    quant: int = 1 << 20,
):
    """Distributed PCA fit over an embedding column — the canonical
    one-pass pattern for corpus-scale spectral fits: (1) each Arrow batch
    reduces to ONE int64 partial-moment row (upper-tri Gram + column sums
    + count, a single BLAS syrk over floor(x*2^20)-quantized values, so
    partials are EXACT integers and merge in any order), (2) the <= 
    d(d+1)/2 + d + 1 partial cells aggregate as decimal(38,0) (no global
    int64 overflow at any corpus size), (3) the dxd covariance solve runs
    in the driver (the bounded-model exemption — model size is dim-bound,
    never corpus-bound; same class as the langid/ANN fits). Returns
    (components (k, d) float64 rows, eigvals desc, mean (d,), n,
    total_var = trace of the covariance, for explained-variance ratios).

    Sign convention: each component's largest-|entry| element is made
    positive (eigenvector sign is otherwise arbitrary).

    Per-batch int64 headroom: rows_per_batch * (quant*max|x|)^2 must stay
    under 2^63 — with |x| <= 8 and the session's 1024-row columnar
    batches that is ~7e16, 100x of slack; asserted per batch."""
    import pandas as pd

    def _gram(it):
        for pdf in it:
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            Q = np.floor(X * quant).astype(np.int64)
            mx = int(np.abs(Q).max(initial=0))
            assert Q.shape[0] * mx * mx < (1 << 62), "gram partial overflow"
            iu = np.triu_indices(Q.shape[1])
            vals = np.concatenate(
                [(Q.T @ Q)[iu], Q.sum(axis=0), [Q.shape[0]]]
            )
            yield pd.DataFrame({"idx": np.arange(vals.size), "val": vals})

    parts = df.select(vec_col).mapInPandas(_gram, schema="idx long, val long")
    cells = (
        parts.groupBy("idx")
        .agg(F.sum(F.col("val").cast("decimal(38,0)")).alias("s"))
        .collect()
    )
    acc = {int(r["idx"]): int(r["s"]) for r in cells}
    n_cells = len(acc)
    # infer dim from cell count: d(d+1)/2 + d + 1 == n_cells
    d = int((np.sqrt(8 * n_cells + 1) - 3) / 2)
    assert d * (d + 1) // 2 + d + 1 == n_cells, n_cells
    iu = np.triu_indices(d)
    G = np.zeros((d, d), dtype=np.float64)
    G[iu] = [acc[i] for i in range(len(iu[0]))]
    G = G + np.triu(G, 1).T
    S = np.asarray([acc[len(iu[0]) + j] for j in range(d)], dtype=np.float64)
    n = acc[n_cells - 1]
    mean_q = S / n
    cov = (G / n - np.outer(mean_q, mean_q)) / (float(quant) ** 2)
    w, V = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    eigvals, comps = w[order], V[:, order].T
    for i in range(comps.shape[0]):  # deterministic sign
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, eigvals, mean_q / float(quant), int(n), float(w.sum())


def pca_project(
    df: DataFrame,
    components: "np.ndarray",
    mean: "np.ndarray",
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Distributed projection onto fitted components — all-JVM Column
    algebra (the mfcc literal-weight-row pattern): each projection is a
    zip_with dot of the centered vector against a plan-time literal
    component row, left-folded in array order so a python in-order float64
    replica is bit-identical. Zero Python, zero shuffles, applies to any
    frame with the vec column."""
    mean_arr = "array(" + ",".join(f"cast({m!r} as double)" for m in mean) + ")"
    centered = f"zip_with({vec_col}, {mean_arr}, (x, m) -> cast(x as double) - m)"
    projs = []
    for i, row in enumerate(components):
        carr = "array(" + ",".join(f"cast({c!r} as double)" for c in row) + ")"
        projs.append(
            f"aggregate(zip_with({centered}, {carr}, (x, c) -> x * c), "
            f"0D, (s, v) -> s + v)"
        )
    return df.withColumn(out_col, F.expr("array(" + ",".join(projs) + ")"))
