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
    return df.select(
        F.col(id_col).alias(id_alias), F.col(vec_col).alias(vec_alias)
    ).withColumn(n_alias, _norm(vec_alias))


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
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cos >= t) — the
    embedding flavor of the dedup family. O(n^2) scoring; use the LSH
    variant beyond ~10^5 rows."""
    a = _with_norm(vectors, id_col, vec_col, "id_a", "va", "na")
    b = _with_norm(vectors, id_col, vec_col, "id_b", "vb", "nb")
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


def ann_ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 13,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize vectors with KMeans
    (n_lists centroids, seeded -> deterministic), assign each vector to its
    nearest centroid's list, and score each query only against its n_probe
    nearest lists. The scale path: the centroid model is tiny (broadcast
    via the ML transform); the candidate join is an equi-join on list id
    (shuffle bounded by candidate lists), never a cross join. Recall tunes
    with n_probe; n_lists ~ sqrt(corpus) at scale."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dense = vectors.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("nbr_vec"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    km = KMeans(k=n_lists, seed=seed, maxIter=20).fit(dense.select("features"))
    centers = km.clusterCenters()

    lists = km.transform(dense).select("nbr_id", "nbr_vec", F.col("prediction").alias("list_id"))

    # query -> its n_probe nearest centroid lists (tiny driver-side math,
    # centroids are the broadcastable model artifact)
    import numpy as np

    C = np.asarray(centers)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_lists(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            d = ((C - np.asarray(v, dtype=np.float64)) ** 2).sum(axis=1)
            out.append(np.argsort(d)[:n_probe].astype("int32").tolist())
        return pd.Series(out)

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe_lists(F.col(vec_col))).alias("list_id"),
    )
    cand = lists.join(F.broadcast(q), "list_id").where(F.col("query_id") != F.col("nbr_id"))
    cos = _dot("q_vec", "nbr_vec") / (_norm("q_vec") * _norm("nbr_vec"))
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
) -> DataFrame:
    """Approximate top-k: score only candidates sharing the query's LSH
    bucket (equi-join on bucket replaces the cross join — this is the
    100TB-shaped plan; recall tunes with n_planes / multi-probe)."""
    v = add_lsh_bucket(vectors, vec_col, dim, n_planes).select(
        F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("nbr_vec"), "bucket"
    )
    q = add_lsh_bucket(queries, vec_col, dim, n_planes).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "bucket"
    )
    cand = v.join(F.broadcast(q), "bucket").where(F.col("query_id") != F.col("nbr_id"))
    cos = _dot("q_vec", "nbr_vec") / (_norm("q_vec") * _norm("nbr_vec"))
    scored = cand.select("query_id", "nbr_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "cos")
    )
