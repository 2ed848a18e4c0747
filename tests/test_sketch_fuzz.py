"""Randomized cross-engine parity fuzz for the sketch/sampling SQL
replicas: the driver's oracle gate runs them on the fixed testdata
tables; these trials run the SAME dual computation over seeded random
frames with adversarial shapes (boundary values at bucket/octave edges,
zipf skew, tiny groups) so a DuckDB-vs-Spark arithmetic drift (division
sign, shift width, CASE order) cannot hide behind one lucky table."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest


def _duck(sql: str, **frames) -> pd.DataFrame:
    con = duckdb.connect()
    for name, pdf in frames.items():
        con.register(name, pdf)
    try:
        return con.sql(sql).df()
    finally:
        con.close()


def _norm(pdf: pd.DataFrame) -> list:
    cols = sorted(pdf.columns)
    rows = [tuple(r) for r in pdf[cols].itertuples(index=False)]
    return sorted(rows)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_hll_sql_replica_fuzz(spark, seed):
    from kneaddata_spark.operators.sketches import hll_distinct, hll_distinct_sql

    rng = np.random.default_rng(seed)
    n = int(rng.integers(500, 3000))
    # adversarial: powers of two, dense small ints, huge ints near 2^31
    pool = np.concatenate(
        [
            2 ** rng.integers(0, 30, n // 3),
            rng.integers(0, 50, n // 3),
            rng.integers(2**30, 2**31 - 1, n - 2 * (n // 3)),
        ]
    )
    pdf = pd.DataFrame({"k": pool.astype(np.int64), "g": rng.integers(0, 3, n)})
    got = _norm(
        hll_distinct(spark.createDataFrame(pdf), "k", ["g"]).toPandas()
    )
    want = _norm(_duck(hll_distinct_sql("SELECT * FROM t", "k", ["g"]), t=pdf))
    assert got == want


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_quantile_sql_replica_fuzz(spark, seed):
    from kneaddata_spark.operators.sketches import (
        quantile_sketch,
        quantile_sketch_sql,
    )

    rng = np.random.default_rng(seed)
    n = int(rng.integers(500, 3000))
    # adversarial: exact octave boundaries (2^e, 2^e - 1, 2^e + 1) + zipf
    edges = 2 ** rng.integers(1, 28, n // 2)
    vals = np.concatenate(
        [edges + rng.integers(-1, 2, n // 2), rng.zipf(1.5, n - n // 2)]
    ).astype(np.int64)
    pdf = pd.DataFrame({"v": vals, "g": rng.integers(0, 2, n)})
    qs = [250, 500, 900, 999]
    got = _norm(
        quantile_sketch(spark.createDataFrame(pdf), "v", ["g"], qs).toPandas()
    )
    want = _norm(
        _duck(quantile_sketch_sql("SELECT * FROM t", "v", ["g"], qs), t=pdf)
    )
    assert got == want


@pytest.mark.parametrize("seed", [1, 2])
def test_weighted_reservoir_sql_replica_fuzz(spark, seed):
    from kneaddata_spark.operators.sampling import (
        weighted_reservoir_deterministic,
        weighted_reservoir_sql,
    )

    rng = np.random.default_rng(seed)
    n = int(rng.integers(200, 800))
    pdf = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64) * 3 + 1,
            "w": rng.integers(1, 40, n).astype(np.int64),
        }
    )
    df = spark.createDataFrame(pdf).selectExpr("id", "w")
    got = _norm(weighted_reservoir_deterministic(df, "id", "w", 50).toPandas())
    want = _norm(
        _duck(weighted_reservoir_sql("SELECT * FROM t", "id", "w", 50), t=pdf)
    )
    assert got == want
