"""Approximate replica of the driver's synthetic star-schema generator,
for OPTIMIZATION-round perf validation at scales the driver ships no data
for (the driver's round-end bench escalated to sf1.0 — BENCH_r05 "sf": 1.0
— but /root/testdata only carries sf0.001/0.01/0.1).

Usage: python tools/make_scale_data.py <sf> [<out_dir>]
       (default out_dir /root/testdata_replica/sf<sf> — NEVER inside
       /root/testdata, which is the driver's own read-only data root: a
       replica dir there could collide with, or be silently picked up
       in place of, driver-generated data)

Distributions were measured from the driver's sf0.1 tables (row counts,
value ranges, categorical sets, doc vocabulary/length, unit-norm random
embeddings, Poisson lines-per-order). Values are NOT bit-identical to the
driver's generator — this data is for TIMING only and must never feed
tools/check_oracles.py correctness claims (those run on the driver's own
sf dirs). Never used by bench.py unless $SPARK_GRAFT_SF_DIR points here.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF = "/root/testdata/sf0.1"

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO", "ECONOMY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
ADJ = ["large", "hot", "blue", "red", "small", "dark", "light", "cold"]
NOUN = ["ring", "bolt", "box", "cap", "cup", "disk", "fan", "pin"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, f"{out_dir}/{name}.parquet")
    print(f"  {name}: {table.num_rows} rows")


def main() -> None:
    sf = float(sys.argv[1])
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/root/testdata_replica/sf{sys.argv[1]}"
    )
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    # tiny dims: copy the driver's own tables verbatim
    for t in ("region", "nation"):
        shutil.copy(f"{REF}/{t}.parquet", f"{out_dir}/{t}.parquet")
        print(f"  {t}: copied from {REF}")

    ids = np.arange(n_cust, dtype=np.int64)
    _write(out_dir, "customer", pa.table({
        "c_custkey": ids,
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))

    ids = np.arange(n_supp, dtype=np.int64)
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": ids,
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    ids = np.arange(n_part, dtype=np.int64)
    adj = np.array(ADJ)[rng.integers(0, len(ADJ), n_part)]
    noun = np.array(NOUN)[rng.integers(0, len(NOUN), n_part)]
    _write(out_dir, "part", pa.table({
        "p_partkey": ids,
        "p_name": np.char.add(np.char.add(adj.astype("U16"), " "), noun.astype("U16")),
        "p_brand": np.array([f"Brand#{b}" for b in range(25)])[rng.integers(0, 25, n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + (ids % 1000) * 0.1, 2),
    }))

    day_us = 86_400_000_000
    o_date_days = rng.integers(0, 2405, n_ord)  # 1995-01-01 .. 2001-08-01
    epoch_1995 = np.int64(789_004_800) * 1_000_000  # 1995-01-01 in us
    _write(out_dir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(epoch_1995 + o_date_days * day_us, pa.timestamp("us")),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))

    okey = rng.integers(0, n_ord, n_li)
    ship_days = o_date_days[okey] + rng.integers(1, 96, n_li)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": okey,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(epoch_1995 + ship_days * day_us, pa.timestamp("us")),
    }))

    epoch_2024 = np.int64(1_704_067_200) * 1_000_000
    month_us = np.int64(30) * day_us
    _write(out_dir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": pa.array(epoch_2024 + rng.integers(0, month_us, n_ev), pa.timestamp("us")),
        "user_id": rng.integers(0, max(1, n_cust // 10), n_ev),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(np.minimum(rng.exponential(50.0, n_ev), 560.0), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: 10-100 tokens uniform over the 30-word vocab, a rare
    # 'dup' token (~0.1% of tokens), ~0.16% exact-duplicate docs,
    # lang en-heavy, 20 sources
    lens = rng.integers(10, 101, n_doc)
    total = int(lens.sum())
    words = np.array(VOCAB + ["dup"])
    tok = rng.integers(0, 30, total)
    tok[rng.random(total) < 0.001] = 30  # rare 'dup'
    flat = words[tok]
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(flat[offs[i]:offs[i + 1]]) for i in range(n_doc)]
    dup_src = rng.random(n_doc) < 0.0016
    for i in np.nonzero(dup_src)[0]:
        if i > 0:
            texts[i] = texts[rng.integers(0, i)]
    langs = np.array(["en", "de", "es", "fr", "zh"])[
        rng.choice(5, n_doc, p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475])
    ]
    _write(out_dir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": langs,
        "source": np.array([f"src{s}" for s in range(20)])[rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    vec = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(vec), pa.list_(pa.float32())),
        "label": rng.integers(0, 10, n_emb).astype(np.int32),
    }))

    with open(f"{out_dir}/_DONE", "w") as fh:
        fh.write("replica (tools/make_scale_data.py) — timing only\n")
    print(f"done: {out_dir}")


if __name__ == "__main__":
    main()
