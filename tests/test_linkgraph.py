"""Link-graph PageRank (operators/linkgraph): engine == a plain-python
integer replica on a hand graph and on the driver query's synthesized
hub-skewed graph; hubs outrank tails; dangling-node semantics hold."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"

SCALE = 1_000_000


def pagerank_replica(edges, iterations=5, damping=850):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = (1000 - damping) * SCALE // 1000
    rank = {n: SCALE for n in nodes}
    for _ in range(iterations):
        inflow = {}
        for s, d in edges:
            inflow[d] = inflow.get(d, 0) + rank[s] // deg[s]
        rank = {n: base + (damping * inflow.get(n, 0)) // 1000 for n in nodes}
    return rank


def test_pagerank_hand_graph(spark):
    from kneaddata_spark.operators.linkgraph import pagerank

    # 0 and 1 point at each other, everyone points at 2, 3 dangles
    edges = [(0, 1), (1, 0), (0, 2), (1, 2), (3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_micro"] for r in pagerank(df).collect()}
    want = pagerank_replica(edges)
    assert got == want
    # the sink (2) outranks the mutual pair; the dangling node (3) has
    # no inflow and sits at BASE
    assert got[2] > got[0] == got[1] > got[3]
    assert got[3] == (1000 - 850) * SCALE // 1000


def test_pagerank_driver_graph_matches_replica(spark):
    from kneaddata_spark.plans.entry_queries import QUERIES, _edge_corpus

    edges = [(r["src"], r["dst"]) for r in _edge_corpus(spark, SF_DIR).collect()]
    want = pagerank_replica(edges)
    got = {
        r["node"]: r["rank_micro"]
        for r in QUERIES["link_pagerank"](spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 400
    # the planted hub edges make nodes 0..9 the top-ranked set
    top10 = sorted(got, key=got.get, reverse=True)[:10]
    assert set(top10) == set(range(10))


def test_qc_eval_standing_surface(spark):
    """The standing qc_eval driver row must report the pytest-gated
    truth: perfect keep/drop F1 and full drop-rule agreement between the
    engine and the pure-pandas oracle on the shared synth basis."""
    from kneaddata_spark.plans.entry_queries import QUERIES

    rows = QUERIES["qc_eval"](spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n"] == r["tp"] + r["fp"] + r["fn"] + r["tn"] > 0
    assert r["f1_permille"] == 1000 and r["rule_agree_permille"] == 1000
    assert r["fp"] == 0 and r["fn"] == 0 and r["rule_agree"] == r["n"]
