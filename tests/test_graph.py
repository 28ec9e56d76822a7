"""graph.pagerank_fixed_point.

Cross-engine value parity lives in the oracle gate (graph_pagerank);
these tests pin the operator against a literal Python integer
recursion, the partitioning-invariance claim (the POINT of fixed-point
arithmetic), dangling-mass semantics, and input validation.
"""

import random

import pytest

from pynomaly_spark.graph import pagerank_fixed_point


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def _py_pagerank(edges, n_iter=3, bits=30, dn=85, dd=100):
    scale = 1 << bits
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    n = len(nodes)
    pr = {v: scale // n for v in nodes}
    for _ in range(n_iter):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += pr[u] // deg[u]
        pr = {v: (dd - dn) * scale // (dd * n) + dn * s[v] // dd
              for v in nodes}
    return pr


def test_pagerank_matches_literal_recursion(spark):
    rng = random.Random(11)
    nodes = [f"n{i}" for i in range(20)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(80)
    ]
    expect = _py_pagerank(edges)
    got = {
        r["node"]: r["pr"]
        for r in pagerank_fixed_point(_edges_df(spark, edges)).collect()
    }
    assert got == expect


def test_pagerank_partitioning_invariant(spark):
    rng = random.Random(5)
    edges = [
        (f"a{rng.randrange(15)}", f"a{rng.randrange(15)}")
        for _ in range(60)
    ]
    df = _edges_df(spark, edges)
    one = {(r["node"], r["pr"])
           for r in pagerank_fixed_point(df.coalesce(1)).collect()}
    many = {(r["node"], r["pr"])
            for r in pagerank_fixed_point(df.repartition(13)).collect()}
    assert one == many


def test_pagerank_hub_outranks_leaves_and_mass_bound(spark):
    # star: every leaf points at the hub, hub points back at one leaf
    edges = [(f"leaf{i}", "hub") for i in range(8)] + [("hub", "leaf0")]
    rows = pagerank_fixed_point(_edges_df(spark, edges), n_iter=5).collect()
    pr = {r["node"]: r["pr"] for r in rows}
    assert pr["hub"] > pr["leaf0"] > pr["leaf1"]
    # total mass never exceeds the scale and floor-leak stays tiny
    total = sum(pr.values())
    assert total <= (1 << 30)
    assert total >= (1 << 30) - len(edges) * 10 - len(pr) * 10


def test_pagerank_dangling_and_null_edges(spark):
    # 'sink' has no out-edges: its mass leaks, everyone still scored
    edges = [("a", "sink"), ("b", "sink"), ("b", "a"), (None, "a")]
    rows = pagerank_fixed_point(
        _edges_df(spark, edges), n_iter=2
    ).collect()
    pr = {r["node"]: r["pr"] for r in rows}
    assert set(pr) == {"a", "b", "sink"}
    assert pr["sink"] > pr["a"] > 0


def test_pagerank_validates(spark):
    df = _edges_df(spark, [("a", "b")])
    with pytest.raises(ValueError, match="n_iter"):
        pagerank_fixed_point(df, n_iter=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank_fixed_point(df, d_num=100, d_den=100)
