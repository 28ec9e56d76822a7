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


def test_kcore_peel_handchecked_layers(spark):
    """A 4-clique with a pendant chain: k=2 peels the chain layer by
    layer (2 rounds), the clique survives with degree 3; k=4 dissolves
    everything; the log records each peel round."""
    from pynomaly_spark.graph import kcore_peel
    import pytest as _pytest

    clique = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    chain = [("d", "e"), ("e", "f")]       # f deg1, then e deg1
    df = spark.createDataFrame(clique + chain, "src string, dst string")
    surv, log = kcore_peel(df, k=2)
    got = {r["node"]: r["core_degree"] for r in surv.collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}
    assert log == [(1, 1, 5), (2, 1, 4)]   # f peels, then e
    surv4, log4 = kcore_peel(df, k=4)
    assert surv4.count() == 0
    # round 1 peels everything except d (degree 4 incl. the pendant);
    # d then vanishes as the documented zero-degree drop — one logged
    # round, empty core
    assert log4 == [(1, 5, 1)]
    with _pytest.raises(ValueError, match="k must be"):
        kcore_peel(df, k=0)


def test_link_prediction_square_and_guard(spark):
    """Square a-b-c-d-a: the two diagonals (a,c) and (b,d) are the only
    non-edges, each with two common neighbours; ties break on (x, y)."""
    from pynomaly_spark.graph import link_prediction
    import pytest as _pytest

    square = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
    df = spark.createDataFrame(square, "src string, dst string")
    out = [tuple(r) for r in link_prediction(df, k=5).collect()]
    assert out == [(1, "a", "c", 2), (2, "b", "d", 2)]
    # existing edges never appear even when they share neighbours
    tri_plus = square + [("a", "c")]
    df2 = spark.createDataFrame(tri_plus, "src string, dst string")
    out2 = [tuple(r) for r in link_prediction(df2, k=5).collect()]
    assert out2 == [(1, "b", "d", 2)]
    # hub guard: 'a' has degree 3 in tri_plus -> in-plan raise
    with _pytest.raises(Exception, match="link_prediction: node degree"):
        link_prediction(df2, k=5, max_degree=2).collect()
    with _pytest.raises(ValueError, match="k must be"):
        link_prediction(df, k=0)
    with _pytest.raises(ValueError, match="unknown column"):
        link_prediction(df, src="nope")


def test_link_prediction_packed_int_ids(spark):
    """Integer ids take the packed-pair-key aggregate (round 6): the
    64-bit pack must stay injective over the FULL int range — negatives
    and the extremes included — and unpack exactly, so the output is
    identical to the generic (string-id) two-column path on the same
    graph shape."""
    from pynomaly_spark.graph import link_prediction

    edges = [
        (-5, -1), (-1, 3), (3, -5), (-5, 7), (7, 3),
        (2147483647, -2147483648), (-2147483648, -5), (0, -1), (0, 7),
    ]
    df_i = spark.createDataFrame(edges, "src int, dst int")
    out_i = [tuple(r) for r in link_prediction(df_i, k=10).collect()]
    # same graph through the generic path via zero-padded string ids
    # that sort like the ints (offset to non-negative, fixed width)
    OFF = 1 << 31

    def s(x):
        return f"{x + OFF:010d}"

    df_s = spark.createDataFrame(
        [(s(a), s(b)) for a, b in edges], "src string, dst string"
    )
    out_s = [
        (r[0], int(r[1]) - OFF, int(r[2]) - OFF, r[3])
        for r in link_prediction(df_s, k=10).collect()
    ]
    assert out_i == out_s
    # top pair hand-checked: -1 and 7 share {-5, 0, 3}
    assert out_i[0] == (1, -1, 7, 3)

    # pack_ids=True on bigint ids: identical rows to the auto path on
    # the non-negative subgraph, long output dtype preserved
    pos = [(a, b) for a, b in edges if a >= 0 and b >= 0]
    more = [(10, 20), (20, 30), (30, 10), (10, 40), (40, 30), (0, 10)]
    df_l = spark.createDataFrame(pos + more, "src long, dst long")
    out_packed = [
        tuple(r) for r in link_prediction(df_l, k=10, pack_ids=True).collect()
    ]
    out_plain = [tuple(r) for r in link_prediction(df_l, k=10).collect()]
    assert out_packed == out_plain
    assert dict(df_l.dtypes)["src"] == "bigint"

    # the in-plan range guard fails loudly on an out-of-range id
    df_big = spark.createDataFrame(
        [(1 << 40, 2), (2, 3)], "src long, dst long"
    )
    with pytest.raises(Exception, match="pack_ids=True requires"):
        link_prediction(df_big, k=5, pack_ids=True).collect()
    # ...while the default path handles the same graph fine
    assert len(link_prediction(df_big, k=5).collect()) >= 1


def test_degree_assortativity_star_vs_uniform(spark):
    """A star graph is maximally disassortative: every edge joins the
    hub (deg n-1) to a leaf (deg 1), so with >=3 leaves the endpoint
    degrees are perfectly anti-correlated -> r = -1 exactly."""
    from pynomaly_spark.graph import degree_assortativity
    import pytest as _pytest

    star = [("h", leaf) for leaf in ["a", "b", "c", "d"]]
    df = spark.createDataFrame(star, "src string, dst string")
    row = degree_assortativity(df).collect()[0]
    assert row["n_edges"] == 4 and row["n_nodes"] == 5
    assert row["r_6dp"] == -1000000
    # a single edge: both endpoints degree 1 -> zero variance -> NULL
    one = spark.createDataFrame([("a", "b")], "src string, dst string")
    assert degree_assortativity(one).collect()[0]["r_6dp"] is None
    with _pytest.raises(ValueError, match="unknown column"):
        degree_assortativity(df, src="nope")
