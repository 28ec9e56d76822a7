"""graph.triangle_count (degree-oriented triangle counting).

Oracle parity lives in part_triangles; these pin exact counts on known
graphs, input canonicalization (duplicates, both directions,
self-loops), and triangle-free cases.
"""

import pytest

from pynomaly_spark.graph import triangle_count


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _counts(df):
    return {r["node"]: r["n_triangles"] for r in df.collect()}


def test_k4_every_node_in_three_triangles(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _counts(triangle_count(_edges(spark, k4)))
    # K4 has 4 triangles; each node participates in C(3,2)=3 of them
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    assert sum(got.values()) == 3 * 4  # 3 node-slots per triangle


def test_triangle_free_graph_is_empty(spark):
    star = [(0, i) for i in range(1, 6)]  # star: no triangles
    assert triangle_count(_edges(spark, star)).count() == 0
    path = [(0, 1), (1, 2), (2, 3)]
    assert triangle_count(_edges(spark, path)).count() == 0


def test_canonicalization_dups_directions_loops(spark):
    # one triangle given messily: duplicates, reversed edges, self-loop
    messy = [(1, 2), (2, 1), (2, 3), (2, 3), (3, 1), (1, 1)]
    got = _counts(triangle_count(_edges(spark, messy)))
    assert got == {1: 1, 2: 1, 3: 1}


def test_skewed_hub_counts_exactly(spark):
    # hub 0 connected to 1..10; one closing edge (1,2) -> one triangle
    pairs = [(0, i) for i in range(1, 11)] + [(1, 2)]
    got = _counts(triangle_count(_edges(spark, pairs)))
    assert got == {0: 1, 1: 1, 2: 1}
    with pytest.raises(ValueError, match="unknown column"):
        triangle_count(_edges(spark, pairs), src="nope")
