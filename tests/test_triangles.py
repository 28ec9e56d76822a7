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


def test_packed_closing_join_parity_and_guard(spark):
    """pack_ids (round 6): packed closing-join key returns identical
    counts on int ids (auto, negatives included) and on bigint ids
    under the opt-in; the in-plan guard rejects out-of-range bigints."""
    edges = [(-3, -1), (-1, 4), (4, -3), (4, 7), (7, -1), (-1, -3)]
    df_i = spark.createDataFrame(edges, "src int, dst int")
    auto = _counts(triangle_count(df_i))       # int -> packed path
    plain = _counts(triangle_count(df_i, pack_ids=False))
    assert auto == plain and auto  # non-empty, identical

    pos = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1)]
    df_l = spark.createDataFrame(pos, "src long, dst long")
    assert _counts(triangle_count(df_l, pack_ids=True)) == _counts(
        triangle_count(df_l)
    )

    df_big = spark.createDataFrame(
        [(1 << 40, 2), (2, 3), (3, 1 << 40)], "src long, dst long"
    )
    with pytest.raises(Exception, match="pack_ids=True requires"):
        triangle_count(df_big, pack_ids=True).collect()
    # default path still counts the same triangle
    assert _counts(triangle_count(df_big)) == {(1 << 40): 1, 2: 1, 3: 1}
