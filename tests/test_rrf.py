"""retrieval.rrf_fuse (reciprocal-rank fusion).

Oracle parity lives in emb_rrf_fusion; these pin the fused scores
against hand-computed 1/(k0+rank) sums, single-list membership, rank
ordering with id tiebreak, and validation.
"""

import pytest

from pynomaly_spark.retrieval import rrf_fuse


def _rank(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, rnk long, neighbor_id long"
    )


def test_rrf_hand_computed(spark):
    a = _rank(spark, [(1, 1, 10), (1, 2, 20), (1, 3, 30)])
    b = _rank(spark, [(1, 1, 20), (1, 2, 40)])
    got = {
        r["neighbor_id"]: r
        for r in rrf_fuse([a, b], k0=60, top_k=10).collect()
    }
    # doc 20: rank 2 in a, rank 1 in b -> 1/62 + 1/61 (the winner)
    assert got[20]["rrf_score"] == pytest.approx(
        round(1 / 62 + 1 / 61, 6)
    )
    assert got[20]["rnk"] == 1
    # doc 10 only in a at rank 1: 1/61 beats doc 40's 1/62
    assert got[10]["rrf_score"] == pytest.approx(round(1 / 61, 6))
    assert got[10]["rnk"] == 2
    assert got[30]["rrf_score"] == pytest.approx(round(1 / 63, 6))
    assert got[40]["rrf_score"] == pytest.approx(round(1 / 62, 6))
    # 30 and 40 tie at nothing: 1/63 < 1/62 -> 40 ranks 3, 30 ranks 4
    assert got[40]["rnk"] == 3 and got[30]["rnk"] == 4


def test_rrf_tie_breaks_on_doc_id(spark):
    a = _rank(spark, [(1, 1, 7), (1, 2, 5)])
    b = _rank(spark, [(1, 1, 5), (1, 2, 7)])
    got = rrf_fuse([a, b]).collect()
    # both docs score 1/61 + 1/62 -> tie -> smaller id first
    assert [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rnk"])] \
        == [5, 7]


def test_rrf_top_k_and_multi_query(spark):
    a = _rank(spark, [(q, i, 100 * q + i) for q in (1, 2) for i in range(1, 6)])
    b = _rank(spark, [(q, i, 100 * q + i + 2) for q in (1, 2) for i in range(1, 6)])
    got = rrf_fuse([a, b], top_k=3).collect()
    assert len(got) == 6  # 3 per query
    assert {r["query_id"] for r in got} == {1, 2}


def test_rrf_validation(spark):
    a = _rank(spark, [(1, 1, 10)])
    with pytest.raises(ValueError, match="at least 2"):
        rrf_fuse([a])
    with pytest.raises(ValueError, match="k0"):
        rrf_fuse([a, a], k0=0)
    bad = a.withColumnRenamed("rnk", "position")
    with pytest.raises(ValueError, match="lacks columns"):
        rrf_fuse([a, bad])
