"""cdc.ivm_join_delta — join IVM contract tests.

The contract: (L ⋈ R) ∪ Δ == (L∪ΔL) ⋈ (R∪ΔR) as a row MULTISET,
with every pair produced exactly once (the ΔL⋈ΔR cross term folded
into the first maintenance join)."""

import pytest

from pynomaly_spark.cdc import ivm_join_delta


def _multiset(df):
    from collections import Counter

    return Counter(tuple(r) for r in df.collect())


def test_ivm_join_matches_full_recompute_with_fanout(spark):
    # keys with fan-out on both sides, delta-only keys, base-only keys
    L = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (9, "z")], "k int, lv string"
    )
    dL = spark.createDataFrame([(1, "A"), (3, "N")], "k int, lv string")
    R = spark.createDataFrame(
        [(1, 10), (1, 11), (3, 30)], "k int, rv int"
    )
    dR = spark.createDataFrame([(2, 20), (1, 12)], "k int, rv int")
    delta = ivm_join_delta(L, dL, R, dR, ["k"])
    maintained = L.join(R, ["k"]).unionByName(delta)
    full = L.unionByName(dL).join(R.unionByName(dR), ["k"])
    assert _multiset(maintained.select("k", "lv", "rv")) == _multiset(
        full.select("k", "lv", "rv")
    )
    # the cross term ΔL⋈ΔR must appear exactly once: (1,"A",12)
    assert _multiset(delta.select("k", "lv", "rv"))[(1, "A", 12)] == 1


def test_ivm_join_empty_deltas_and_composite_key(spark):
    L = spark.createDataFrame([(1, 1, "a")], "k1 int, k2 int, lv string")
    R = spark.createDataFrame([(1, 1, 5)], "k1 int, k2 int, rv int")
    empty_l = L.where("k1 < 0")
    empty_r = R.where("k1 < 0")
    assert (
        ivm_join_delta(L, empty_l, R, empty_r, ["k1", "k2"]).count() == 0
    )


def test_ivm_join_validation_and_broadcast_hint(spark):
    L = spark.createDataFrame([(1, "a")], "k int, lv string")
    R = spark.createDataFrame([(1, 2)], "k int, rv int")
    with pytest.raises(ValueError, match="non-empty"):
        ivm_join_delta(L, L, R, R, [])
    with pytest.raises(ValueError, match="schema"):
        ivm_join_delta(L, R, R, R, ["k"])
    with pytest.raises(ValueError, match="collide"):
        bad = spark.createDataFrame([(1, "x")], "k int, lv string")
        ivm_join_delta(L, L, bad, bad, ["k"])
    plan = (
        ivm_join_delta(L, L, R, R, ["k"], broadcast_deltas=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
