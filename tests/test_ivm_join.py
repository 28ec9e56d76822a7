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


# ---------------------------------------------------------------------------
# cdc.state_durations — dwell-time occupancy
# ---------------------------------------------------------------------------

def test_state_durations_segments_ties_and_horizon(spark):
    from datetime import datetime as dt

    from pynomaly_spark.cdc import state_durations

    rows = [
        # user 1: A at t=0s, B at t=10s, A at t=25s (open -> horizon 40s)
        (1, 1, dt(2024, 1, 1, 0, 0, 0), "A"),
        (2, 1, dt(2024, 1, 1, 0, 0, 10), "B"),
        (3, 1, dt(2024, 1, 1, 0, 0, 25), "A"),
        # user 2: two updates at the SAME µs -> zero-length first segment
        # (tiebreak order: event_id 4 then 5), then open until horizon
        (4, 2, dt(2024, 1, 1, 0, 0, 30), "A"),
        (5, 2, dt(2024, 1, 1, 0, 0, 30), "B"),
        # user 3 defines the horizon at t=40s; null state row dropped
        (6, 3, dt(2024, 1, 1, 0, 0, 40), "C"),
        (7, None, dt(2024, 1, 1, 0, 0, 35), "A"),
        (8, 3, dt(2024, 1, 1, 0, 0, 20), None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, state string"
    )
    got = {
        (r["user_id"], r["state"]): (r["n_segments"], r["total_us"])
        for r in state_durations(df, "user_id", "ts", "state").collect()
    }
    s = 1_000_000
    assert got[(1, "A")] == (2, 10 * s + 15 * s)  # 0-10s and 25-40s
    assert got[(1, "B")] == (1, 15 * s)  # 10-25s
    assert got[(2, "A")] == (1, 0)  # zero-length tie segment
    assert got[(2, "B")] == (1, 10 * s)  # 30-40s
    assert got[(3, "C")] == (1, 0)  # horizon row itself
    assert (None, "A") not in got and (3, None) not in got
    with pytest.raises(ValueError, match="unknown column"):
        state_durations(df, "user_id", "ts", "nope")


def test_apply_changelog_retracts_updates_and_guards(spark):
    """Full retract-stream semantics: insert, delete, update (D+I),
    full retraction drops the key, negative count raises in plan,
    unknown op raises in plan."""
    from pynomaly_spark.cdc import apply_changelog
    import pytest as _pytest

    base = spark.createDataFrame(
        [("a", 2, 30), ("b", 1, 5)], "k string, n long, s long"
    )
    log = spark.createDataFrame(
        [("a", "I", 7),            # insert
         ("a", "D", 10),           # delete one of a's rows
         ("b", "D", 5),            # fully retract b
         ("c", "I", 1), ("c", "I", 2)],   # brand-new key
        "k string, op string, s long",
    )
    got = {r["k"]: (r["n"], r["s"])
           for r in apply_changelog(base, log, ["k"], count_col="n",
                                    sum_cols=["s"]).collect()}
    assert got == {"a": (2, 27), "c": (2, 3)}   # b dropped
    bad = spark.createDataFrame([("a", "D", 1)] * 3, "k string, op string, s long")
    with _pytest.raises(Exception, match="negative count"):
        apply_changelog(base, bad, ["k"], count_col="n",
                        sum_cols=["s"]).collect()
    weird = spark.createDataFrame([("a", "X", 1)], "k string, op string, s long")
    with _pytest.raises(Exception, match="unknown op"):
        apply_changelog(base, weird, ["k"], count_col="n",
                        sum_cols=["s"]).collect()
    with _pytest.raises(ValueError, match="base missing"):
        apply_changelog(base.drop("n"), log, ["k"], count_col="n",
                        sum_cols=["s"])
