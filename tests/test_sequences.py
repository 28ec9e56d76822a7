"""sequences.transition_counts / cusum_flags + features.rolling_distinct.

Cross-engine value parity lives in the oracle gate (events_transitions,
events_cusum, events_rolling_distinct); these tests pin operator
semantics on hand-built frames: lag-over-null skipping, the
cumsum-minus-running-min identity against a literal Python recursion,
alarm timing, cover-expansion window membership, and shuffle counts.
"""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from pynomaly_spark.features import rolling_distinct
from pynomaly_spark.sequences import cusum_flags, transition_counts


def _ts(s: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )


# --------------------------------------------------------------------------
# transition_counts
# --------------------------------------------------------------------------

def test_transitions_basic_and_null_skip(spark):
    df = _ev(spark, [
        (1, 1, _ts(0), "a", 1.0),
        (2, 1, _ts(1), None, 1.0),   # skipped: a->b still counts
        (3, 1, _ts(2), "b", 1.0),
        (4, 1, _ts(3), "a", 1.0),
        (5, 2, _ts(0), "b", 1.0),    # first event anchors no pair
        (6, 2, _ts(1), "a", 1.0),
        (7, None, _ts(0), "a", 1.0),  # null key dropped
    ])
    out = {
        (r["prev_state"], r["curr_state"]): r
        for r in transition_counts(df, "user_id", "ts", "event_type").collect()
    }
    assert set(out) == {("a", "b"), ("b", "a")}
    assert out[("a", "b")]["n_pair"] == 1 and out[("a", "b")]["n_prev"] == 1
    assert out[("b", "a")]["n_pair"] == 2 and out[("b", "a")]["n_prev"] == 2
    assert out[("a", "b")]["p6"] == 1.0


def test_transitions_probabilities_sum_to_one(spark):
    rng = random.Random(7)
    rows = [
        (i, i % 13, _ts(i), "abc"[rng.randrange(3)], 0.0)
        for i in range(400)
    ]
    out = transition_counts(_ev(spark, rows), "user_id", "ts", "event_type")
    sums = (
        out.groupBy("prev_state")
        .agg(F.sum("p6").alias("tot"), F.sum("n_pair").alias("n"),
             F.min("n_prev").alias("np"))
        .collect()
    )
    for r in sums:
        assert abs(r["tot"] - 1.0) < 1e-5
        assert r["n"] == r["np"]


def test_transitions_tie_order_uses_tiebreak(spark):
    # two events at the SAME microsecond: event_id orders them
    df = _ev(spark, [
        (2, 1, _ts(0), "b", 0.0),
        (1, 1, _ts(0), "a", 0.0),
    ])
    out = transition_counts(df, "user_id", "ts", "event_type").collect()
    assert len(out) == 1
    assert (out[0]["prev_state"], out[0]["curr_state"]) == ("a", "b")


# --------------------------------------------------------------------------
# cusum_flags
# --------------------------------------------------------------------------

def _py_cusum(cents, k):
    c, out = 0, []
    for x in cents:
        c = max(0, c + (x - k))
        out.append(c)
    return out


def test_cusum_matches_literal_recursion(spark):
    rng = random.Random(42)
    k, thr = 500, 2_000
    rows, expect = [], {}
    eid = 0
    for uid in range(6):
        cents = [rng.randrange(0, 1500) for _ in range(50)]
        for i, c in enumerate(cents):
            rows.append((eid, uid, _ts(i), "e", c / 100.0))
            eid += 1
        cs = _py_cusum(cents, k)
        first = next((i for i, v in enumerate(cs) if v > thr), None)
        expect[uid] = (max(cs), int(first is not None), first)
    out = {
        r["key"]: r
        for r in cusum_flags(
            _ev(spark, rows), "user_id", "ts", "value", k, thr
        ).collect()
    }
    assert set(out) == set(expect)
    for uid, (mx, alarm, first) in expect.items():
        r = out[uid]
        assert r["max_cusum"] == mx and r["alarm"] == alarm
        if first is None:
            assert r["first_alarm_us"] is None
        else:
            base = int(_ts(first).timestamp() * 1_000_000)
            assert r["first_alarm_us"] == base


def test_cusum_null_rows_dropped_and_threshold_validated(spark):
    df = _ev(spark, [
        (1, 1, _ts(0), "e", 10.0),
        (2, 1, _ts(1), "e", None),
        (3, None, _ts(2), "e", 10.0),
    ])
    out = cusum_flags(df, "user_id", "ts", "value", 0, 1).collect()
    assert len(out) == 1 and out[0]["n_events"] == 1
    with pytest.raises(ValueError, match="threshold_cents"):
        cusum_flags(df, "user_id", "ts", "value", 0, 0)


def test_cusum_single_shuffle(spark):
    df = _ev(spark, [(1, 1, _ts(0), "e", 1.0)])
    plan = (
        cusum_flags(df, "user_id", "ts", "value", 100, 1000)
        ._jdf.queryExecution().optimizedPlan().numberedTreeString()
    )
    # the two stacked windows + the rollup must share ONE key shuffle:
    # both windows partition by the key and the final groupBy is on the
    # same key, so there is exactly one RepartitionByExpression/Exchange
    assert plan.count("Window") == 2
    exec_plan = (
        cusum_flags(df, "user_id", "ts", "value", 100, 1000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert exec_plan.count("Exchange hashpartitioning") == 1


# --------------------------------------------------------------------------
# rolling_distinct
# --------------------------------------------------------------------------

def _day(d: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=d, hours=3)


def test_rolling_distinct_brute_force(spark):
    rng = random.Random(9)
    rows = []
    eid = 0
    obs = []
    for _ in range(300):
        g = "xy"[rng.randrange(2)]
        uid = rng.randrange(12)
        d = rng.randrange(15)
        rows.append((eid, uid, _day(d), g, 0.0))
        obs.append((g, uid, d))
        eid += 1
    out = {
        (r["group"], r["bucket"]): (r["u_bucket"], r["u_window"])
        for r in rolling_distinct(
            _ev(spark, rows), "event_type", "ts", "user_id", 7
        ).collect()
    }
    days = {(g, d) for g, _, d in obs}
    assert len(out) == len(days)
    for g, d in days:
        u1 = {u for gg, u, dd in obs if gg == g and dd == d}
        u7 = {u for gg, u, dd in obs if gg == g and d - 6 <= dd <= d}
        bucket = int(_day(d).timestamp() * 1_000_000) // (86_400 * 1_000_000)
        assert out[(g, bucket)] == (len(u1), len(u7))


def test_rolling_distinct_window_one_equals_per_bucket(spark):
    rows = [
        (1, 1, _day(0), "a", 0.0),
        (2, 2, _day(0), "a", 0.0),
        (3, 1, _day(3), "a", 0.0),
    ]
    out = rolling_distinct(_ev(spark, rows), "event_type", "ts", "user_id", 1)
    for r in out.collect():
        assert r["u_bucket"] == r["u_window"]


def test_rolling_distinct_only_observed_buckets(spark):
    # user active day 0 only; day 1..6 have no events -> no output rows
    rows = [(1, 1, _day(0), "a", 0.0), (2, 1, _day(10), "a", 0.0)]
    out = rolling_distinct(
        _ev(spark, rows), "event_type", "ts", "user_id", 7
    ).collect()
    assert len(out) == 2
    assert all(r["u_bucket"] == 1 and r["u_window"] == 1 for r in out)


def test_rolling_distinct_validates_window(spark):
    df = _ev(spark, [(1, 1, _day(0), "a", 0.0)])
    with pytest.raises(ValueError, match="window_buckets"):
        rolling_distinct(df, "event_type", "ts", "user_id", 0)


# --------------------------------------------------------------------------
# path_counts
# --------------------------------------------------------------------------

def test_path_counts_trigrams_and_rank(spark):
    from pynomaly_spark.sequences import path_counts

    rows = [
        # user 1: a b c a b c -> trigrams abc, bca, cab, abc
        (1, 1, _ts(0), "a", 0.0), (2, 1, _ts(1), "b", 0.0),
        (3, 1, _ts(2), "c", 0.0), (4, 1, _ts(3), "a", 0.0),
        (5, 1, _ts(4), "b", 0.0), (6, 1, _ts(5), "c", 0.0),
        # user 2: a b -> too short, no trigram
        (7, 2, _ts(0), "a", 0.0), (8, 2, _ts(1), "b", 0.0),
    ]
    out = path_counts(_ev(spark, rows), "user_id", "ts", "event_type",
                      depth=3, top_k=10).collect()
    got = {(r["s0"], r["s1"], r["s2"]): (r["n_paths"], r["rank"])
           for r in out}
    assert got == {
        ("a", "b", "c"): (2, 1),
        ("b", "c", "a"): (1, 2),
        ("c", "a", "b"): (1, 3),
    }


def test_path_counts_null_state_skipped_and_validation(spark):
    import pytest as _pytest

    from pynomaly_spark.sequences import path_counts

    rows = [
        (1, 1, _ts(0), "a", 0.0), (2, 1, _ts(1), None, 0.0),
        (3, 1, _ts(2), "b", 0.0), (4, 1, _ts(3), "c", 0.0),
    ]
    out = path_counts(_ev(spark, rows), "user_id", "ts", "event_type",
                      depth=3, top_k=5).collect()
    assert {(r["s0"], r["s1"], r["s2"]) for r in out} == {("a", "b", "c")}
    with _pytest.raises(ValueError, match="depth"):
        path_counts(_ev(spark, rows), "user_id", "ts", "event_type", depth=1)


# --------------------------------------------------------------------------
# cdc.merge_aggs
# --------------------------------------------------------------------------

def test_merge_aggs_equals_full_recompute(spark):
    import random

    from pynomaly_spark.cdc import merge_aggs
    from pyspark.sql import functions as F2

    rng = random.Random(23)
    rows = [
        (i, rng.randrange(5), _ts(i), "t" + str(rng.randrange(3)),
         rng.randrange(1000) / 100.0)
        for i in range(300)
    ]
    ev = _ev(spark, rows)

    def rollup(df):
        return df.groupBy("event_type").agg(
            F2.count(F2.lit(1)).alias("n"),
            F2.sum("value").alias("sv"),
            F2.min("value").alias("mn"),
            F2.max("value").alias("mx"),
        )

    base, delta = ev.where("event_id < 200"), ev.where("event_id >= 200")
    merged = merge_aggs(
        rollup(base), rollup(delta), ["event_type"],
        count_cols=["n"], sum_cols=["sv"], min_cols=["mn"], max_cols=["mx"],
    )
    full = rollup(ev)
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, full.collect()))
    assert [x[0] for x in a] == [x[0] for x in b]
    for ra, rb in zip(a, b):
        assert ra[1] == rb[1] and abs(ra[2] - rb[2]) < 1e-9
        assert ra[3] == rb[3] and ra[4] == rb[4]


def test_merge_aggs_new_keys_pass_through_and_validation(spark):
    import pytest as _pytest

    from pynomaly_spark.cdc import merge_aggs

    base = spark.createDataFrame([("a", 2)], "k string, n long")
    delta = spark.createDataFrame([("b", 3)], "k string, n long")
    out = {
        r["k"]: r["n"]
        for r in merge_aggs(base, delta, ["k"], count_cols=["n"]).collect()
    }
    assert out == {"a": 2, "b": 3}
    with _pytest.raises(ValueError, match="no metric"):
        merge_aggs(base, delta, ["k"])
    with _pytest.raises(ValueError, match="missing columns"):
        merge_aggs(base, delta, ["k"], count_cols=["nope"])


def test_cooccurrence_pairs_support_lift_and_viral_guard(spark):
    """Hand-checked pair supports and lift on 4 baskets; duplicate
    basket lines don't inflate; a viral basket is dropped whole."""
    from pynomaly_spark.sequences import cooccurrence_pairs
    import pytest as _pytest

    rows = (
        [(1, "a"), (1, "b"), (1, "b"), (1, "c"),      # dup b line
         (2, "a"), (2, "b"),
         (3, "a"), (3, "c"),
         (4, "d"), (None, "a"), (5, None)]
    )
    df = spark.createDataFrame(rows, "bk long, item string")
    got = {(r["item_a"], r["item_b"]): (r["support"], r["n_a"], r["n_b"], r["lift"])
           for r in cooccurrence_pairs(df, "bk", "item", min_support=2).collect()}
    # N=4 baskets; a in 3, b in 2, c in 2; support ab=2, ac=2, bc=1(<minsup)
    assert got == {
        ("a", "b"): (2, 3, 2, 4 * 2 / (3 * 2)),
        ("a", "c"): (2, 3, 2, 4 * 2 / (3 * 2)),
    }
    # viral basket: basket 1 has 3 distinct items; cap at 2 drops it
    capped = {(r["item_a"], r["item_b"]): r["support"]
              for r in cooccurrence_pairs(
                  df, "bk", "item", min_support=1, max_basket=2).collect()}
    assert capped == {("a", "b"): 1, ("a", "c"): 1}
    with _pytest.raises(ValueError, match="unknown column"):
        cooccurrence_pairs(df, "bk", "nope")
    with _pytest.raises(ValueError, match="min_support"):
        cooccurrence_pairs(df, "bk", "item", min_support=0)


def test_haar_energy_hand_values(spark):
    """Series at buckets 0..3 = [4, 0, 4, 0]:
    level 1 (span 2): blocks (4-0)=4, (4-0)=4 -> energy 32, both nonzero
    level 2 (span 4): one block (4+0)-(4+0)=0 -> energy 0, zero nonzero.
    A missing bucket behaves as 0: same series with bucket 1 and 3
    absent gives identical details."""
    from pynomaly_spark.sequences import haar_energy
    import pytest as _pytest

    dense = spark.createDataFrame(
        [(0, 4), (1, 0), (2, 4), (3, 0)], "t long, x long"
    )
    out = {r["level"]: r.asDict() for r in haar_energy(dense, "t", "x", levels=2).collect()}
    assert out[1]["energy"] == 32 and out[1]["n_nonzero_blocks"] == 2
    assert out[1]["n_blocks"] == 2 and out[1]["block_span"] == 2
    assert out[2]["energy"] == 0 and out[2]["n_nonzero_blocks"] == 0
    sparse = spark.createDataFrame([(0, 4), (2, 4)], "t long, x long")
    out2 = {r["level"]: r["energy"] for r in haar_energy(sparse, "t", "x", levels=2).collect()}
    assert out2 == {1: 32, 2: 0}
    with _pytest.raises(ValueError, match="levels"):
        haar_energy(dense, "t", "x", levels=0)
    with _pytest.raises(ValueError, match="unknown column"):
        haar_energy(dense, "nope", "x")


def test_events_conformance_allowed_flags(spark):
    """The declared protocol flags exactly the non-listed transitions;
    shares are truncating 6-dp of the prev-state's outgoing total."""
    import os

    from pynomaly_spark.queries import QUERIES, _CONFORM_ALLOWED

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        import pytest as _pytest

        _pytest.skip("testdata missing")
    rows = QUERIES["events_conformance"](spark, sf).collect()
    allowed = set(_CONFORM_ALLOWED)
    assert rows
    by_prev = {}
    for r in rows:
        assert r["allowed"] == (
            1 if (r["prev_state"], r["curr_state"]) in allowed else 0
        )
        assert r["share_6dp"] == (r["n"] * 1000000) // r["n_prev"]
        by_prev.setdefault(r["prev_state"], 0)
        by_prev[r["prev_state"]] += r["n"]
    for r in rows:
        assert r["n_prev"] == by_prev[r["prev_state"]]
    # synthetic uniform transitions: both allowed and disallowed edges
    # must be present or the audit is degenerate
    assert any(r["allowed"] == 0 for r in rows)
    assert any(r["allowed"] == 1 for r in rows)


def test_events_entropy_deterministic_and_uniform_limits(spark, tmp_path):
    """A deterministic successor gives entropy 0; a perfectly uniform
    2-way split gives round(ln 2 * 1e6) = 693147."""
    import datetime as dt

    from pynomaly_spark.queries import QUERIES

    base = dt.datetime(2020, 1, 1)
    rows = []
    ev = 0
    # user 1: a->b four times (deterministic)
    for i in range(4):
        rows.append((ev, base + dt.timedelta(hours=ev), 1, "a", None)); ev += 1
        rows.append((ev, base + dt.timedelta(hours=ev), 1, "b", None)); ev += 1
    # user 2: c->x, c->y alternating (x/y always return to c) ->
    # uniform 2-way split from c, disjoint from user 1's states
    for i in range(4):
        rows.append((ev, base + dt.timedelta(hours=ev), 2, "c", None)); ev += 1
        rows.append(
            (ev, base + dt.timedelta(hours=ev), 2, "x" if i % 2 else "y", None)
        ); ev += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{sf_dir}/events.parquet")
    out = {
        r["prev_state"]: r.asDict()
        for r in QUERIES["events_entropy"](spark, sf_dir).collect()
    }
    assert out["a"]["entropy_6dp"] == 0 and out["a"]["n_successors"] == 1
    # per-TERM 6-dp rounding (the operator's cross-engine contract):
    # 2 * round(-0.5*ln(0.5)*1e6) = 2 * 346574 = 693148, one ulp above
    # round(ln(2)*1e6) = 693147
    assert out["c"]["entropy_6dp"] == 693148
    assert out["c"]["n_successors"] == 2
