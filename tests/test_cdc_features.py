"""CDC (cdc.latest_state / scd2_history) + trailing-range features
(features.rolling_range_aggs).

Cross-engine value parity for the three registry queries lives in the
oracle gate; these tests pin operator semantics on hand-built frames:
atomic last-version selection, tie handling, interval chaining, the
no-Window compaction plan, RANGE boundary inclusivity, and null
behavior.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pynomaly_spark.cdc import latest_state, scd2_history
from pynomaly_spark.features import rolling_range_aggs


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _updates_df(spark):
    rows = [
        # user 1: three versions, last at s=200
        (1, 1, _ts(0), "a", 1.0),
        (2, 1, _ts(100), "b", 2.0),
        (3, 1, _ts(200), "c", 3.0),
        # user 2: timestamp tie at s=50 -> event_id breaks it
        (4, 2, _ts(50), "x", 4.0),
        (5, 2, _ts(50), "y", 5.0),
        # keyless update: targets no entity
        (6, None, _ts(10), "z", 6.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )


# --------------------------------------------------------------------------
# latest_state
# --------------------------------------------------------------------------

def test_latest_state_picks_last_version_atomically(spark):
    out = {
        r["user_id"]: r
        for r in latest_state(
            _updates_df(spark), "user_id", "ts", ["event_type", "value"]
        ).collect()
    }
    assert set(out) == {1, 2}  # NULL key dropped
    assert out[1]["event_type"] == "c" and out[1]["value"] == 3.0
    assert out[1]["n_updates"] == 3
    assert out[1]["first_us"] < out[1]["last_us"]
    # tie at the same µs: larger event_id wins
    assert out[2]["event_type"] == "y"
    assert out[2]["first_us"] == out[2]["last_us"]


def test_latest_state_is_one_aggregate_no_window(spark):
    # the compaction claim: map-side-combining max_by, never a window
    # sort of the update history
    df = _updates_df(spark)
    plan = (
        latest_state(df, "user_id", "ts", ["event_type"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan


def test_latest_state_requires_attrs(spark):
    with pytest.raises(ValueError):
        latest_state(_updates_df(spark), "user_id", "ts", [])


# --------------------------------------------------------------------------
# scd2_history
# --------------------------------------------------------------------------

def test_scd2_intervals_chain_and_one_current(spark):
    out = scd2_history(
        _updates_df(spark), "user_id", "ts", ["event_type"]
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert set(by_user) == {1, 2}
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        # intervals chain: each version ends where the next begins
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]
            assert not a["is_current"]
        assert rows[-1]["is_current"] and rows[-1]["valid_to_us"] is None
    # tie at the same µs: zero-length first interval, event_id order
    u2 = by_user[2]
    assert u2[0]["event_type"] == "x" and u2[0]["valid_to_us"] == u2[0]["valid_from_us"]
    assert u2[1]["event_type"] == "y"


def test_scd2_point_in_time_lookup_exact(spark):
    # [from, to) semantics: a lookup at any instant matches exactly one
    # version per key
    out = scd2_history(
        _updates_df(spark), "user_id", "ts", ["event_type"]
    )
    for probe_s in (0, 99, 100, 150, 200, 999):
        us = int(_ts(probe_s).timestamp() * 1_000_000)
        hits = (
            out.where(F.col("user_id") == 1)
            .where(
                (F.col("valid_from_us") <= us)
                & (F.col("valid_to_us").isNull() | (F.col("valid_to_us") > us))
            )
            .count()
        )
        assert hits == 1, probe_s


# --------------------------------------------------------------------------
# rolling_range_aggs
# --------------------------------------------------------------------------

def test_rolling_boundary_inclusive_and_exact_cents(spark):
    # window = 1 minute; events at 0s, 60s (exactly at the boundary ->
    # included), 61s (0s now outside, 60s inside)
    rows = [
        (1, 7, _ts(0), 1.10),
        (2, 7, _ts(60), 2.25),
        (3, 7, _ts(61), 4.00),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {
        r["event_id"]: r
        for r in rolling_range_aggs(
            df, "user_id", "ts", "value", window_minutes=1
        ).collect()
    }
    assert (out[1]["trail_cnt"], out[1]["trail_sum_cents"]) == (1, 110)
    assert (out[2]["trail_cnt"], out[2]["trail_sum_cents"]) == (2, 335)
    assert (out[3]["trail_cnt"], out[3]["trail_sum_cents"]) == (2, 625)
    assert out[3]["trail_max_cents"] == 400


def test_rolling_ties_share_frames_and_null_value(spark):
    # two events at the identical µs are RANGE peers: both frames see
    # both rows; a NULL value counts as activity but not in sum/max
    rows = [
        (1, 9, _ts(0), 1.00),
        (2, 9, _ts(0), None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {
        r["event_id"]: r
        for r in rolling_range_aggs(
            df, "user_id", "ts", "value", window_minutes=1
        ).collect()
    }
    for eid in (1, 2):
        assert out[eid]["trail_cnt"] == 2
        assert out[eid]["trail_sum_cents"] == 100
        assert out[eid]["trail_max_cents"] == 100
    assert out[2]["value_cents"] is None


def test_rolling_validates_window(spark):
    df = spark.createDataFrame(
        [(1, 1, _ts(0), 1.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    with pytest.raises(ValueError):
        rolling_range_aggs(df, "user_id", "ts", "value", window_minutes=0)


# --------------------------------------------------------------------------
# snapshot_diff
# --------------------------------------------------------------------------

def test_snapshot_diff_statuses(spark):
    from pynomaly_spark.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "x")],
        "k long, v string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d"), (None, "y")],
        "k long, v string",
    )
    out = {
        r["status"]: r["n_rows"]
        for r in snapshot_diff(old, new, "k", ["v"]).collect()
    }
    # NULL keys excluded on both sides; 1 unchanged, 2 changed,
    # 3 removed, 4 added
    assert out == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_null_vs_empty_not_collapsed(spark):
    from pynomaly_spark.cdc import snapshot_diff

    old = spark.createDataFrame([(1, None, "x")], "k long, a string, b string")
    new = spark.createDataFrame([(1, "", "x")], "k long, a string, b string")
    out = {
        r["status"]: r["n_rows"]
        for r in snapshot_diff(old, new, "k", ["a", "b"]).collect()
    }
    # a raw concat_ws would render both rows "x"; the sentinel keeps
    # NULL distinct from empty string
    assert out == {"changed": 1}
    import pytest

    with pytest.raises(ValueError):
        snapshot_diff(old, new, "k", [])


# --------------------------------------------------------------------------
# quantile_bins
# --------------------------------------------------------------------------

def test_quantile_bins_two_level_equals_naive_global_rank(spark):
    from pyspark.sql import Window

    from pynomaly_spark.features import quantile_bins

    # values engineered to straddle many coarse buckets, with ties
    df = spark.range(500).select(
        F.col("id"),
        ((F.col("id") * 37) % 211).cast("double").alias("x"),
    )
    got = {
        (r["id"], r["rank"], r["bin"])
        for r in quantile_bins(df, "x", "id", k=7, coarse_width=16).collect()
    }
    w = Window.orderBy("x", "id")
    naive = df.select(
        "id", F.row_number().over(w).alias("rank")
    ).withColumn("bin", F.expr("((rank - 1) * 7) div 500"))
    want = {(r["id"], r["rank"], r["bin"]) for r in naive.collect()}
    assert got == want


def test_quantile_bins_sizes_differ_at_most_one(spark):
    from pynomaly_spark.features import quantile_bins

    df = spark.range(103).select(
        F.col("id"), F.col("id").cast("double").alias("x")
    )
    sizes = [
        r["n"]
        for r in quantile_bins(df, "x", "id", k=10)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(sizes) == 10 and sum(sizes) == 103
    assert max(sizes) - min(sizes) <= 1
    import pytest

    with pytest.raises(ValueError):
        quantile_bins(df, "x", "id", k=0)
    with pytest.raises(ValueError):
        quantile_bins(df, "x", "id", coarse_width=0)


# --------------------------------------------------------------------------
# gapfill_ffill
# --------------------------------------------------------------------------

def _gap_events(spark):
    rows = [
        # user 1, bucket 0: two obs — later ts wins the bucket
        (1, 1, _ts(0), "a", 1.00),
        (2, 1, _ts(30), "a", 2.00),
        # user 1, bucket 2 (t=7400s at 60-min buckets); bucket 1 is a gap
        (3, 1, _ts(7400), "a", 3.00),
        # user 2: same-µs tie -> larger event_id wins
        (10, 2, _ts(50), "a", 4.00),
        (11, 2, _ts(50), "a", 5.00),
        # user 3: only a NULL value -> no observation, key absent
        (20, 3, _ts(0), "a", None),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )


def test_gapfill_buckets_gaps_and_ffill(spark):
    from pynomaly_spark.features import gapfill_ffill

    out = {
        (r["key"], r["bucket"] - 473352): r
        for r in gapfill_ffill(
            _gap_events(spark), "user_id", "ts", "value",
            bucket_minutes=60.0,
        ).collect()
    }
    # 2024-01-01T00:00 is hour-bucket 473352 exactly (epoch-µs div 3.6e9)
    u1 = [out[(1, b)] for b in (0, 1, 2)]
    assert [r["n_obs"] for r in u1] == [2, 0, 1]
    assert [r["is_gap"] for r in u1] == [0, 1, 0]
    assert [r["obs_cents"] for r in u1] == [200, None, 300]
    assert [r["ffill_cents"] for r in u1] == [200, 200, 300]
    # tie: event_id 11 (500 cents) wins over 10 at the same µs
    assert out[(2, 0)]["obs_cents"] == 500
    # user 3 had only a NULL value: no rows at all
    assert not any(k == 3 for k, _ in out)


def test_gapfill_guard_and_validation(spark):
    from pynomaly_spark.features import gapfill_ffill
    from pyspark.errors import SparkRuntimeException

    df = _gap_events(spark)
    with pytest.raises(ValueError):
        gapfill_ffill(df, "user_id", "ts", "value", bucket_minutes=0)
    with pytest.raises(ValueError):
        gapfill_ffill(df, "user_id", "ts", "value", max_buckets=0)
    # user 1 spans 3 buckets; max_buckets=2 must raise in-plan
    with pytest.raises(SparkRuntimeException, match="gapfill_ffill"):
        gapfill_ffill(
            df, "user_id", "ts", "value", bucket_minutes=60.0, max_buckets=2
        ).collect()


# --------------------------------------------------------------------------
# decayed_sum
# --------------------------------------------------------------------------

def test_decayed_sum_exact_dyadic_and_clamp(spark):
    from pynomaly_spark.features import decayed_sum

    day = 86_400
    rows = [
        # user 1 holds the global max ts (ref): ages 0, 1, and 25->clamp 20
        (1, 1, _ts(25 * day), "a", 1.00),
        (2, 1, _ts(24 * day), "a", 1.00),
        (3, 1, _ts(0), "a", 1.00),
        # user 2: age 2 relative to user 1's ref
        (4, 2, _ts(23 * day), "a", 1.00),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    out = {
        r["user_id"]: r
        for r in decayed_sum(
            df, ["user_id"], "ts", "value", half_life_days=1.0, max_age=20
        ).collect()
    }
    # exact integers: 100·2^20 + 50·2^20 + 100·2^-20·2^20
    assert out[1]["decay_e"] == 100 * 2**20 + 50 * 2**20 + 100
    assert (out[1]["n_events"], out[1]["sum_cents"]) == (3, 300)
    assert out[2]["decay_e"] == 25 * 2**20
    with pytest.raises(ValueError):
        decayed_sum(df, ["user_id"], "ts", "value", half_life_days=0)
    with pytest.raises(ValueError):
        decayed_sum(df, ["user_id"], "ts", "value", max_age=31)


# --------------------------------------------------------------------------
# pivot_agg
# --------------------------------------------------------------------------

def test_pivot_agg_values_and_single_aggregate(spark):
    from pynomaly_spark.features import pivot_agg

    rows = [
        (1, "click", 10), (1, "click", None), (1, "view", 5),
        (2, "purchase", 7),
        (2, "weird", 9),   # unlisted value: anchors key 2, no column
        (3, None, 4),      # NULL pivot value: anchors key 3 only
    ]
    df = spark.createDataFrame(rows, "u long, et string, cents long")
    out = pivot_agg(df, ["u"], "et", ["click", "view", "purchase"], "cents")
    assert out.columns == [
        "u", "click_n", "click_sum", "view_n", "view_sum",
        "purchase_n", "purchase_sum",
    ]
    got = sorted(tuple(r) for r in out.collect())
    # NULL cents counts toward _n (the event happened) but adds 0
    assert got == [
        (1, 2, 10, 1, 5, 0, 0),
        (2, 0, 0, 0, 0, 1, 7),
        (3, 0, 0, 0, 0, 0, 0),
    ]
    # ONE logical aggregate — the reason this is not DataFrame.pivot
    # (a multi-agg pivot plans two aggregate levels + two exchanges)
    opt = out._jdf.queryExecution().optimizedPlan().numberedTreeString()
    assert opt.count("Aggregate") == 1


def test_pivot_agg_validation(spark):
    from pynomaly_spark.features import pivot_agg

    df = spark.createDataFrame([(1, "a", 1)], "u long, et string, c long")
    with pytest.raises(ValueError):
        pivot_agg(df, ["u"], "et", [], "c")
    with pytest.raises(ValueError):
        pivot_agg(df, ["u"], "et", ["a", "a"], "c")
    with pytest.raises(ValueError):
        pivot_agg(df, ["u"], "nope", ["a"], "c")


def test_target_encode_loo_exact_and_smoothed(spark):
    """LOO mean excludes the row's own label; singletons are NULL at
    m=0 and shrink to the global prior at m>0."""
    from pynomaly_spark.features import target_encode_loo
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 100),
         (5, None, 7), (6, "c", None)],
        "id long, cat string, y long",
    )
    got = {r["id"]: (r["n_peers"], r["loo_mean"])
           for r in target_encode_loo(df, "cat", "y").collect()}
    assert got[1] == (2, 25.0)          # (20+30)/2
    assert got[2] == (2, 20.0)
    assert got[3] == (2, 15.0)
    assert got[4] == (0, None)          # singleton, m=0
    assert set(got) == {1, 2, 3, 4}     # null cat / null y dropped
    prior = (10 + 20 + 30 + 100) / 4.0
    sm = {r["id"]: r["loo_mean"]
          for r in target_encode_loo(df, "cat", "y", smoothing=2.0).collect()}
    assert sm[4] == _pytest.approx(2 * prior / 2)   # pure prior
    assert sm[1] == _pytest.approx((50 + 2 * prior) / 4)
    with _pytest.raises(ValueError, match="unknown column"):
        target_encode_loo(df, "nope", "y")


def test_segment_migration_matrix_is_total(spark, tmp_path):
    """Every customer appears in exactly one matrix cell; row/col
    marginals reconcile to the per-half customer counts; absent
    edges capture churn and acquisition."""
    import datetime as dt

    from pynomaly_spark.queries import QUERIES

    base = dt.datetime(2020, 1, 1)
    rows = []
    ok = 0
    # customers 1-4 active in H1 (days 0-9); 3-6 active in H2 (90-99)
    for c in (1, 2, 3, 4):
        for d in range(c):
            rows.append((ok, float(c), c, base + dt.timedelta(days=d))); ok += 1
    for c in (3, 4, 5, 6):
        for d in range(90, 90 + c):
            rows.append((ok, float(c), c, base + dt.timedelta(days=d))); ok += 1
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_custkey long, "
        "o_orderdate timestamp"
    )
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{sf_dir}/orders.parquet")
    out = QUERIES["customer_segment_migration"](spark, sf_dir).collect()
    total = sum(r["n_customers"] for r in out)
    assert total == 6  # union of both halves' customers
    churned = sum(
        r["n_customers"] for r in out if r["seg_h2"] == "absent"
    )
    acquired = sum(
        r["n_customers"] for r in out if r["seg_h1"] == "absent"
    )
    assert churned == 2 and acquired == 2  # 1,2 churn; 5,6 acquired
    assert all(
        r["seg_h1"] != "absent" or r["seg_h2"] != "absent" for r in out
    )
