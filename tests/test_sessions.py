"""Gap-based sessionization operator."""

import datetime as dt

import pytest

from pynomaly_spark.sessions import session_stats, sessionize


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute, seconds=second)


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        rows = [
            (1, 7, _t(0), 1.0),
            (2, 7, _t(5), 2.0),    # same session (5 min < 30)
            (3, 7, _t(50), 3.0),   # 45-min silence: new session
            (4, 9, _t(1), 4.0),    # other user: own session numbering
        ]
        out = sessionize(_events(spark, rows), gap_minutes=30).collect()
        sess = {r["event_id"]: (r["user_id"], r["sess_idx"]) for r in out}
        assert sess == {1: (7, 1), 2: (7, 1), 3: (7, 2), 4: (9, 1)}

    def test_boundary_is_strictly_greater(self, spark):
        # a silence of EXACTLY the gap does not split
        rows = [(1, 7, _t(0), 1.0), (2, 7, _t(30), 1.0), (3, 7, _t(60, 1), 1.0)]
        out = sessionize(_events(spark, rows), gap_minutes=30).collect()
        idx = {r["event_id"]: r["sess_idx"] for r in out}
        assert idx == {1: 1, 2: 1, 3: 2}

    def test_equal_timestamps_use_tiebreak(self, spark):
        rows = [(2, 7, _t(0), 1.0), (1, 7, _t(0), 1.0)]
        a = sessionize(_events(spark, rows), gap_minutes=30).collect()
        b = sessionize(
            _events(spark, rows).repartition(3), gap_minutes=30
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_stats_counts_duration_and_cents(self, spark):
        rows = [
            (1, 7, _t(0), 1.25),
            (2, 7, _t(10), 2.50),
            (3, 7, _t(50), 0.75),
        ]
        st = {
            (r["user_id"], r["sess_idx"]): r
            for r in session_stats(
                _events(spark, rows), gap_minutes=30, value_col="value"
            ).collect()
        }
        first = st[(7, 1)]
        assert first["n_events"] == 2
        assert first["duration_us"] == 10 * 60 * 1_000_000
        assert first["value_cents"] == 375
        assert st[(7, 2)]["n_events"] == 1
        assert st[(7, 2)]["duration_us"] == 0

    def test_bad_gap_raises(self, spark):
        with pytest.raises(ValueError):
            sessionize(_events(spark, []), gap_minutes=0)


def _fevents(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


class TestFunnel:
    def test_ordered_steps_and_strictness(self, spark):
        from pynomaly_spark.sessions import funnel_counts, funnel_steps

        rows = [
            # user 1: completes view -> click -> purchase in order
            (1, 1, _t(0), "view"),
            (2, 1, _t(1), "click"),
            (3, 1, _t(2), "purchase"),
            # user 2: click BEFORE first view never counts; a later
            # click does, but no purchase after it
            (4, 2, _t(0), "click"),
            (5, 2, _t(1), "view"),
            (6, 2, _t(0, 30), "purchase"),  # before the view: ignored
            (7, 2, _t(3), "click"),
            # user 3: click at the EXACT view microsecond — strictly
            #-after contract says it does not advance
            (8, 3, _t(5), "view"),
            (9, 3, _t(5), "click"),
            # user 4: never views
            (10, 4, _t(0), "purchase"),
        ]
        steps = ["view", "click", "purchase"]
        per_user = {
            r["user_id"]: (r["step1_us"], r["step2_us"], r["step3_us"])
            for r in funnel_steps(_fevents(spark, rows), steps).collect()
        }
        assert per_user[1][2] is not None
        assert per_user[2][1] is not None and per_user[2][2] is None
        assert per_user[3][0] is not None and per_user[3][1] is None
        assert per_user[4][0] is None
        counts = {
            r["step"]: r["users_reached"]
            for r in funnel_counts(_fevents(spark, rows), steps).collect()
        }
        assert counts == {1: 3, 2: 2, 3: 1}

    def test_earliest_qualifying_event_wins(self, spark):
        from pynomaly_spark.sessions import funnel_steps

        rows = [
            (1, 1, _t(0), "view"),
            (2, 1, _t(10), "click"),
            (3, 1, _t(4), "click"),   # earlier qualifying click
            (4, 1, _t(5), "purchase"),  # after t(4) click: completes
        ]
        r = funnel_steps(
            _fevents(spark, rows), ["view", "click", "purchase"]
        ).collect()[0]
        base = r["step1_us"]
        assert r["step2_us"] - base == 4 * 60_000_000
        assert r["step3_us"] - base == 5 * 60_000_000

    def test_needs_two_steps(self, spark):
        from pynomaly_spark.sessions import funnel_steps

        with pytest.raises(ValueError, match="2 steps"):
            funnel_steps(_fevents(spark, []), ["view"])

    def test_single_exchange_plan(self, spark):
        """All step windows must share ONE user-keyed exchange — a
        funnel as K self-joins would be K exchanges of the event table."""
        from pynomaly_spark.sessions import funnel_steps

        rows = [(1, 1, _t(0), "view"), (2, 1, _t(1), "click")]
        plan = funnel_steps(
            _fevents(spark, rows), ["view", "click", "purchase"]
        )._jdf.queryExecution().optimizedPlan().numberedTreeString()
        joins = plan.lower().count("join")
        assert joins == 0, plan


def test_concurrency_profile_handchecked_sweep(spark):
    """Intervals with shared boundaries: a start at the exact instant
    another interval ends counts as overlapping (closed intervals);
    peak/level/boundary counts hand-verified per hour bucket."""
    from pynomaly_spark.sessions import concurrency_profile
    import pytest as _pytest

    H = 3_600_000_000
    ivs = [
        (0, 2 * H),              # spans hours 0..2
        (H, H + 10),             # inside hour 1
        (2 * H, 3 * H),          # starts exactly when #1 ends
        (10 * H, 10 * H),        # zero-length: peak 1 at its instant
    ]
    df = spark.createDataFrame(ivs, "s long, e long")
    got = {r["bucket"]: (r["peak_concurrency"], r["level_after"],
                         r["n_boundary_instants"])
           for r in concurrency_profile(df, "s", "e").collect()}
    assert got[0] == (1, 1, 1)        # one start
    assert got[1] == (2, 1, 2)        # starts+ends of the short one
    assert got[2] == (2, 1, 1)        # tie instant: start before end
    assert got[3] == (1, 0, 1)        # last end
    assert got[10] == (1, 0, 1)       # zero-length blip
    # malformed interval raises in plan
    bad = spark.createDataFrame([(5, 1)], "s long, e long")
    with _pytest.raises(Exception, match="end < start"):
        concurrency_profile(bad, "s", "e").collect()
    with _pytest.raises(ValueError, match="unknown column"):
        concurrency_profile(df, "s", "nope")
