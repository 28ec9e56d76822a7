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
