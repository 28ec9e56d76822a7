"""As-of join operator (union-tag window implementation)."""

import datetime as dt

import pytest

from pynomaly_spark.asof import asof_join


def _t(sec):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [(1, 7, _t(10)), (2, 7, _t(20)), (3, 8, _t(5)), (4, None, _t(9))],
        "id long, u long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 7, _t(10), 1.0),
            (103, 7, _t(10), 9.0),   # same instant as 100: max id wins
            (101, 7, _t(15), 2.0),
            (102, 9, _t(1), 3.0),    # other key: never visible to u=7/8
        ],
        "rid long, u long, ts timestamp, v double",
    )
    return left, right


def _by_id(df):
    return {r["id"]: r for r in df.collect()}


class TestAsofJoin:
    def test_inclusive_backward_match(self, frames):
        left, right = frames
        out = _by_id(
            asof_join(
                left, right, on=["u"], payload_cols=["rid", "v"],
                right_tiebreak="rid",
            )
        )
        # equal-instant rows match inclusively; tiebreak picks rid=103
        assert (out[1]["rid_r"], out[1]["v_r"]) == (103, 9.0)
        # latest preceding, not merely any preceding
        assert out[2]["rid_r"] == 101
        # key with no right rows, and a NULL key: no match
        assert out[3]["rid_r"] is None
        assert out[4]["rid_r"] is None

    def test_strict_excludes_equal_instant(self, frames):
        left, right = frames
        out = _by_id(
            asof_join(left, right, on=["u"], payload_cols=["rid"], strict=True)
        )
        assert out[1]["rid_r"] is None
        assert out[2]["rid_r"] == 101

    def test_tolerance_window(self, frames):
        left, right = frames
        out = _by_id(
            asof_join(
                left, right, on=["u"], payload_cols=["rid"],
                tolerance_us=4_000_000, right_tiebreak="rid",
            )
        )
        assert out[1]["rid_r"] == 103      # gap 0 <= 4s
        assert out[2]["rid_r"] is None     # gap 5s > 4s

    def test_payload_from_single_row_despite_nulls(self, spark):
        # a newer right row with a null payload field must not let an
        # older row's value bleed through (struct transport, not
        # per-column last(ignorenulls))
        left = spark.createDataFrame([(1, 7, _t(30))], "id long, u long, ts timestamp")
        right = spark.createDataFrame(
            [(100, 7, _t(10), 5.0), (101, 7, _t(20), None)],
            "rid long, u long, ts timestamp, v double",
        )
        row = asof_join(left, right, on=["u"], payload_cols=["rid", "v"]).first()
        assert row["rid_r"] == 101 and row["v_r"] is None

    def test_partition_invariance(self, frames):
        left, right = frames
        a = asof_join(left, right, on=["u"], payload_cols=["rid"], right_tiebreak="rid")
        b = asof_join(
            left.repartition(5), right.repartition(3),
            on=["u"], payload_cols=["rid"], right_tiebreak="rid",
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_single_shuffle_no_range_join(self, frames):
        # the 100-TB contract: plan must be union -> one exchange ->
        # window, never a nested-loop or inequality join
        left, right = frames
        plan = asof_join(left, right, on=["u"], payload_cols=["rid"])._jdf\
            .queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan

    def test_forward_direction(self, frames):
        left, right = frames
        out = _by_id(
            asof_join(
                left, right, on=["u"], payload_cols=["rid"],
                direction="forward", right_tiebreak="rid",
            )
        )
        # earliest at-or-after; equal instant matches inclusively (max rid)
        assert out[1]["rid_r"] == 103
        # id=2 at t=20 has no later click for u=7
        assert out[2]["rid_r"] is None
        assert out[3]["rid_r"] is None and out[4]["rid_r"] is None

    def test_forward_strict_and_tolerance(self, frames):
        left, right = frames
        strict = _by_id(
            asof_join(
                left, right, on=["u"], payload_cols=["rid"],
                direction="forward", strict=True, right_tiebreak="rid",
            )
        )
        assert strict[1]["rid_r"] == 101  # skips the equal instant, takes t=15
        tol = _by_id(
            asof_join(
                left, right, on=["u"], payload_cols=["rid"],
                direction="forward", strict=True, tolerance_us=3_000_000,
                right_tiebreak="rid",
            )
        )
        assert tol[1]["rid_r"] is None    # 5s ahead > 3s window

    def test_bad_direction_raises(self, frames):
        left, right = frames
        with pytest.raises(ValueError):
            asof_join(left, right, on=["u"], direction="nearest")

    def test_bad_tolerance_raises(self, frames):
        left, right = frames
        with pytest.raises(ValueError):
            asof_join(left, right, on=["u"], tolerance_us=-1)


class TestIntervalJoin:
    def _frames(self, spark):
        from datetime import datetime

        ev = spark.createDataFrame(
            [
                (1, "a", datetime(2024, 1, 1, 0, 30)),
                (2, "a", datetime(2024, 1, 1, 2, 30)),   # overlap zone
                (3, "a", datetime(2024, 1, 1, 5, 30)),
                (4, "a", datetime(2024, 1, 2, 0, 0)),    # no interval
                (5, "b", datetime(2024, 1, 1, 0, 30)),   # other key
                (6, None, datetime(2024, 1, 1, 0, 30)),  # null key
            ],
            ["event_id", "k", "ts"],
        )
        h = 3_600_000_000
        base = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in µs
        iv = spark.createDataFrame(
            [
                ("a", 0, base, base + 3 * h),          # [00:00, 03:00]
                ("a", 1, base + 2 * h, base + 6 * h),  # [02:00, 06:00]
            ],
            ["k", "interval_idx", "start_us", "end_us"],
        )
        return ev, iv

    def test_containment_overlap_and_null_key(self, spark):
        from pynomaly_spark.asof import interval_join

        ev, iv = self._frames(spark)
        got = sorted(
            (r.event_id, r.interval_idx)
            for r in interval_join(
                ev, iv, ["k"], bucket_us=3_600_000_000
            ).collect()
        )
        # ev1 -> iv0; ev2 in the 02:00-03:00 overlap -> BOTH; ev3 -> iv1;
        # ev4 outside; ev5 wrong key; ev6 null key never matches
        assert got == [(1, 0), (2, 0), (2, 1), (3, 1)]

    def test_end_exclusive_boundary(self, spark):
        from datetime import datetime

        from pynomaly_spark.asof import interval_join

        h = 3_600_000_000
        base = 1_704_067_200_000_000
        ev = spark.createDataFrame(
            [(1, "a", datetime(2024, 1, 1, 3, 0))], ["event_id", "k", "ts"]
        )
        iv = spark.createDataFrame(
            [("a", 0, base, base + 3 * h)],
            ["k", "interval_idx", "start_us", "end_us"],
        )
        incl = interval_join(ev, iv, ["k"]).count()
        excl = interval_join(ev, iv, ["k"], end_inclusive=False).count()
        assert (incl, excl) == (1, 0)

    def test_raises_on_inverted_and_oversized_intervals(self, spark):
        from datetime import datetime

        import pyspark.sql.utils

        from pynomaly_spark.asof import interval_join

        ev = spark.createDataFrame(
            [(1, "a", datetime(2024, 1, 1))], ["event_id", "k", "ts"]
        )
        base = 1_704_067_200_000_000
        for s, e in [(base + 10, base), (0, 2**62)]:
            iv = spark.createDataFrame(
                [("a", 0, s, e)], ["k", "interval_idx", "start_us", "end_us"]
            )
            with pytest.raises(Exception, match="interval_join"):
                interval_join(ev, iv, ["k"]).collect()

    def test_plan_has_no_nested_loop(self, spark):
        from pynomaly_spark.asof import interval_join

        ev, iv = self._frames(spark)
        plan = (
            interval_join(ev, iv, ["k"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "NestedLoop" not in plan and "Cartesian" not in plan

    def test_validates_args(self, spark):
        from pynomaly_spark.asof import interval_join

        ev, iv = self._frames(spark)
        with pytest.raises(ValueError):
            interval_join(ev, iv, ["k"], bucket_us=0)
        with pytest.raises(ValueError):
            interval_join(ev, iv, ["k"], max_span_buckets=0)
