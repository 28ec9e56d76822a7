"""Multi-touch linear attribution (sequences.linear_attribution)."""

import datetime as dt

import pytest

from pynomaly_spark.sequences import linear_attribution


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )


def _run(spark, rows, window_us=7 * 86_400_000_000):
    out = linear_attribution(
        _ev(spark, rows),
        user_col="user_id",
        time_col="ts",
        id_col="event_id",
        type_col="event_type",
        value_col="value",
        conversion_type="purchase",
        touch_types=["click", "view"],
        window_us=window_us,
    ).collect()
    return {r["touch_type"]: r.asDict() for r in out}


def test_exact_split_and_remainder_to_earliest(spark):
    d = dt.datetime.fromisoformat
    rows = [
        # purchase of 100.01 -> 10001 cents over 3 touches:
        # 3333 each, remainder 2 to the EARLIEST touch (click id=1).
        (1, d("2020-01-01 00:00:00"), 7, "click", None),
        (2, d("2020-01-02 00:00:00"), 7, "view", None),
        (3, d("2020-01-03 00:00:00"), 7, "click", None),
        (4, d("2020-01-04 00:00:00"), 7, "purchase", 100.01),
    ]
    out = _run(spark, rows)
    # clicks: 3333+2 (earliest) + 3333 = 6668; view: 3333.
    assert out["click"]["attributed_cents"] == 6668
    assert out["view"]["attributed_cents"] == 3333
    assert out["click"]["touches"] == 2 and out["view"]["touches"] == 1
    assert out["unattributed"]["purchases"] == 0
    total = sum(r["attributed_cents"] for r in out.values())
    assert total == 10001


def test_window_boundaries_and_cross_block(spark):
    d = dt.datetime.fromisoformat
    w = 86_400_000_000  # 1 day
    rows = [
        # exactly at t_conv - window: EXCLUDED (strict >).
        (1, d("2020-01-01 12:00:00"), 7, "click", None),
        # inside the window but in the PREVIOUS day-block: included
        # only because touches explode into block and block+1.
        (2, d("2020-01-01 18:00:00"), 7, "view", None),
        # exactly at t_conv: included (<=).
        (3, d("2020-01-02 12:00:00"), 7, "click", None),
        (4, d("2020-01-02 12:00:00"), 7, "purchase", 10.0),
        # a different user's touch never matches.
        (5, d("2020-01-02 11:00:00"), 8, "click", None),
        # purchase with no touches -> unattributed.
        (6, d("2020-03-02 12:00:00"), 9, "purchase", 5.0),
    ]
    out = _run(spark, rows, window_us=w)
    assert out["view"]["touches"] == 1 and out["click"]["touches"] == 1
    assert out["view"]["attributed_cents"] + out["click"]["attributed_cents"] == 1000
    assert out["unattributed"]["purchases"] == 1
    assert out["unattributed"]["attributed_cents"] == 500


def test_bad_args_raise(spark):
    df = _ev(spark, [])
    with pytest.raises(ValueError, match="unknown column"):
        linear_attribution(
            df, "nope", "ts", "event_id", "event_type", "value",
            "purchase", ["click"],
        )
    with pytest.raises(ValueError, match="touch_types"):
        linear_attribution(
            df, "user_id", "ts", "event_id", "event_type", "value",
            "purchase", [],
        )
    with pytest.raises(ValueError, match="window_us"):
        linear_attribution(
            df, "user_id", "ts", "event_id", "event_type", "value",
            "purchase", ["click"], window_us=0,
        )
