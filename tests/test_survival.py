"""Kaplan–Meier at-risk table (pynomaly_spark.survival.km_table)."""

import datetime as dt

import pytest

from pynomaly_spark.survival import km_table


def _frame(spark, rows):
    return spark.createDataFrame(rows, "e long, ts timestamp")


def test_km_censoring_and_suffix_sum(spark):
    d = lambda s: dt.datetime.fromisoformat(s)
    rows = [
        # entity 1: days 0, 2, 5 -> observed spells 2 and 3,
        # censored spell 5 (horizon = day 10).
        (1, d("2020-01-01")), (1, d("2020-01-03")), (1, d("2020-01-06")),
        # entity 2: day 8 only -> censored spell 2.
        (2, d("2020-01-09")),
        # entity 3: activity ON the horizon day -> zero-length censored
        # spell, dropped.
        (3, d("2020-01-11")),
        # duplicate same-day activity collapses.
        (1, d("2020-01-03")),
    ]
    out = {
        r["t"]: r.asDict()
        for r in km_table(_frame(spark, rows), "e", "ts").collect()
    }
    assert set(out) == {2, 3, 5}
    # t=2: one observed (entity 1) + one censored (entity 2); all four
    # positive spells are still at risk at t=2.
    assert out[2]["events"] == 1 and out[2]["censored"] == 1
    assert out[2]["n_at_risk"] == 4
    # t=3: observed spell; two spells of length >= 3 remain.
    assert out[3]["events"] == 1 and out[3]["n_at_risk"] == 2
    # t=5: entity 1's open spell, censored at horizon.
    assert out[5]["censored"] == 1 and out[5]["n_at_risk"] == 1
    # hazard is truncating integer division.
    assert out[2]["hazard_6dp"] == (1 * 1000000) // 4


def test_km_nulls_dropped_and_unknown_column_raises(spark):
    d = dt.datetime.fromisoformat
    rows = [
        (1, d("2020-01-01")),
        (1, d("2020-01-04")),
        (None, d("2020-01-02")),
        (2, None),
    ]
    out = km_table(_frame(spark, rows), "e", "ts").collect()
    # entity 1 contributes one observed spell of 3; its final spell is
    # zero-length (last activity defines the horizon) and is dropped.
    assert [(r["t"], r["events"], r["censored"]) for r in out] == [(3, 1, 0)]
    with pytest.raises(ValueError, match="unknown column"):
        km_table(_frame(spark, rows), "nope", "ts")


def test_gap_forecast_hand_values(spark, tmp_path):
    """Single customer, order days [0, 3, 10, 11, 30]: gaps [3,7,1,19],
    train sorted [1,3,7], median 3, actual 19, naive 1 -> med abs err
    16, naive abs err 18."""
    import datetime as dt

    from pynomaly_spark.queries import QUERIES

    base = dt.datetime(2020, 1, 1)
    rows = [
        (1, base + dt.timedelta(days=d), 7, 1.0, dt.datetime(2020, 6, 1))
        for d in [0, 3, 10, 11, 30]
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderdate timestamp, o_custkey long, "
        "o_totalprice double, _pad timestamp",
    ).drop("_pad")
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{sf_dir}/orders.parquet")
    out = QUERIES["customer_gap_forecast"](spark, sf_dir).collect()[0]
    assert out["n_customers"] == 1
    assert out["med_abs_days"] == 16
    assert out["mae_med_6dp"] == 16_000_000
    assert out["mae_naive_6dp"] == 18_000_000
