"""p_chart (profiling) and markov_accuracy (sequences)."""

import datetime as dt

import pytest

from pynomaly_spark.profiling import p_chart
from pynomaly_spark.sequences import markov_accuracy


def test_p_chart_integer_verdict(spark):
    # Buckets: a: 1/10 hits, b: 9/10, c: 5/10 -> pooled 15/30 = 0.5.
    # sigma(n=10) = sqrt(.5*.5/10) ~ 0.1581; |a - pbar| = .4 = 2.53
    # sigma -> flagged at k=2, c (0 sigma) not, b (2.53) flagged.
    rows = (
        [("a", 1)] * 1 + [("a", 0)] * 9
        + [("b", 1)] * 9 + [("b", 0)] * 1
        + [("c", 1)] * 5 + [("c", 0)] * 5
    )
    df = spark.createDataFrame(rows, "bk string, hit long")
    out = {
        r["bucket"]: r.asDict()
        for r in p_chart(df, "bk", "hit", k_num=2, k_den=1).collect()
    }
    assert out["a"]["flag"] == 1 and out["b"]["flag"] == 1
    assert out["c"]["flag"] == 0
    assert out["a"]["rate_6dp"] == 100000
    assert out["c"]["pooled_rate_6dp"] == 500000
    # at k=3 (2.53 sigma) nothing flags
    out3 = {
        r["bucket"]: r["flag"] for r in p_chart(df, "bk", "hit").collect()
    }
    assert out3 == {"a": 0, "b": 0, "c": 0}
    with pytest.raises(ValueError, match="unknown column"):
        p_chart(df, "bk", "nope")
    with pytest.raises(ValueError, match="k must be"):
        p_chart(df, "bk", "hit", k_den=0)


def test_markov_accuracy_from_matrix_cells(spark):
    d = dt.datetime.fromisoformat
    # user 1: a->b, b->a, a->b  (a: 2 pairs out, both ->b; b: 1 ->a)
    # user 2: a->c              (a: 1 ->c)
    rows = [
        (1, d("2020-01-01 00:00"), 1, "a", None),
        (2, d("2020-01-01 01:00"), 1, "b", None),
        (3, d("2020-01-01 02:00"), 1, "a", None),
        (4, d("2020-01-01 03:00"), 1, "b", None),
        (5, d("2020-01-01 00:00"), 2, "a", None),
        (6, d("2020-01-01 01:00"), 2, "c", None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    out = {
        r["prev_state"]: r.asDict()
        for r in markov_accuracy(df, "user_id", "ts", "event_type").collect()
    }
    # a: 3 outgoing pairs, argmax b (2 of 3) -> acc 666666 (truncating)
    assert out["a"]["predicted"] == "b"
    assert out["a"]["correct"] == 2 and out["a"]["total"] == 3
    assert out["a"]["acc_6dp"] == 666666
    # b: 1 outgoing (b->a) -> perfect in-sample
    assert out["b"]["predicted"] == "a" and out["b"]["acc_6dp"] == 1000000
    assert "c" not in out  # no outgoing pairs
