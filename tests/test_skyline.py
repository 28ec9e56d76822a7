"""skyline.skyline_2d (two-level Pareto frontier).

Oracle parity lives in part_skyline (brute-force NOT EXISTS twin);
these pin the dominance rule against an in-test brute force on random
data, duplicate collapsing, NULL dropping, and bucket-count
invariance (the two-level split must never change the answer).
"""

import random

import pytest

from pynomaly_spark.skyline import skyline_2d


def _df(spark, rows):
    return spark.createDataFrame(
        [(int(i), lo, hi) for i, (lo, hi) in enumerate(rows)],
        "id long, lo long, hi long",
    )


def _brute(rows):
    pts = {}
    for i, (lo, hi) in enumerate(rows):
        if lo is None or hi is None:
            continue
        k = (lo, hi)
        n, mn = pts.get(k, (0, i))
        pts[k] = (n + 1, min(mn, i))
    out = {}
    for (lo, hi), (n, mn) in pts.items():
        dominated = any(
            ql <= lo and qh >= hi and (ql < lo or qh > hi) for ql, qh in pts
        )
        if not dominated:
            out[(lo, hi)] = (n, mn)
    return out


def _got(df):
    return {
        (r["lo"], r["hi"]): (r["n_dup"], r["id_min"]) for r in df.collect()
    }


def test_matches_brute_force_on_random_points(spark):
    rng = random.Random(7)
    rows = [(rng.randrange(50), rng.randrange(20)) for _ in range(400)]
    got = _got(skyline_2d(_df(spark, rows), "lo", "hi", "id"))
    assert got == _brute(rows)


def test_duplicates_kept_with_counts_and_min_id(spark):
    rows = [(5, 9), (5, 9), (5, 9), (1, 1), (9, 9)]
    got = _got(skyline_2d(_df(spark, rows), "lo", "hi", "id"))
    # (5,9) beats (9,9); (1,1) survives as the cheapest point
    assert got == {(5, 9): (3, 0), (1, 1): (1, 3)}


def test_nulls_dropped_and_bucket_invariance(spark):
    rows = [(3, 4), (None, 9), (3, None), (2, 4), (2, 5), (7, 7)]
    base = _got(skyline_2d(_df(spark, rows), "lo", "hi", "id"))
    assert base == {(2, 5): (1, 4), (7, 7): (1, 5)}
    for nb in (1, 3, 64):
        assert (
            _got(skyline_2d(_df(spark, rows), "lo", "hi", "id", n_buckets=nb))
            == base
        )


def test_tradeoff_diagonal_frontier_is_everything(spark):
    # paying more (lo up) always buys more (hi up): nothing dominates
    rows = [(i, i) for i in range(30)]
    got = _got(skyline_2d(_df(spark, rows), "lo", "hi", "id"))
    assert len(got) == 30
    # and the opposite: one point best on BOTH axes dominates all
    rows = [(i, 100 - i) for i in range(30)]
    got = _got(skyline_2d(_df(spark, rows), "lo", "hi", "id"))
    assert got == {(0, 100): (1, 0)}


def test_validation(spark):
    df = _df(spark, [(1, 1)])
    with pytest.raises(ValueError, match="unknown column"):
        skyline_2d(df, "nope", "hi", "id")
    with pytest.raises(ValueError, match="n_buckets"):
        skyline_2d(df, "lo", "hi", "id", n_buckets=0)
