"""sequences.acf (pairwise-Pearson autocorrelation per series).

Oracle parity lives in events_acf; these pin the pairwise definition
against numpy, periodic-signal signs, constant-series NULLs, and pair
counting at the series boundary.
"""

import numpy as np
import pytest

from pynomaly_spark.sequences import acf


def _series(spark, xs, key="k"):
    rows = [(key, i, float(v)) for i, v in enumerate(xs)]
    return spark.createDataFrame(rows, "key string, idx long, x double")


def _np_acf(xs, k):
    x, y = np.asarray(xs[:-k], float), np.asarray(xs[k:], float)
    return np.corrcoef(x, y)[0, 1]


def test_acf_alternating_signal(spark):
    xs = [0.0, 1.0] * 20
    got = {
        r["lag"]: r
        for r in acf(_series(spark, xs), "key", "idx", "x", max_lag=2)
        .collect()
    }
    assert got[1]["acf"] == pytest.approx(-1.0)
    assert got[2]["acf"] == pytest.approx(1.0)
    assert got[1]["n_pairs"] == 39 and got[2]["n_pairs"] == 38


def test_acf_matches_numpy(spark):
    rng = np.random.default_rng(5)
    xs = np.cumsum(rng.integers(-3, 4, 200)).astype(float)
    got = {
        r["lag"]: r["acf"]
        for r in acf(_series(spark, xs), "key", "idx", "x", max_lag=4)
        .collect()
    }
    for k in range(1, 5):
        assert got[k] == pytest.approx(_np_acf(xs, k), abs=2e-6)


def test_acf_constant_series_null_and_multikey(spark):
    rows = [("a", i, 5.0) for i in range(10)] + [
        ("b", i, float(i % 2)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "key string, idx long, x double")
    got = {(r["key"], r["lag"]): r for r in acf(df, "key", "idx", "x", 1).collect()}
    assert got[("a", 1)]["acf"] is None  # constant -> zero variance
    assert got[("b", 1)]["acf"] == pytest.approx(-1.0)


def test_acf_validation(spark):
    df = _series(spark, [1.0, 2.0])
    with pytest.raises(ValueError, match="max_lag"):
        acf(df, "key", "idx", "x", 0)
    with pytest.raises(ValueError, match="unknown columns"):
        acf(df, "key", "idx", "nope", 1)
