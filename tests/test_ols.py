"""features.ols_fit (OLS via sufficient statistics).

Oracle parity lives in doc_ols; these tests pin the closed-form solve
against numpy lstsq (1- and 2-feature), singular-design NULLs,
complete-case filtering, and the one-aggregate plan shape.
"""

import numpy as np
import pytest

from pynomaly_spark.features import ols_fit


def _df(spark, x1, y, x2=None):
    if x2 is None:
        rows = [(float(a), float(b)) for a, b in zip(x1, y)]
        return spark.createDataFrame(rows, "x1 double, y double")
    rows = [
        (float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)
    ]
    return spark.createDataFrame(rows, "x1 double, x2 double, y double")


def test_ols_one_feature_matches_numpy(spark):
    rng = np.random.default_rng(3)
    x = rng.integers(1, 500, 200).astype(float)
    y = 3.0 * x + 17 + rng.integers(0, 40, 200)
    got = ols_fit(_df(spark, x, y), ["x1"], "y").collect()[0]
    X = np.column_stack([np.ones_like(x), x])
    coef = np.linalg.lstsq(X, y, rcond=None)[0]
    assert got["n"] == 200
    assert got["intercept"] == pytest.approx(coef[0], abs=2e-6)
    assert got["beta_x1"] == pytest.approx(coef[1], abs=2e-6)
    resid = y - X @ coef
    r2 = 1 - (resid ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert got["r2"] == pytest.approx(r2, abs=2e-6)


def test_ols_two_features_matches_numpy(spark):
    rng = np.random.default_rng(7)
    x1 = rng.integers(10, 4000, 300).astype(float)
    x2 = (x1 / 5 + rng.integers(0, 50, 300)).astype(float)
    y = x1 / 5.5 + 0.3 * x2 + rng.integers(0, 30, 300)
    got = ols_fit(_df(spark, x1, y, x2), ["x1", "x2"], "y").collect()[0]
    X = np.column_stack([np.ones_like(x1), x1, x2])
    coef = np.linalg.lstsq(X, y, rcond=None)[0]
    assert got["intercept"] == pytest.approx(coef[0], abs=2e-5)
    assert got["beta_x1"] == pytest.approx(coef[1], abs=2e-6)
    assert got["beta_x2"] == pytest.approx(coef[2], abs=2e-6)


def test_ols_singular_design_returns_nulls(spark):
    # constant feature -> singular normal matrix -> NULL coefficients
    x = np.full(50, 7.0)
    y = np.arange(50, dtype=float)
    got = ols_fit(_df(spark, x, y), ["x1"], "y").collect()[0]
    assert got["n"] == 50
    assert got["intercept"] is None and got["beta_x1"] is None


def test_ols_complete_case_and_validation(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, None), (None, 3.0), (3.0, 6.0)],
        "x1 double, y double",
    )
    got = ols_fit(df, ["x1"], "y").collect()[0]
    assert got["n"] == 2  # null rows dropped
    with pytest.raises(ValueError, match="1 or 2 features"):
        ols_fit(df, [], "y")
    with pytest.raises(ValueError, match="unknown columns"):
        ols_fit(df, ["nope"], "y")


def test_ols_is_one_aggregate(spark):
    df = _df(spark, np.arange(100.0), np.arange(100.0) * 2)
    plan = (
        ols_fit(df, ["x1"], "y")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one map-side-combined aggregate: a single exchange, partial aggs
    assert plan.count("Exchange") == 1
    assert "partial_" in plan


def test_ols_grouped_matches_per_slice(spark):
    rng = np.random.default_rng(13)
    rows = []
    for g, slope in (("a", 2.0), ("b", -1.0)):
        x = rng.integers(1, 300, 120).astype(float)
        y = slope * x + 10 + rng.integers(0, 20, 120)
        rows += [(g, float(a), float(b)) for a, b in zip(x, y)]
    df = spark.createDataFrame(rows, "g string, x1 double, y double")
    got = {
        r["g"]: r
        for r in ols_fit(df, ["x1"], "y", by=["g"]).collect()
    }
    assert set(got) == {"a", "b"}
    for g in ("a", "b"):
        sl = [(a, b) for gg, a, b in rows if gg == g]
        X = np.column_stack([np.ones(len(sl)), [a for a, _ in sl]])
        coef = np.linalg.lstsq(X, np.array([b for _, b in sl]), rcond=None)[0]
        assert got[g]["n"] == 120
        assert got[g]["intercept"] == pytest.approx(coef[0], abs=2e-5)
        assert got[g]["beta_x1"] == pytest.approx(coef[1], abs=2e-6)
    # grouped moments still one exchange (single grouped aggregate)
    plan = (
        ols_fit(df, ["x1"], "y", by=["g"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1


def test_ols_loco_equals_refit_without_group(spark):
    """Leave-one-category-out by moment subtraction must equal an
    actual re-fit on the complement — integer inputs make both exact."""
    from pynomaly_spark.features import ols_fit, ols_loco

    rows = [("a", x, 3 * x + 7 + (x % 3)) for x in range(1, 20)] + [
        ("b", x, 2 * x + 50) for x in range(1, 15)
    ] + [("c", x, 5 * x) for x in range(1, 10)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    loco = {r["g"]: (r["n"], r["intercept"], r["beta_x"], r["r2"])
            for r in ols_loco(df, ["x"], "y", "g").collect()}
    for g in ("a", "b", "c"):
        refit = ols_fit(df.where(f"g <> '{g}'"), ["x"], "y").collect()[0]
        assert loco[g] == (refit["n"], refit["intercept"],
                           refit["beta_x"], refit["r2"]), g
