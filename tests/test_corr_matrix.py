"""profiling.corr_matrix (one-pass Pearson correlation matrix).

Oracle parity lives in lineitem_corr; these pin the moment arithmetic
against numpy.corrcoef, constant-column NULLs, complete-case n, and the
single-aggregate plan shape.
"""

import numpy as np
import pytest

from pynomaly_spark.profiling import corr_matrix


def _df(spark, arrs):
    cols = sorted(arrs)
    rows = [
        tuple(float(arrs[c][i]) for c in cols)
        for i in range(len(next(iter(arrs.values()))))
    ]
    return spark.createDataFrame(
        rows, ", ".join(f"{c} double" for c in cols)
    )


def test_corr_matches_numpy(spark):
    rng = np.random.default_rng(11)
    a = rng.integers(0, 1000, 500).astype(float)
    b = a * 2 + rng.integers(0, 300, 500)
    c = rng.integers(0, 50, 500).astype(float)
    got = {
        (r["col_a"], r["col_b"]): r
        for r in corr_matrix(
            _df(spark, {"a": a, "b": b, "c": c}), ["a", "b", "c"]
        ).collect()
    }
    assert len(got) == 3 and all(r["n"] == 500 for r in got.values())
    for (x, y), arr in [
        (("a", "b"), (a, b)),
        (("a", "c"), (a, c)),
        (("b", "c"), (b, c)),
    ]:
        want = np.corrcoef(arr[0], arr[1])[0, 1]
        assert got[(x, y)]["corr"] == pytest.approx(want, abs=2e-6)
    assert got[("a", "b")]["corr"] > 0.9


def test_corr_constant_column_is_null(spark):
    df = _df(
        spark,
        {"a": np.arange(20.0), "k": np.full(20, 3.0)},
    )
    got = corr_matrix(df, ["a", "k"]).collect()
    assert len(got) == 1 and got[0]["corr"] is None


def test_corr_complete_case_n(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, None), (3.0, 2.0), (4.0, 9.0)],
        "a double, b double",
    )
    got = corr_matrix(df, ["a", "b"]).collect()
    assert got[0]["n"] == 3
    with pytest.raises(ValueError, match="at least 2"):
        corr_matrix(df, ["a"])
    with pytest.raises(ValueError, match="unknown columns"):
        corr_matrix(df, ["a", "zz"])


def test_corr_is_one_aggregate(spark):
    df = _df(spark, {"a": np.arange(50.0), "b": np.arange(50.0) * 3})
    plan = (
        corr_matrix(df, ["a", "b"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "partial_" in plan
