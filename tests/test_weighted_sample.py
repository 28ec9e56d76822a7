"""sampling.weighted_sample (Efraimidis–Spirakis A-ES).

Oracle parity lives in doc_weighted_sample; these tests pin the
without-replacement contract, determinism, weight proportionality
(across independent salt families), degenerate weights, and the
salted-top-k plan shape.
"""

import pytest
from pyspark.sql import functions as F

from pynomaly_spark.sampling import weighted_sample


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, w long")


def test_weighted_sample_contract(spark):
    df = _df(spark, [(i, 10) for i in range(40)])
    out = weighted_sample(df, "doc_id", "w", 10).collect()
    assert len(out) == 10
    assert len({r["id"] for r in out}) == 10  # without replacement
    assert sorted(r["rank"] for r in out) == list(range(1, 11))
    # priorities are valid u^(1/w) values
    assert all(0.0 < r["prio6"] <= 1.0 for r in out)
    # deterministic: same call, same sample
    again = weighted_sample(df, "doc_id", "w", 10).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_weighted_sample_k_exceeds_population(spark):
    df = _df(spark, [(1, 5), (2, 5), (3, 0), (4, None), (None, 5)])
    out = weighted_sample(df, "doc_id", "w", 10).collect()
    # zero/NULL weights and NULL ids dropped; rest all sampled
    assert {r["id"] for r in out} == {1, 2}


def test_weighted_sample_proportional_to_weight(spark):
    # one heavy item (w=200) among 20 light (w=1): across independent
    # salt families the heavy item must be sampled far more often
    rows = [(0, 200)] + [(i, 1) for i in range(1, 21)]
    df = _df(spark, rows)
    hits = 0
    n_fam = 12
    for f in range(n_fam):
        got = {
            r["id"]
            for r in weighted_sample(
                df, "doc_id", "w", 3, salt=f"fam{f}"
            ).collect()
        }
        hits += 0 in got
    # P(heavy in top-3) ~ 1 - tiny; even with rounding ties >= 10/12
    assert hits >= 10


def test_weighted_sample_validates(spark):
    df = _df(spark, [(1, 1)])
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(df, "doc_id", "w", 0)
    with pytest.raises(ValueError, match="unknown columns"):
        weighted_sample(df, "doc_id", "nope", 1)


def test_weighted_sample_no_global_single_reducer(spark):
    df = _df(spark, [(i, 1 + i % 7) for i in range(100)])
    plan = (
        weighted_sample(df, "doc_id", "w", 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # phase-1 salted window must partition by the salt, not run a
    # single global window over all rows
    assert "_tk_salt" in plan
