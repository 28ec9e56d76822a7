"""lm.nb_model / nb_priors / nb_predict (multinomial Naive Bayes).

Oracle parity lives in doc_nb_confusion; these pin the smoothed
likelihoods against hand-computed values, separable-corpus accuracy,
OOV skipping, and the no-in-vocab-token contract.
"""

import math

import pytest

from pynomaly_spark.lm import nb_model, nb_predict, nb_priors


def _train(spark):
    rows = [
        ("aa aa bb", "x"),
        ("aa cc", "x"),
        ("dd dd ee", "y"),
        ("dd ff", "y"),
    ]
    return spark.createDataFrame(rows, "text string, lang string")


def test_nb_model_smoothed_likelihoods(spark):
    m = {
        (r["token"], r["label"]): r["lp"]
        for r in nb_model(_train(spark)).collect()
    }
    # vocab = {aa,bb,cc,dd,ee,ff} V=6; tot_x=5, tot_y=5
    assert len(m) == 12  # densified: every vocab x class cell
    assert m[("aa", "x")] == pytest.approx(math.log((3 + 1) / (5 + 6)))
    assert m[("aa", "y")] == pytest.approx(math.log((0 + 1) / (5 + 6)))
    assert m[("dd", "y")] == pytest.approx(math.log((3 + 1) / (5 + 6)))


def test_nb_priors(spark):
    rows = [("t", "x")] * 3 + [("t", "y")]
    df = spark.createDataFrame(rows, "text string, lang string")
    got = {r["label"]: r["lp0"] for r in nb_priors(df).collect()}
    assert got["x"] == pytest.approx(math.log(3 / 4))
    assert got["y"] == pytest.approx(math.log(1 / 4))


def test_nb_predict_separable(spark):
    train = _train(spark)
    test = spark.createDataFrame(
        [(1, "aa aa cc"), (2, "dd ee dd"), (3, "zz zz")],
        "doc_id long, text string",
    )
    model, pri = nb_model(train), nb_priors(train)
    got = {r["doc_id"]: r for r in nb_predict(test, model, pri).collect()}
    assert got[1]["pred"] == "x"
    assert got[2]["pred"] == "y"
    # doc 3 is all-OOV -> no score row at all
    assert 3 not in got
    # hand-check doc 1's winning score: prior ln(1/2) + sum tf*lp
    want = math.log(2 / 4) + 2 * math.log(4 / 11) + math.log(2 / 11)
    assert got[1]["score"] == pytest.approx(round(want, 6), abs=1e-6)


def test_nb_oov_tokens_skipped_not_floored(spark):
    train = _train(spark)
    test = spark.createDataFrame(
        [(1, "aa zz zz zz")], "doc_id long, text string"
    )
    got = nb_predict(test, nb_model(train), nb_priors(train)).collect()
    # only 'aa' scores; the three OOV tokens contribute nothing
    want = math.log(2 / 4) + math.log(4 / 11)
    assert got[0]["score"] == pytest.approx(round(want, 6), abs=1e-6)
