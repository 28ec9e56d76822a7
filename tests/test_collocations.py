"""textops.collocation_pmi.

Oracle-gate parity lives in doc_collocations; these tests pin bigram
adjacency semantics (raw-array pairing, empty-token drops AFTER
pairing), the PMI value against a literal computation, the min-count
cutoff (marginals still count dropped pairs), and null handling.
"""

import math

import pytest

from pynomaly_spark.textops import collocation_pmi


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_pmi_values_match_literal(spark):
    # corpus bigrams: (a,b) x3, (b,a) x3, (a,c) x1 -> N=7
    df = _docs(spark, ["a b a b", "a b a c", "b a"])
    out = {
        (r["w1"], r["w2"]): r
        for r in collocation_pmi(df, "text", min_pair_n=1).collect()
    }
    assert {k: v["n_pair"] for k, v in out.items()} == {
        ("a", "b"): 3, ("b", "a"): 3, ("a", "c"): 1,
    }
    r = out[("a", "b")]
    assert (r["n_left"], r["n_right"]) == (4, 3)  # a as left; b as right
    assert r["pmi6"] == round(math.log(3 * 7 / (4 * 3)), 6)


def test_pmi_min_count_drops_pairs_not_marginals(spark):
    df = _docs(spark, ["a b a b", "a c"])
    out = {
        (r["w1"], r["w2"]): r
        for r in collocation_pmi(df, "text", min_pair_n=2).collect()
    }
    assert set(out) == {("a", "b")}
    # marginal n_left for 'a' still counts the dropped (a,c) bigram
    assert out[("a", "b")]["n_left"] == 3


def test_pmi_null_and_short_texts(spark):
    df = _docs(spark, [None, "single", "", "x y"])
    out = collocation_pmi(df, "text", min_pair_n=1).collect()
    assert {(r["w1"], r["w2"]) for r in out} == {("x", "y")}
    with pytest.raises(ValueError):
        collocation_pmi(df, "text", min_pair_n=0)


def test_pmi_one_corpus_shuffle(spark):
    # the bigram explosion is map-side: exactly one exchange feeds the
    # pair-count aggregate from the corpus; everything downstream runs
    # on the collapsed pair frame
    df = _docs(spark, ["a b c"] * 10)
    plan = (
        collocation_pmi(df, "text", 1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_count" in plan
