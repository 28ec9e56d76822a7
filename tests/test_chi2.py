"""textops.chi2_terms (chi-squared token-label feature selection).

Oracle parity lives in doc_chi2_terms; these pin the 2x2 contingency
arithmetic against a hand-built table, df semantics (once per doc),
the all-docs / all-label exclusions, and top-k ranking.
"""

import pytest

from pynomaly_spark.textops import chi2_terms


def _chi2(n11, df, nc, n):
    diff = n11 * (n - df - nc + n11) - (df - n11) * (nc - n11)
    return n * diff * diff / (df * (n - df) * nc * (n - nc))


def _corpus(spark):
    # 6 docs of label a, 4 of label b; token 'aaa' in all a-docs only,
    # 'bbb' in all b-docs only, 'mix' in half of each, 'all' everywhere
    # (must be excluded: df == N), repeats inside a doc count once.
    rows = []
    for i in range(6):
        t = "aaa aaa all" + (" mix" if i < 3 else "")
        rows.append((t, "a"))
    for i in range(4):
        t = "bbb all all" + (" mix" if i < 2 else "")
        rows.append((t, "b"))
    return spark.createDataFrame(rows, "text string, lang string")


def test_chi2_contingency_values(spark):
    got = {
        (r["label"], r["term"]): r
        for r in chi2_terms(
            _corpus(spark), min_len=3, min_df=1, top_k=10
        ).collect()
    }
    n = 10
    # aaa: df=6, all 6 in label a (nc=6) -> perfect separation
    assert got[("a", "aaa")]["chi2"] == pytest.approx(
        round(_chi2(6, 6, 6, n), 6)
    )
    assert got[("a", "aaa")]["n11"] == 6 and got[("a", "aaa")]["df"] == 6
    # mix: df=5, 3 in a, 2 in b -> near-zero association
    assert got[("a", "mix")]["chi2"] == pytest.approx(
        round(_chi2(3, 5, 6, n), 6)
    )
    assert got[("b", "mix")]["chi2"] == pytest.approx(
        round(_chi2(2, 5, 4, n), 6)
    )
    # 'all' occurs in every doc -> excluded (denominator zero)
    assert not any(t == "all" for (_, t) in got)
    # perfect separators dominate their label's ranking
    assert got[("a", "aaa")]["rnk"] == 1
    assert got[("b", "bbb")]["rnk"] == 1


def test_chi2_doc_frequency_not_term_frequency(spark):
    # 'aaa' appears twice per a-doc but n11 counts docs, not tokens
    got = chi2_terms(_corpus(spark), min_len=3, min_df=1).collect()
    aaa = [r for r in got if r["term"] == "aaa" and r["label"] == "a"][0]
    assert aaa["n11"] == 6


def test_chi2_min_df_and_topk(spark):
    got = chi2_terms(_corpus(spark), min_len=3, min_df=6, top_k=1).collect()
    # only 'aaa' (df=6) survives min_df=6 ('all' is excluded, df==N)
    assert {(r["label"], r["term"]) for r in got} == {("a", "aaa")}
    assert all(r["rnk"] == 1 for r in got)
