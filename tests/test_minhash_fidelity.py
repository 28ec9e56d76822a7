"""doc_minhash_fidelity: est-vs-exact calibration contract."""

import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF), reason="testdata missing")
def test_minhash_fidelity_calibration_contract(spark):
    from pynomaly_spark.queries import QUERIES, _MHF_P

    rows = sorted(
        (r.asDict() for r in QUERIES["doc_minhash_fidelity"](spark, SF).collect()),
        key=lambda r: r["agree"],
    )
    assert rows, "no candidate pairs — banding regressed"
    for r in rows:
        assert 1 <= r["agree"] <= _MHF_P
        assert r["est_6dp"] == (r["agree"] * 1000000) // _MHF_P
        assert 0 <= r["min_true_6dp"] <= r["mean_true_6dp"] <= r["max_true_6dp"] <= 1000000
        assert r["n_pairs"] >= 1
    # full agreement must exist on this corpus (planted near-dups) and
    # carry the highest mean true jaccard of any bucket
    full = [r for r in rows if r["agree"] == _MHF_P]
    assert full, "no full-agreement pairs"
    assert full[0]["mean_true_6dp"] == max(r["mean_true_6dp"] for r in rows)
    # identical word sets estimate AND measure 1.0
    assert full[0]["max_true_6dp"] == 1000000
