"""emb_mrl_recall: Matryoshka truncation recall gate contract."""

import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF), reason="testdata missing")
def test_mrl_recall_contract(spark):
    from pynomaly_spark.queries import QUERIES, _MRL_K, _MRL_NQ

    rows = QUERIES["emb_mrl_recall"](spark, SF).collect()
    assert len(rows) == _MRL_NQ
    for r in rows:
        assert 0 <= r["hits"] <= _MRL_K
        assert r["recall_at_5"] == round(r["hits"] / _MRL_K, 6)
        assert r["top1_match"] in (0, 1)
        # top-1 agreement implies at least one hit
        if r["top1_match"]:
            assert r["hits"] >= 1


def test_mrl_lossless_truncation_is_perfect(spark, tmp_path):
    """Vectors with zero tail beyond the truncation dim: the truncated
    ranking must equal the full ranking -> recall 1.0 everywhere."""
    import numpy as np

    from pynomaly_spark.queries import QUERIES, _MRL_DIM, _MRL_K, _MRL_NQ

    rng = np.random.RandomState(7)
    n = max(_MRL_NQ + _MRL_K + 5, 40)
    rows = [
        (int(i), [float(x) for x in rng.randn(_MRL_DIM)] + [0.0] * 48, 0)
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{sf_dir}/embeddings.parquet")
    out = QUERIES["emb_mrl_recall"](spark, sf_dir).collect()
    assert len(out) == _MRL_NQ
    for r in out:
        assert r["hits"] == _MRL_K and r["top1_match"] == 1
        assert r["recall_at_5"] == 1.0
