"""Spark drift-operator parity tests.

The grouped Arrow-UDF path must reproduce the pure-numpy kernel (and
therefore the reference golden scores) exactly; the distributed Catalyst
path must match the grouped path; the precomputed-kNN table entry point
must match the raw-feature path.
"""

import numpy as np
import pandas as pd
import pytest

from pynomaly_spark import kernel
from pynomaly_spark.drift import (
    loop_distributed,
    loop_from_knn_table,
    loop_grouped,
)

GOLDEN_IN = np.array(
    [
        0.02059752, 0.32629926, 0.63036653, 0.94409321, 0.63251097,
        0.47598494, 0.80204026, 0.34845067, 0.81556468, 0.89183,
        0.25210317, 0.11460502, 0.19953434, 0.36955067, 0.06038041,
        0.34527368, 0.56621582, 0.90533649, 0.33773613, 0.71573306,
    ]
)
GOLDEN_SCORES = np.array(
    [
        0.6356276742921594, 0.0, 0.0, 0.48490790006974044, 0.0,
        0.0, 0.0, 0.0, 0.021728288376168012, 0.28285086151683225,
        0.0, 0.18881886507113213, 0.0, 0.0, 0.45350246469681843,
        0.0, 0.07886635748113013, 0.3349068501560546, 0.0, 0.0,
    ]
)


def _feature_df(spark, groups):
    """groups: dict name -> (n, d) ndarray. Returns Spark df with row_id."""
    rows = []
    rid = 0
    for name, pts in groups.items():
        for p in np.atleast_2d(pts):
            rows.append((rid, name, [float(v) for v in np.atleast_1d(p)]))
            rid += 1
    pdf = pd.DataFrame(rows, columns=["row_id", "partition_id", "features"])
    return spark.createDataFrame(pdf)


def _collect_scores(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["partition_id"], []).append(
            (r["row_id"], r["loop_score"], r["gated"])
        )
    for v in out.values():
        v.sort()
    return out


def test_grouped_matches_golden(spark):
    rng = np.random.RandomState(5)
    groups = {
        "golden": GOLDEN_IN.reshape(-1, 1),
        "noise": rng.rand(40, 3),
    }
    res = _collect_scores(loop_grouped(_feature_df(spark, groups), 10, 3))
    got = np.array([s for _, s, _ in res["golden"]])
    np.testing.assert_array_almost_equal(got, GOLDEN_SCORES, 6)
    # noise group scored independently, matches direct kernel
    direct = kernel.loop_scores(np.random.RandomState(5).rand(40, 3), 10, 3)
    got_noise = np.array([s for _, s, _ in res["noise"]])
    np.testing.assert_array_almost_equal(got_noise, direct.scores, 10)


def test_grouped_gates_small_groups(spark):
    groups = {
        "big": np.random.RandomState(1).rand(30, 2),
        "tiny": np.random.RandomState(2).rand(5, 2),
    }
    res = _collect_scores(loop_grouped(_feature_df(spark, groups), 10, 3))
    assert all(g for _, _, g in res["tiny"])
    assert all(s is None for _, s, _ in res["tiny"])
    assert not any(g for _, _, g in res["big"])


def test_knn_table_entry_point_matches(spark):
    pts = np.random.RandomState(3).rand(60, 2)
    d, ids = kernel.knn(pts, 10)
    base_rid = 1000  # row_ids offset: prove global-id remapping works
    pdf = pd.DataFrame(
        {
            "row_id": np.arange(60) + base_rid,
            "partition_id": "p0",
            "knn_dists": [list(map(float, r)) for r in d],
            "knn_ids": [[int(i) + base_rid for i in r] for r in ids],
        }
    )
    got = _collect_scores(
        loop_from_knn_table(spark.createDataFrame(pdf), 10, 3)
    )["p0"]
    direct = kernel.loop_scores(pts, 10, 3)
    np.testing.assert_array_almost_equal(
        np.array([s for _, s, _ in got]), direct.scores, 10
    )


def test_distributed_matches_grouped_with_exact_knn(spark):
    """Catalyst pipeline == grouped kernel when fed the same exact kNN."""
    pts = np.random.RandomState(7).rand(80, 2)
    d, ids = kernel.knn(pts, 10)
    knn_pdf = pd.DataFrame(
        {
            "row_id": np.arange(80),
            "partition_id": "p0",
            "knn_dists": [list(map(float, r)) for r in d],
            "knn_ids": [list(map(int, r)) for r in ids],
        }
    )
    feats = _feature_df(spark, {"p0": pts})
    dist = _collect_scores(
        loop_distributed(
            feats, 10, 3, knn_table=spark.createDataFrame(knn_pdf)
        )
    )["p0"]
    grouped = _collect_scores(loop_grouped(feats, 10, 3))["p0"]
    np.testing.assert_array_almost_equal(
        np.array([s for _, s, _ in dist]),
        np.array([s for _, s, _ in grouped]),
        9,
    )


def test_distributed_bucketed_knn_end_to_end(spark):
    """Full distributed path with the grid-bucketed self-join; a generous
    cell size makes the approximate kNN exact, so scores must match."""
    rng = np.random.RandomState(11)
    pts = np.vstack([rng.rand(70, 2), rng.rand(10, 2) + 3.0])
    feats = _feature_df(spark, {"p0": pts})
    dist = _collect_scores(
        loop_distributed(feats, 5, 3, cell_size=50.0)
    )["p0"]
    grouped = _collect_scores(loop_grouped(feats, 5, 3))["p0"]
    np.testing.assert_array_almost_equal(
        np.array([s for _, s, _ in dist]),
        np.array([s for _, s, _ in grouped]),
        9,
    )


def test_distributed_gates_small_groups(spark):
    groups = {
        "big": np.random.RandomState(1).rand(30, 2),
        "tiny": np.random.RandomState(2).rand(4, 2),
    }
    res = _collect_scores(
        loop_distributed(_feature_df(spark, groups), 10, 3, cell_size=50.0)
    )
    assert all(g for _, _, g in res["tiny"]) and len(res["tiny"]) == 4
    assert not any(g for _, _, g in res["big"])


def test_salted_grouped_path(spark):
    """Salting splits a hot group into independent sub-fits: all rows come
    back exactly once, outliers still rank above inliers in each sub-fit."""
    import pandas as pd
    from pynomaly_spark.skew import with_salt

    rng = np.random.RandomState(13)
    pts = np.vstack([0.3 * rng.randn(300, 2), rng.uniform(-5, 5, (12, 2))])
    feats = _feature_df(spark, {"hot": pts})
    salted = with_salt(feats, max_group_rows=80)
    out = loop_grouped(salted, 10, 3, salt_col="salt").toPandas()
    assert len(out) == 312
    assert out.row_id.is_unique
    assert not out.gated.any()
    assert (out.partition_id == "hot").all()
    inlier = out[out.row_id < 300].loop_score
    outlier = out[out.row_id >= 300].loop_score
    assert outlier.mean() > inlier.mean() + 0.3


def test_map_strategy_matches_grouped(spark):
    """loop_grouped_map (one Arrow stream per task, pandas groupby) must
    equal loop_grouped (one Arrow frame per group) exactly — including
    gated groups, carry columns, salting, and flat feature transport."""
    from pyspark.sql import functions as F
    from pynomaly_spark.drift import loop_grouped_map

    rng = np.random.RandomState(11)
    groups = {
        "a": rng.randn(60, 3),
        "b": rng.randn(300, 3) + 4.0,
        "tiny": rng.randn(5, 3),  # gated (n <= k)
    }
    df = _feature_df(spark, groups).withColumn(
        "tag", F.concat(F.lit("t"), F.col("row_id"))
    )

    for kwargs in (
        dict(),
        dict(carry_cols=["tag"]),
    ):
        a = loop_grouped(df, n_neighbors=10, **kwargs)
        b = loop_grouped_map(df, n_neighbors=10, **kwargs)
        pa = a.orderBy("row_id").toPandas()
        pb = b.orderBy("row_id").toPandas()
        assert list(pa.columns) == list(pb.columns)
        assert (pa.gated == pb.gated).all()
        np.testing.assert_allclose(
            pa.loop_score.to_numpy(dtype=float),
            pb.loop_score.to_numpy(dtype=float),
            atol=1e-12,
        )
        if "carry_cols" in kwargs:
            assert (pa.tag == pb.tag).all()

    # flat feature columns + salt
    flat = df.select(
        "row_id",
        "partition_id",
        F.col("features")[0].alias("_f0"),
        F.col("features")[1].alias("_f1"),
        F.col("features")[2].alias("_f2"),
    )
    from pynomaly_spark.skew import with_salt

    salted = with_salt(flat, 100)
    a = loop_grouped(
        salted, n_neighbors=10, feature_cols=["_f0", "_f1", "_f2"],
        salt_col="salt",
    ).orderBy("row_id").toPandas()
    b = loop_grouped_map(
        salted, n_neighbors=10, feature_cols=["_f0", "_f1", "_f2"],
        salt_col="salt",
    ).orderBy("row_id").toPandas()
    np.testing.assert_allclose(
        a.loop_score.to_numpy(dtype=float),
        b.loop_score.to_numpy(dtype=float),
        atol=1e-12,
    )


def test_map_strategy_scores_null_partition_keys(spark):
    """Null group keys must be scored (pid 'None'), not silently dropped
    by pandas groupby's dropna default (round-2 review finding)."""
    from pynomaly_spark.drift import loop_grouped_map

    rng = np.random.RandomState(3)
    groups = {"a": rng.randn(40, 2)}
    df = _feature_df(spark, groups)
    from pyspark.sql import functions as F

    # half the rows get a NULL partition id
    df = df.withColumn(
        "partition_id",
        F.when(F.col("row_id") % 2 == 0, F.col("partition_id")),
    )
    out = loop_grouped_map(df, n_neighbors=5).toPandas()
    assert len(out) == 40
    assert set(out.partition_id) == {"a", "None"}
    assert out.loop_score.notna().all()
