"""Edge cases for the distributed kNN self-join (round-2 ADVICE items).

* non-string partition columns must survive the brute-force retry branch
  (its output used to re-type the partition column as string and fail the
  union with the cells pass at plan time);
* a probe with zero candidates (singleton partition) must come back as an
  explicit empty-array row from EVERY branch, not silently drop;
* partition values containing ':' must never merge with another
  partition's (partition, cell) group (the old concat key was ambiguous).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pynomaly_spark.knn import knn_self_join


def _df(spark, rows, part_type):
    pdf = pd.DataFrame(rows, columns=["row_id", "part", "features"])
    sdf = spark.createDataFrame(pdf)
    return sdf.withColumn("part", F.col("part").cast(part_type))


def test_int_partition_and_singleton_survive_brute_retry(spark):
    rng = np.random.RandomState(0)
    rows = [
        (i, 1, list(map(float, rng.rand(2)))) for i in range(30)
    ]
    rows.append((100, 2, [50.0, 50.0]))  # singleton partition
    df = _df(spark, rows, "int")
    # microscopic cell size: every row comes back short -> brute retry
    out = knn_self_join(
        df,
        k=3,
        partition_col="part",
        cell_size=1e-6,
        max_retries=2,
        brute_threshold=1000,
    ).toPandas()
    assert len(out) == 31, len(out)
    assert str(out.dtypes["part"]) in ("int32", "int64"), out.dtypes
    single = out[out.row_id == 100].iloc[0]
    assert single["part"] == 2
    assert list(single["knn_dists"]) == []
    filled = out[out.part == 1]
    assert (filled.knn_dists.map(len) == 3).all()


def _null_vs_none_df(spark, rng, n_per=16):
    """Rows in a NULL partition, a literal-'None' partition, and 'x'."""
    pts = rng.rand(n_per, 2)
    rows = []
    rid = 0
    ids_by_part = {}
    for part in (None, "None", "x"):
        ids_by_part[part] = set()
        for p in pts:
            rows.append((rid, part, list(map(float, p))))
            ids_by_part[part].add(rid)
            rid += 1
    pdf = pd.DataFrame(rows, columns=["row_id", "part", "features"])
    return spark.createDataFrame(pdf), ids_by_part


def test_null_partition_scoped_and_filled_cells_path(spark):
    """NULL partitions must get real neighbors (null-safe joins) and must
    never merge with a partition whose literal value is 'None'."""
    rng = np.random.RandomState(3)
    df, ids_by_part = _null_vs_none_df(spark, rng)
    out = knn_self_join(
        df, k=4, partition_col="part", cell_size=2.0, max_retries=2
    ).toPandas()
    assert len(out) == 48
    for _, r in out.iterrows():
        part = None if pd.isna(r["part"]) else r["part"]
        own = ids_by_part[part]
        assert set(r["knn_ids"]) <= own, (part, list(r["knn_ids"]))
        assert len(r["knn_ids"]) == 4, (part, list(r["knn_ids"]))


def test_null_partition_survives_brute_force_retry(spark):
    """Microscopic cell size forces every row through the brute-force
    retry: NULL-partition probes must still come back filled and scoped
    (the universe join and the candidate semi-join are null-safe)."""
    rng = np.random.RandomState(4)
    df, ids_by_part = _null_vs_none_df(spark, rng)
    out = knn_self_join(
        df,
        k=3,
        partition_col="part",
        cell_size=1e-7,
        max_retries=2,
        brute_threshold=1000,
    ).toPandas()
    assert len(out) == 48
    for _, r in out.iterrows():
        part = None if pd.isna(r["part"]) else r["part"]
        own = ids_by_part[part]
        assert set(r["knn_ids"]) <= own, (part, list(r["knn_ids"]))
        assert len(r["knn_ids"]) == 3, (part, list(r["knn_ids"]))


def test_null_partition_survives_grid_retry(spark):
    """Wider-cell grid retry branch (brute_threshold=0 disables the
    brute pass): NULL-partition rows must be re-probed, not dropped."""
    rng = np.random.RandomState(5)
    df, ids_by_part = _null_vs_none_df(spark, rng)
    out = knn_self_join(
        df,
        k=3,
        partition_col="part",
        cell_size=0.3,
        max_retries=3,
        brute_threshold=0,
    ).toPandas()
    assert len(out) == 48
    filled = out[out.knn_ids.map(len) == 3]
    assert len(filled) == 48, out[out.knn_ids.map(len) != 3]
    for _, r in out.iterrows():
        part = None if pd.isna(r["part"]) else r["part"]
        assert set(r["knn_ids"]) <= ids_by_part[part]


def test_colon_partition_values_stay_scoped(spark):
    """Identical coordinates planted in partitions 'a', 'a:1' and '1':
    every neighbor id must come from the row's OWN partition."""
    rng = np.random.RandomState(1)
    pts = rng.rand(20, 2)
    rows = []
    rid = 0
    ids_by_part = {}
    for part in ("a", "a:1", "1"):
        ids_by_part[part] = set()
        for p in pts:
            rows.append((rid, part, list(map(float, p))))
            ids_by_part[part].add(rid)
            rid += 1
    df = _df(spark, rows, "string")
    out = knn_self_join(
        df, k=4, partition_col="part", cell_size=2.0, max_retries=1
    ).toPandas()
    assert len(out) == 60
    for _, r in out.iterrows():
        own = ids_by_part[r["part"]]
        assert set(r["knn_ids"]) <= own, (r["part"], r["knn_ids"])
        assert len(r["knn_ids"]) == 4
