"""Skew handling: hot-group detection + salted sub-partitioning.

The reference computes each cluster serially in RAM and has no skew story
(SURVEY.md §4).  At scale, one hot partition (a dominant lang or repo)
turns the grouped LoOP stage into a single straggler task.  The engine's
answer, per the north rule:

* AQE (enabled in :mod:`pynomaly_spark.session`) handles skewed JOINS
  (splits oversized shuffle partitions at runtime);
* the grouped LoOP UDF is NOT a join, so AQE cannot split it — instead we
  SALT: groups whose row count exceeds ``max_group_rows`` are split into
  ``ceil(n / max_group_rows)`` deterministic sub-groups scored
  independently.  LoOP's per-group aggregates are not salt-decomposable,
  so this is a documented approximation: each sub-group is an independent
  LoOP fit (a uniform random sample of the partition), which preserves
  the score distribution; only partitions under the threshold get the
  golden-exact single-fit semantics.

Salt assignment is deterministic (xxhash64 of the row id), so reruns and
checkpoint resumes see identical sub-groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["group_sizes", "with_salt"]


def group_sizes(df: DataFrame, partition_col: str = "partition_id") -> DataFrame:
    """One tiny row per group: (partition value, row count)."""
    return df.groupBy(partition_col).agg(F.count(F.lit(1)).alias("n_rows"))


def with_salt(
    df: DataFrame,
    max_group_rows: int,
    partition_col: str = "partition_id",
    id_col: str = "row_id",
    salt_col: str = "salt",
) -> DataFrame:
    """Attach a deterministic salt that subdivides oversized groups.

    Groups with ``n <= max_group_rows`` get salt 0 (exact single-fit path);
    larger groups get ``salt in [0, ceil(n/max_group_rows))`` via
    ``xxhash64(id) pmod buckets``.  The per-group size table is tiny and
    broadcast.
    """
    sizes = group_sizes(df, partition_col).withColumn(
        "_buckets",
        F.ceil(F.col("n_rows") / F.lit(int(max_group_rows))).cast("int"),
    )
    out = df.join(F.broadcast(sizes), on=partition_col, how="inner")
    return out.withColumn(
        salt_col,
        F.when(F.col("_buckets") <= 1, F.lit(0)).otherwise(
            F.pmod(F.xxhash64(F.col(id_col)), F.col("_buckets")).cast("int")
        ),
    ).drop("n_rows", "_buckets")
