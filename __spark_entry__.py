"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship validate pass (constraint suite +
LoOP drift) over the sf0.001 documents table mapped into the engine's
code-table shape, returning the partition_metrics verdicts.

``queries()`` / ``oracle_sql()`` expose the operator surface from
SURVEY.md §2 on the driver tables; oracles run in DuckDB on the same
parquet.  Every registry query is oracle-checked — including the LoOP
drift kernel (generated Taylor-erf twin) and the binary media codecs
(decoded values recomputed from the md5 generation inputs).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from pynomaly_spark.checks import CheckSuite, run_suite

    doc = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    code_shaped = doc.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.md5("text").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    res = run_suite(code_shaped, CheckSuite.default())
    return res.metrics


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pynomaly_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pynomaly_spark.queries import ORACLES

    return dict(ORACLES)
