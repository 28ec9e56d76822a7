"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine_topk` — brute-force exact top-k: broadcast the query set,
  JVM-side dot products (``zip_with`` + ``aggregate``), per-query window
  top-k.  The baseline and the verifier for the approximate path.
* :func:`rp_lsh_topk` — random-hyperplane LSH: a fixed seeded set of
  hyperplanes (driver-side literals), JVM-side sign bits -> bucket id,
  candidates restricted to the same bucket (optionally multi-probe to
  Hamming-1 neighbors), exact cosine + window top-k inside buckets.
  At scale the bucket join replaces the O(n*q) cross product with
  O(n*q / 2^planes) expected pairs.

No Python executes per row; the hyperplane dot products compile to
whole-stage-codegen expressions.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine_topk", "rp_lsh_topk"]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query over all items.

    ``queries`` is expected to be small (broadcast); items stream past it
    map-side, so the only shuffle is the per-query window.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qv")
    )
    pairs = items.join(
        F.broadcast(q), F.col(id_col) != F.col(query_id_col)
    )
    cos = _dot("_qv", vec_col) / (_norm("_qv") * _norm(vec_col))
    scored = pairs.select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        cos.alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def _bucket_expr(vec_col: str, planes: list):
    """Bucket id = bit-packed signs of hyperplane dot products."""
    bits = []
    for i, p in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in p])
        d = _dot(lit_plane, vec_col)
        bits.append(F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def rp_lsh_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k cosine via random-hyperplane buckets.

    ``multiprobe`` also probes every Hamming-1 bucket of the query's code
    (n_planes extra probes), trading join fan-in for recall — the standard
    answer to LSH boundary misses.
    """
    dim = len(items.select(vec_col).head()[0])
    planes = _hyperplanes(dim, n_planes, seed)

    it = items.select(
        F.col(id_col),
        F.col(vec_col),
        _bucket_expr(vec_col, planes).alias("_bucket"),
    )

    qb = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qv"),
        _bucket_expr(vec_col, planes).alias("_qbucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("_qbucket"),
            *[
                F.col("_qbucket").bitwiseXOR(F.lit(1 << i))
                for i in range(n_planes)
            ],
        )
    else:
        probes = F.array(F.col("_qbucket"))
    q = qb.select(
        query_id_col, "_qv", F.explode(probes).alias("_bucket")
    )

    pairs = it.join(F.broadcast(q), on="_bucket").where(
        F.col(id_col) != F.col(query_id_col)
    )
    cos = _dot("_qv", vec_col) / (_norm("_qv") * _norm(vec_col))
    scored = pairs.select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        cos.alias("cosine"),
    ).dropDuplicates([query_id_col, "neighbor_id"])
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )
