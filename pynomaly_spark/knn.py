"""Distributed kNN self-join (grid-bucketed, Catalyst-only).

For drift groups too large for one worker's memory, the engine computes an
approximate kNN with NO Python in the hot path:

1. quantize the first ``n_grid_dims`` feature dimensions onto a grid of
   ``cell_size`` (build side: one cell per row),
2. explode each probe row to its 3^D neighboring cells,
3. shuffle-join probe cells against build cells (AQE handles skewed cells),
4. per-pair Euclidean distance via ``zip_with`` + ``aggregate`` (JVM,
   whole-stage codegen),
5. per-row top-k by ``row_number()`` over a (dist, neighbor_id) window —
   neighbor id as the tie-breaker keeps the result deterministic.

With ``cell_size`` at least the true kNN radius of every row this is
EXACT (each row's k nearest all live within +/-1 cell); smaller cells trade
recall for join fan-in.  This mirrors the reference's only join — the
per-cluster kNN self-join (reference ``loop.py:648-694``) — re-expressed as
a Spark shuffle join instead of an in-RAM O(n^2) scan.

Scale notes: the join shuffles on cell id, so co-location is by spatial
cell, not by row; fan-in per row is bounded by cell occupancy (choose
``cell_size`` from a sampled radius estimate).  At 1000 executors the only
all-to-all movement is the one cell-keyed exchange.
"""

from __future__ import annotations

from itertools import product

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["knn_self_join", "estimate_cell_size"]


def _cell_expr(features_col: str, dim: int, cell_size: float):
    return F.floor(F.col(features_col).getItem(dim) / F.lit(float(cell_size)))


def estimate_cell_size(
    df: DataFrame, features_col: str, k: int, sample_rows: int = 2000
) -> float:
    """Estimate a cell size >= typical kNN radius from a driver-side sample.

    Heuristic: on a uniform-ish density, the kNN radius scales with
    (k / n)^(1/d) times the data extent; we take a generous multiple so the
    +/-1-cell neighborhood almost always contains the true k neighbors.
    """
    sample = df.select(features_col).limit(sample_rows).collect()
    import numpy as np

    pts = np.asarray([r[0] for r in sample], dtype=float)
    if pts.ndim == 1:
        pts = pts.reshape(-1, 1)
    n, d = pts.shape
    span = float(np.median(pts.max(axis=0) - pts.min(axis=0)))
    if span == 0.0:
        return 1.0
    frac = min(1.0, (float(k + 1) / max(n, 1)) ** (1.0 / min(d, 3)))
    return max(span * frac * 2.0, span / 64.0)


def knn_self_join(
    df: DataFrame,
    k: int,
    features_col: str = "features",
    id_col: str = "row_id",
    partition_col: str | None = None,
    cell_size: float | None = None,
    n_grid_dims: int = 2,
) -> DataFrame:
    """Return ``(id_col [, partition_col], knn_dists, knn_ids)`` arrays per row.

    ``partition_col`` scopes the join (never compares across groups, like
    the reference's per-cluster blocks).  Output arrays are ordered by
    distance ascending; downstream LoOP math only consumes the multiset.
    """
    if cell_size is None:
        cell_size = estimate_cell_size(df, features_col, k)

    dim_count_row = df.select(F.size(features_col).alias("d")).head()
    dims = min(int(dim_count_row["d"]), n_grid_dims)

    keep = [id_col, features_col] + ([partition_col] if partition_col else [])
    base = df.select(*keep)

    cell_cols = [
        _cell_expr(features_col, i, cell_size).alias(f"_c{i}") for i in range(dims)
    ]
    build = base.select(*keep, *cell_cols).withColumn(
        "_cell", F.concat_ws(":", *[F.col(f"_c{i}") for i in range(dims)])
    ).drop(*[f"_c{i}" for i in range(dims)])

    # probe side: each row targets its own cell plus all adjacent cells
    offsets = list(product((-1, 0, 1), repeat=dims))
    probe_cells = F.array(
        *[
            F.concat_ws(
                ":",
                *[
                    (_cell_expr(features_col, i, cell_size) + F.lit(o[i])).cast(
                        "long"
                    )
                    for i in range(dims)
                ],
            )
            for o in offsets
        ]
    )
    probe = base.select(
        F.col(id_col).alias("_qid"),
        F.col(features_col).alias("_qf"),
        *([F.col(partition_col).alias("_qp")] if partition_col else []),
        F.explode(probe_cells).alias("_cell"),
    )

    join_keys = ["_cell"] + (["_qp"] if partition_col else [])
    build_r = build.withColumnRenamed(id_col, "_nid").withColumnRenamed(
        features_col, "_nf"
    )
    if partition_col:
        build_r = build_r.withColumnRenamed(partition_col, "_qp")

    pairs = probe.join(build_r, on=join_keys, how="inner").where(
        F.col("_qid") != F.col("_nid")
    )

    # JVM-side Euclidean distance (whole-stage codegen; no Python)
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("_qf", "_nf", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    scored = pairs.select(
        "_qid",
        *(["_qp"] if partition_col else []),
        F.col("_nid"),
        dist.alias("_dist"),
    )

    w = Window.partitionBy("_qid").orderBy(F.col("_dist").asc(), F.col("_nid").asc())
    topk = scored.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)

    agg_keys = ["_qid"] + (["_qp"] if partition_col else [])
    result = (
        topk.groupBy(*agg_keys)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_dist", "_nid"))
            ).alias("_pairs")
        )
        .select(
            F.col("_qid").alias(id_col),
            *([F.col("_qp").alias(partition_col)] if partition_col else []),
            F.transform("_pairs", lambda s: s["_dist"]).alias("knn_dists"),
            F.transform("_pairs", lambda s: s["_nid"]).alias("knn_ids"),
        )
    )
    return result
