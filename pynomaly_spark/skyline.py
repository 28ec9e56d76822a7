"""Pareto-frontier (skyline) extraction over two criteria.

The skyline of a relation under (minimize ``lo``, maximize ``hi``) is
the set of rows no other row dominates — the classic multi-objective
shortlist ("cheapest part at every size class", "fastest mirror per
freshness tier").  Borzsonyi/Kossmann/Stocker (ICDE 2001) named the
operator; this implementation is the distributed two-level variant.

**Dominance rule.**  Point q dominates p iff ``q.lo <= p.lo AND
q.hi >= p.hi`` with at least one strict inequality.  Duplicate
``(lo, hi)`` points never dominate each other, so the operator first
collapses to DISTINCT value pairs (one keyed aggregate, map-side
combinable) carrying a duplicate count and a representative id — the
frontier logic then never has to reason about ties.

**Single-pass rule on sorted distinct pairs.**  Ordered by
``(lo ASC, hi DESC)``, a pair is dominated iff the running MAX of
``hi`` over all EARLIER rows is ``>= hi``:

* an earlier same-``lo`` row has strictly larger ``hi`` (pairs are
  distinct and the sort puts bigger ``hi`` first) — dominates;
* an earlier smaller-``lo`` row with ``hi' >= hi`` dominates;
* conversely any dominator sorts strictly earlier under this order.

So the frontier is ``prev_max(hi) IS NULL OR prev_max(hi) < hi`` — one
window, no self-join.

**Two-level scale shape (100 TB).**  A global sort window is a single
reducer — unacceptable.  But dominance survives subsetting: a globally
non-dominated point is non-dominated within ANY subset containing it.
So stage 1 computes LOCAL frontiers inside arbitrary hash buckets
(parallel windows, each bucket small), and stage 2 runs the same rule
once over the union of local survivors.  Stage-2 input is at most
``n_buckets × |local frontier|``; for value-distributed data the
frontier is O(log n) pairs, so the final window sees a few hundred
rows regardless of input size.  (Worst case — perfectly
anti-correlated criteria — the skyline IS the data; the operator is
inherently output-sized there, as every published skyline algorithm
is.)  Stage-1 correctness: every global-frontier point survives its
bucket; stage-2 correctness: a surviving non-frontier point is
dominated by some global-frontier point (dominance is transitive and
acyclic), which is present in the stage-2 input and eliminates it.

All comparisons are on the caller's (integer) columns — no float
arithmetic anywhere, so results are bit-identical across engines and
partitionings.

Reference parity: no counterpart in /root/reference/PyNomaly — engine
addition (multi-objective profiling family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skyline_2d"]


def skyline_2d(
    df: DataFrame,
    lo_col: str,
    hi_col: str,
    id_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Pareto frontier minimizing ``lo_col`` and maximizing ``hi_col``.

    Returns one row per frontier ``(lo, hi)`` value pair: ``lo, hi,
    n_dup`` (how many input rows carry that exact pair) and ``id_min``
    (the smallest ``id_col`` among them — a deterministic
    representative).  NULL in either criterion drops the row (NULL
    neither dominates nor is dominated under SQL comparison — excluded
    by definition here).

    ``n_buckets`` shapes stage-1 parallelism only; any value returns
    the identical frontier.
    """
    for c in (lo_col, hi_col, id_col):
        if c not in df.columns:
            raise ValueError(f"skyline_2d: unknown column {c!r}")
    if n_buckets < 1:
        raise ValueError(f"skyline_2d: n_buckets must be >= 1")
    pts = (
        df.where(F.col(lo_col).isNotNull() & F.col(hi_col).isNotNull())
        .groupBy(
            F.col(lo_col).alias("lo"), F.col(hi_col).alias("hi")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup"),
            F.min(id_col).alias("id_min"),
        )
    )

    def _frontier(frame: DataFrame, part_cols) -> DataFrame:
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(F.asc("lo"), F.desc("hi"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prev = F.max("hi").over(w)
        return frame.withColumn("_pm", prev).where(
            F.col("_pm").isNull() | (F.col("_pm") < F.col("hi"))
        ).drop("_pm")

    local = _frontier(
        pts.withColumn(
            "_b", F.pmod(F.xxhash64("lo", "hi"), F.lit(n_buckets))
        ),
        ["_b"],
    ).drop("_b")
    # Stage 2: the survivor set is tiny (see module doc) — one final
    # window over a constant partition key.
    return _frontier(local.withColumn("_g", F.lit(0)), ["_g"]).drop("_g")
