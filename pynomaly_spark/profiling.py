"""Pre-shuffle data profiling: key-skew histograms and join key profiles.

The two questions every 100-TB job should answer BEFORE shuffling:

* ``key_frequency_histogram`` — how skewed is this key?  Per-key counts
  bucketed into power-of-two frequency bands (bucket ``b`` holds keys
  with ``2^b <= count < 2^(b+1)``), plus a grand-total row.  The shape
  of this histogram decides salting: a fat top bucket means the
  straight ``groupBy``/``join`` serializes through a handful of
  reducers.  One keyed shuffle (map-side partial counts) + one tiny
  rollup — the histogram itself is at most 64 rows per key.
* ``join_key_profile`` — before joining two big relations, measure the
  exact key overlap, per-side orphans, and the exact output cardinality
  ``sum(cnt_l * cnt_r)``.  Each side aggregates to distinct keys first
  (map-side combine), so the full-outer join runs on the REDUCED
  frames; no row-level join is ever executed.

Cross-engine determinism: every output is integer arithmetic except
``row_share``, an exact integer ratio rendered at 6 dp on both engines.
The frequency bucket is ``length(bin(cnt)) - 1`` — a binary-string
length, not a float ``log2`` — so bucket edges cannot ulp-drift
(``F.bin`` in Spark, ``bin()`` in DuckDB produce the same digits).

Scale notes (100 TB):

* The per-key count aggregate is the ONLY pass over the base data in
  both operators; everything downstream is per-key or per-bucket.
* ``key_frequency_histogram`` derives the grand total with a ROLLUP
  grouping set — the total row shares the same aggregate, not a second
  scan — and attaches ``row_share`` via a 1-row broadcast of the total
  (the per-key count exchange is reused across the two branches; the
  plan carries one ReusedExchange, asserted in tests).
* ``join_key_profile``'s sums are BIGINT; at true petabyte row counts
  promote ``est_join_rows`` to ``decimal(38,0)`` the way the suite's
  checksum phase does (checks.py) — kept BIGINT here because the
  DuckDB oracle renders HUGEINT as float (the events_sessions lesson,
  tests/test_oracle_types.py).

Reference parity: profiling has no counterpart in
/root/reference/PyNomaly/loop.py — it is engine-level tooling required
by the north rule's skew handling (salted repartitioning decisions need
a measured skew profile, not a guess).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["key_frequency_histogram", "join_key_profile", "robust_group_outliers"]


def key_frequency_histogram(
    df: DataFrame,
    key_cols: Union[str, Sequence[str]],
    key_name: Optional[str] = None,
) -> DataFrame:
    """Power-of-two histogram of per-key row counts.

    Returns one row per occupied frequency bucket plus a grand-total
    row with ``bucket = -1``:

    ``key_name`` (string tag), ``bucket`` (long; keys appearing
    ``2^bucket .. 2^(bucket+1)-1`` times; -1 = total), ``n_keys``,
    ``n_rows``, ``max_cnt`` (longs), ``row_share`` (fraction of all
    rows that live in this bucket's keys, 6 dp).

    A NULL key groups as one key, matching SQL GROUP BY semantics on
    both engines.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    tag = key_name or "+".join(key_cols)

    cnts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    bucketed = cnts.withColumn(
        "bucket", (F.length(F.bin(F.col("cnt"))) - F.lit(1)).cast("long")
    )
    # ROLLUP: per-bucket rows + ONE grand-total row from the same
    # aggregate — no second pass over the per-key counts
    hist = bucketed.rollup("bucket").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    # 1-row broadcast of the total; the per-key count exchange is
    # identical in both branches and plans as a ReusedExchange
    total = hist.where(F.col("bucket").isNull()).select(
        F.col("n_rows").alias("_total_rows")
    )
    return (
        hist.crossJoin(F.broadcast(total))
        .select(
            F.lit(tag).alias("key_name"),
            F.coalesce(F.col("bucket"), F.lit(-1)).alias("bucket"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("max_cnt").cast("long").alias("max_cnt"),
            F.round(
                F.col("n_rows") / F.col("_total_rows").cast("double"), 6
            ).alias("row_share"),
        )
    )


def join_key_profile(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """One-row exact profile of a prospective equi-join.

    Columns (all BIGINT): ``rows_left``, ``rows_right``, ``keys_left``,
    ``keys_right``, ``keys_both``, ``keys_left_only``,
    ``keys_right_only``, ``est_join_rows`` (exact inner-join output
    cardinality ``sum(cnt_l * cnt_r)`` over matched keys),
    ``max_fanout`` (largest single-key contribution; 0 if no overlap).

    NULL join keys never match in an equi-join, so NULL-keyed rows are
    excluded from both sides up front (they can only produce orphans).
    """
    lc = (
        left.where(F.col(left_key).isNotNull())
        .groupBy(F.col(left_key).alias("k"))
        .agg(F.count(F.lit(1)).alias("cl"))
    )
    rc = (
        right.where(F.col(right_key).isNotNull())
        .groupBy(F.col(right_key).alias("k"))
        .agg(F.count(F.lit(1)).alias("cr"))
    )
    j = lc.join(rc, "k", "full_outer")
    both = F.col("cl").isNotNull() & F.col("cr").isNotNull()
    return j.agg(
        F.coalesce(F.sum("cl"), F.lit(0)).cast("long").alias("rows_left"),
        F.coalesce(F.sum("cr"), F.lit(0)).cast("long").alias("rows_right"),
        F.count("cl").cast("long").alias("keys_left"),
        F.count("cr").cast("long").alias("keys_right"),
        F.sum(both.cast("long")).cast("long").alias("keys_both"),
        F.sum(F.col("cr").isNull().cast("long"))
        .cast("long")
        .alias("keys_left_only"),
        F.sum(F.col("cl").isNull().cast("long"))
        .cast("long")
        .alias("keys_right_only"),
        F.coalesce(F.sum(F.col("cl") * F.col("cr")), F.lit(0))
        .cast("long")
        .alias("est_join_rows"),
        F.coalesce(F.max(F.col("cl") * F.col("cr")), F.lit(0))
        .cast("long")
        .alias("max_fanout"),
    )


def robust_group_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier profile: median / MAD and the share of
    rows beyond ``k`` MADs (the quality-filtering gate that mean/std
    cannot provide on heavy-tailed web data — a single 1 GB document
    drags a mean, not a median).

    Returns per group: ``n``, ``med``, ``mad`` (4 dp, the engine's
    percentile render), ``n_outliers`` (rows with
    ``|x - med| > k * mad``), ``outlier_share`` (6 dp).  Groups with
    ``mad = 0`` (at least half the values identical to the median)
    report zero outliers: the scale estimate is degenerate, so the gate
    abstains rather than flagging every nonidentical row.  NULL values
    are excluded (they are a missingness question — ``NullRate`` —
    not a dispersion question); NULL group keys form their own group.

    Cross-engine determinism: Spark ``percentile`` and DuckDB
    ``quantile_cont`` both linearly interpolate, and on integer inputs
    every median is ``x.0`` or ``x.5`` — exact in binary doubles, so
    deviations and the ``k * mad`` threshold compare exactly (``k``
    defaults to a dyadic 3.0).

    Scale (100 TB): two grouped EXACT-percentile aggregates (median,
    then MAD) and one re-scan with the per-group thresholds joined
    back — the group frame is group-cardinality-sized and broadcasts.
    Exact per-group percentiles materialize each group's values on one
    reducer; with millions of rows per group, swap ``percentile`` for
    ``approx_percentile`` at an accuracy budget — kept exact here
    because the oracle must hash-match.
    """
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    vals = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"), F.col(value_col).alias("_x")
    )
    # every derived frame renames its group key: these are self-joins
    # on vals' lineage, and a shared `_g` is ambiguous to the analyzer
    med = vals.groupBy(F.col("_g").alias("_gm")).agg(
        F.expr("percentile(_x, 0.5)").alias("_med"),
        F.count(F.lit(1)).alias("_n"),
    )
    dev = vals.join(F.broadcast(med), F.col("_g").eqNullSafe(F.col("_gm"))).select(
        F.col("_g").alias("_gd"),
        F.abs(F.col("_x") - F.col("_med")).alias("_dev"),
    )
    mad = dev.groupBy(F.col("_gd").alias("_ga")).agg(
        F.expr("percentile(_dev, 0.5)").alias("_mad")
    )
    prof = med.join(
        F.broadcast(mad), F.col("_gm").eqNullSafe(F.col("_ga"))
    ).select("_gm", "_n", "_med", "_mad")
    flagged = vals.join(
        F.broadcast(prof), F.col("_g").eqNullSafe(F.col("_gm")), "inner"
    ).select(
        F.col("_g").alias("g"),
        F.col("_n"),
        F.col("_med"),
        F.col("_mad"),
        (
            (F.col("_mad") > 0)
            & (F.abs(F.col("_x") - F.col("_med")) > F.lit(k) * F.col("_mad"))
        ).cast("long").alias("_is_out"),
    )
    return flagged.groupBy("g", "_n", "_med", "_mad").agg(
        F.sum("_is_out").alias("n_outliers")
    ).select(
        F.col("g").alias(group_col),
        F.col("_n").cast("long").alias("n"),
        F.round("_med", 4).alias("med"),
        F.round("_mad", 4).alias("mad"),
        F.col("n_outliers").cast("long").alias("n_outliers"),
        F.round(F.col("n_outliers") / F.col("_n").cast("double"), 6).alias(
            "outlier_share"
        ),
    )
