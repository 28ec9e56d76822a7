"""Event-stream feature engineering: trailing time-range aggregates.

The per-entity "state of the last N hours" features every behavioral
model trains on: for EACH event row, the count / sum / max of the
entity's activity in a trailing time window ending at (and including)
that event.  Pure window expressions over a RANGE frame — no UDFs, no
self-join (the naive formulation is an interval self-join that
re-bills every event once per neighbor; the RANGE frame computes all
rows in one sorted pass with a sliding accumulator in both engines).

Cross-engine determinism: the frame is ordered by integer microseconds
(``unix_micros`` / ``epoch_us``) and RANGE frames include ALL peer
rows at the boundary timestamp by SQL definition, so the frame
membership — and therefore every aggregate — is set-identical across
engines regardless of how ties are physically ordered.  Money is
carried as exact integer cents (``CAST(round(value*100) AS BIGINT)``
on both sides, the engine's established fixed-point device): integer
sums are order-independent, float sums are not.

Scale (100 TB): one shuffle keyed by the entity, one in-partition sort;
per-row cost is amortized O(1) (two frame pointers advance
monotonically).  Hot-key caveat and mitigation as in
``sessions.sessionize``.  At 1000 executors the key shuffle is the
whole cost — there is nothing to broadcast and no second pass.

Reference parity: no counterpart in /root/reference/PyNomaly/loop.py —
engine addition for the pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rolling_range_aggs", "quantile_bins"]


def rolling_range_aggs(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_minutes: float,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per input row: trailing-window activity aggregates for its key.

    Returns ``key, tiebreak, us, value_cents, trail_cnt,
    trail_sum_cents, trail_max_cents`` where the ``trail_*`` columns
    aggregate all of the key's rows with timestamp in
    ``[us - window, us]`` (inclusive both ends — RANGE semantics).

    NULL values contribute NULL cents: ``trail_cnt`` still counts the
    row (it is activity), ``sum``/``max`` skip it (SQL aggregate
    semantics, identical cross-engine).  NULL keys form their own
    group, consistent on both engines.
    """
    if window_minutes <= 0:
        raise ValueError(f"window_minutes must be > 0, got {window_minutes}")
    window_us = int(window_minutes * 60 * 1_000_000)
    cents = F.round(F.col(value_col) * 100).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy("_us")
        .rangeBetween(-window_us, 0)
    )
    return (
        df.withColumn("_us", F.unix_micros(F.col(ts_col).cast("timestamp")))
        .withColumn("value_cents", cents)
        .select(
            key_col,
            tiebreak_col,
            F.col("_us").alias("us"),
            "value_cents",
            F.count(F.lit(1)).over(w).alias("trail_cnt"),
            F.sum("value_cents").over(w).alias("trail_sum_cents"),
            F.max("value_cents").over(w).alias("trail_max_cents"),
        )
    )


def quantile_bins(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int = 10,
    coarse_width: float = 64.0,
) -> DataFrame:
    """Exact equal-frequency discretization: assign each row to one of
    ``k`` rank-based bins, ``bin = ((rank - 1) * k) div n`` over the
    total order (value, id).

    Returns ``id, value, rank`` (1-based global), ``bin`` (0..k-1).
    Bin sizes differ by at most one, with the larger bins spread evenly
    — deliberately NOT ``ntile``, which front-loads the remainder and
    differs between engines' implementations; the explicit integer
    formula is engine-independent.  Ties at a bin boundary split by
    ``id`` — deterministic cross-engine.

    Scale (100 TB): the naive form is one GLOBAL window — every row
    through a single reducer.  This is the two-level rank instead (the
    distributed prefix-sum shape shared with ``packing.pack_chunks``
    and ``sampling.shuffle_order``): rows bucket by the MONOTONE coarse
    key ``floor(value / coarse_width)``, rank locally within their
    bucket, and add a per-bucket offset from the cumulative bucket
    counts — a frame with one row PER BUCKET, the only thing that ever
    passes through a single-partition window.  Pick ``coarse_width``
    so bucket count is thousands, each bucket executor-sized.

    NULL values / ids are excluded (a NULL has no rank; rank-bin a
    filled or flagged copy instead).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if coarse_width <= 0:
        raise ValueError(f"coarse_width must be > 0, got {coarse_width}")
    x = F.col(value_col)
    src = df.where(x.isNotNull() & F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        x.alias("value"),
        F.floor(x / F.lit(coarse_width)).cast("long").alias("_b"),
    )
    local = src.withColumn(
        "_lr",
        F.row_number().over(
            Window.partitionBy("_b").orderBy("value", "id")
        ),
    )
    counts = src.groupBy("_b").agg(F.count(F.lit(1)).alias("_bn"))
    # one row per bucket: the exclusive prefix sum and the grand total
    # both come from this tiny frame, never from the row-level data
    w_off = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        F.col("_b").alias("_ob"),
        F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_bn").over(
            Window.orderBy("_b").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    )
    ranked = local.join(
        F.broadcast(offsets), F.col("_b") == F.col("_ob")
    ).select(
        "id",
        "value",
        (F.col("_off") + F.col("_lr")).alias("rank"),
        "_n",
    )
    return ranked.select(
        "id",
        "value",
        "rank",
        F.expr(f"((rank - 1) * {int(k)}) div _n").cast("long").alias("bin"),
    )
