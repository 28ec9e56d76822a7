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

__all__ = ["rolling_range_aggs"]


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
