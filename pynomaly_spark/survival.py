"""Survival analysis over event/order streams: the Kaplan–Meier
at-risk table with right-censoring.

Churn, time-to-next-purchase, time-to-failure, label-latency — every
one is a *survival* question: spells that end in an observed event
compete with spells still open when the observation window closes
(right-censored).  Averaging only the completed spells is the classic
churn-analysis bias; the Kaplan–Meier construction fixes it by keeping
censored spells in the denominator until the instant they leave.

This module computes the KM *at-risk table* — for every distinct
spell length ``t``: the number still at risk ``n_t``, observed events
``d_t``, and censored exits ``c_t`` — plus the discrete hazard
``d_t/n_t`` in truncating 6-dp fixed point.  Everything that decides a
value is integer arithmetic, so the output is bit-identical on any
engine and any partitioning.  (The survival curve itself is
``Π(1 - d/n)`` — a cumulative product of rationals whose float
evaluation is order-sensitive; consumers derive it from the exact
table, which is the auditable artifact.)

Scale (100 TB): one entity-keyed shuffle builds spells (lag/lead
window per entity — each entity's history is small), one
map-side-combined aggregate collapses spells to the per-``t`` table
(``|distinct t|`` rows, bounded by the observation window in days —
control-plane sized), and the suffix-sum for ``n_t`` runs as a window
over THAT collapsed frame only.  No global scan ever sees row-grain
data.

Reference parity: no counterpart in /root/reference/PyNomaly —
engine addition (training-data pipeline analytics family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["km_table"]


def km_table(
    df: DataFrame,
    entity_col: str,
    time_col: str,
    horizon_col: str | None = None,
) -> DataFrame:
    """Kaplan–Meier at-risk table for inter-event spells.

    Each entity's distinct event days (integer day ids from
    ``time_col``, a timestamp) form spells: day → next day is an
    OBSERVED spell of length ``next - day``; the last day's spell is
    CENSORED at the corpus max day (or ``horizon_col``'s max if
    given).  Zero-length censored spells (an entity's last activity on
    the horizon day itself) carry no information and are dropped.

    Returns one row per distinct spell length ``t > 0``::

        t, n_at_risk, events, censored, hazard_6dp

    ``n_at_risk`` = spells with length ≥ t (suffix sum over the
    collapsed table); ``hazard_6dp`` = ``(events·10⁶) div n_at_risk``
    (truncating integer division — identical to DuckDB ``//``).
    """
    for c in (entity_col, time_col):
        if c not in df.columns:
            raise ValueError(f"km_table: unknown column {c!r}")
    day = F.expr(
        f"unix_micros(cast({time_col} as timestamp)) div 86400000000"
    )
    act = (
        df.where(F.col(entity_col).isNotNull() & F.col(time_col).isNotNull())
        .select(F.col(entity_col).alias("_e"), day.alias("_d"))
        .distinct()
    )
    # Horizon: max day over the corpus — a 1-row aggregate cross-joined
    # (broadcast), never a driver-side collect.
    hsrc = act if horizon_col is None else df.select(
        F.expr(
            f"unix_micros(cast({horizon_col} as timestamp)) div 86400000000"
        ).alias("_d")
    )
    horizon = hsrc.agg(F.max("_d").alias("_h"))
    w = Window.partitionBy("_e").orderBy("_d")
    spells = (
        act.withColumn("_nxt", F.lead("_d").over(w))
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(F.col("_nxt").isNotNull(), F.col("_nxt") - F.col("_d"))
            .otherwise(F.col("_h") - F.col("_d"))
            .alias("t"),
            F.when(F.col("_nxt").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("_ev"),
        )
        .where(F.col("t") > 0)
    )
    per_t = spells.groupBy("t").agg(
        F.sum("_ev").cast("long").alias("events"),
        (F.count(F.lit(1)) - F.sum("_ev")).cast("long").alias("censored"),
    )
    # Suffix sum over the collapsed per-t frame only (|t| ≤ window
    # days — control-plane sized; a global window here is safe).
    w_sfx = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_t.withColumn(
            "n_at_risk",
            F.sum(F.col("events") + F.col("censored")).over(w_sfx)
            .cast("long"),
        )
        .select(
            F.col("t").cast("long").alias("t"),
            "n_at_risk",
            "events",
            "censored",
            F.expr("(events * 1000000L) div n_at_risk")
            .cast("long")
            .alias("hazard_6dp"),
        )
    )
