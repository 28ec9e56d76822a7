"""Event-sequence analytics: Markov transitions and CUSUM change flags.

Two sequence operators every behavioral/quality pipeline wants and
neither Spark nor the reference ships built-in:

* ``transition_counts`` — the first-order Markov transition matrix of a
  state column (which event type follows which), the standard input to
  session-flow analysis, anomalous-path detection, and synthetic-journey
  generation.
* ``cusum_flags`` — one-sided CUSUM change-point detection per entity.
  The textbook recursion ``C_i = max(0, C_{i-1} + (x_i - k))`` looks
  inherently sequential, but it has a closed window form:

      C_i = S_i - min(0, min_{j<=i} S_j)     with  S_i = cumsum(x - k)

  (induction: ``max(0, S_i - m_{i-1}) = S_i - min(S_i, m_{i-1})`` and
  ``min(S_i, m_{i-1}) = m_i``), so the whole detector is two stacked
  window expressions over ONE partition sort — no UDF, no iterative
  loop, no ``applyInPandasWithState``.

Cross-engine determinism: both operators order by integer microseconds
with an explicit unique tiebreak, so the sequence is a total order;
money is exact integer cents and every CUSUM quantity is an integer —
nothing floats except the single transition-probability division, which
is one IEEE op on exact integer inputs rounded to 6 dp on both engines.

Scale (100 TB): each operator is ONE shuffle keyed by the entity plus
one in-partition sort; the transition aggregation collapses map-side to
at most |states|² rows, and the CUSUM per-key rollup is a partial
aggregate.  Hot-key caveat as in ``sessions.sessionize`` (a single
entity's history must fit one task's sort spill; entities are the unit
of parallelism).

Reference parity: no counterpart in /root/reference/PyNomaly/loop.py —
engine additions for the pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["transition_counts", "cusum_flags"]


def transition_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str = "event_id",
    prob_round: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix of ``state_col`` within
    each entity's time-ordered event sequence.

    Returns ``prev_state, curr_state, n_pair, n_prev, p6`` where
    ``n_pair`` counts adjacent (prev → curr) occurrences across all
    entities, ``n_prev`` is the row-out total of ``prev_state`` (sum of
    its outgoing pairs), and ``p6 = round(n_pair / n_prev, 6)`` is the
    empirical transition probability.

    Null handling: rows with a NULL key, timestamp, or state are
    dropped BEFORE the lag, so transitions skip over unscorable rows
    (a→NULL→b contributes a→b) — the same convention as a tokenizer
    skipping malformed records.  Each entity's first event anchors no
    pair.

    Scale (100 TB): one shuffle keyed by the entity for the lag, then a
    (prev, curr) aggregate that combines map-side down to ≤|S|² rows;
    the ``n_prev`` window runs on that tiny grouped frame, never on the
    events.  The probability is ONE double division of two exact BIGINT
    counts — identical bits on any IEEE engine — rounded to ``prob_round``.
    """
    w = Window.partitionBy(key_col).orderBy("_us", tiebreak_col)
    pairs = (
        df.where(
            F.col(key_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(state_col).isNotNull()
        )
        .withColumn("_us", F.unix_micros(F.col(ts_col).cast("timestamp")))
        .select(
            F.lag(state_col).over(w).alias("prev_state"),
            F.col(state_col).alias("curr_state"),
        )
        .where(F.col("prev_state").isNotNull())
    )
    g = pairs.groupBy("prev_state", "curr_state").agg(
        F.count(F.lit(1)).alias("n_pair")
    )
    w_prev = Window.partitionBy("prev_state")
    return g.select(
        "prev_state",
        "curr_state",
        "n_pair",
        F.sum("n_pair").over(w_prev).alias("n_prev"),
        F.round(
            F.col("n_pair").cast("double")
            / F.sum("n_pair").over(w_prev).cast("double"),
            prob_round,
        ).alias("p6"),
    )


def cusum_flags(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    k_cents: int,
    threshold_cents: int,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """One-sided (upper) CUSUM change detector per entity.

    For each entity's time-ordered value series (exact integer cents),
    computes ``C_i = max(0, C_{i-1} + (cents_i - k_cents))`` via the
    cumsum-minus-running-min identity (module docstring) and rolls up:

    ``key, n_events, max_cusum, alarm, first_alarm_us`` — ``max_cusum``
    is the peak statistic, ``alarm`` is 1 iff it ever exceeds
    ``threshold_cents``, and ``first_alarm_us`` is the microsecond
    timestamp of the FIRST exceedance (NULL when never).

    Every quantity is a BIGINT on exact integer inputs — the detector
    is bit-identical on any engine with 64-bit integers.  Rows with a
    NULL key, timestamp, or value are dropped (an unscorable value
    cannot move the statistic; counting it would make ``n_events``
    disagree with the walk length).

    Scale (100 TB): one entity-keyed shuffle; the two window passes
    share the same partitioning and sort order so Spark plans ONE sort,
    and the final per-key rollup is a map-side partial aggregate.
    """
    if threshold_cents <= 0:
        raise ValueError(
            f"threshold_cents must be > 0, got {threshold_cents}"
        )
    w_rows = (
        Window.partitionBy(key_col)
        .orderBy("_us", tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        df.where(
            F.col(key_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .withColumn("_us", F.unix_micros(F.col(ts_col).cast("timestamp")))
        .withColumn(
            "_d",
            F.round(F.col(value_col) * 100).cast("long") - F.lit(k_cents),
        )
        .withColumn("_s", F.sum("_d").over(w_rows))
    )
    scored = cum.withColumn(
        "_c", F.col("_s") - F.least(F.lit(0).cast("long"), F.min("_s").over(w_rows))
    )
    return scored.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("_c").alias("max_cusum"),
        F.max((F.col("_c") > threshold_cents).cast("long")).alias("alarm"),
        F.min(F.when(F.col("_c") > threshold_cents, F.col("_us"))).alias(
            "first_alarm_us"
        ),
    )
