"""As-of (backward) join: each left row picks the most recent right row.

The operator the reference lacks and every event/feature pipeline needs:
align purchases to the latest preceding click, a metric to the last
config change, a trade to the prevailing quote.  Implemented with the
union-tag trick — interleave both sides into ONE key-partitioned window
and carry the right payload forward with ``last(..., ignorenulls)`` —
so the plan is a single shuffle on the join key and one window pass:

* no range-condition join (which Spark executes as a broadcast nested
  loop or an exploded inequality join — quadratic per key at scale);
* per-partition window state is ONE packed struct, independent of how
  far back the match lies;
* the right payload travels as one struct column, so every output
  column provably comes from the SAME matched right row (per-column
  ``last(ignorenulls)`` could mix rows when right values are null).

Cross-engine determinism (oracle twin uses DuckDB's native ASOF JOIN):
timestamps are compared as integer microseconds; equal-timestamp right
rows resolve to the greatest ``right_tiebreak`` on both engines; null
join keys never match (SQL equality semantics — Spark windows would
otherwise group them).

Semantics: inclusive (``left.ts >= right.ts``) by default, ``strict=True``
for ``>``; ``direction="forward"`` flips to the NEAREST FOLLOWING right
row (same plan, descending window order); optional ``tolerance_us``
nulls out matches outside the window (pandas ``merge_asof`` parity).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    right_ts_col: Optional[str] = None,
    payload_cols: Optional[Sequence[str]] = None,
    strict: bool = False,
    tolerance_us: Optional[int] = None,
    right_tiebreak: Optional[str] = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """Left table plus, per row, the payload of the latest right row at
    or before (``strict``: strictly before) its timestamp —
    ``direction="forward"``: the earliest right row at or after it.

    Output = every ``left`` column, plus ``matched_us`` (the matched
    right row's integer-µs timestamp) and ``<payload>{suffix}`` for each
    payload column — all null when nothing qualifies.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    right_ts_col = right_ts_col or ts_col
    if payload_cols is None:
        payload_cols = [
            c for c in right.columns if c not in on and c != right_ts_col
        ]
    payload_cols = list(payload_cols)
    if tolerance_us is not None and tolerance_us < 0:
        raise ValueError(f"tolerance_us must be >= 0, got {tolerance_us}")

    left_cols = left.columns
    keys = [f"_asof_k{i}" for i in range(len(on))]

    def us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    # right rows sort BEFORE same-µs left rows when inclusive, AFTER when
    # strict — the running last() then sees exactly the qualifying set
    right_ord = 2 if strict else 0
    # among equal-µs right rows the greatest tiebreak wins (last in
    # window order); the oracle twin dedupes with the same rule.  The
    # tiebreak keeps its NATIVE type — casting to double would lose
    # precision for 64-bit ids above 2^53 and equal-timestamp ties could
    # then resolve differently from the oracle's exact integer ORDER BY
    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)

    pay_t = F.struct(
        F.col("_asof_us").alias("matched_us"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    r = right.withColumn("_asof_us", us(right_ts_col)).select(
        *[F.col(k).alias(a) for k, a in zip(on, keys)],
        "_asof_us",
        F.lit(right_ord).alias("_asof_ord"),
        tb.alias("_asof_tb"),
        pay_t.alias("_asof_pay"),
    )
    row_t = F.struct(*[F.col(c).alias(c) for c in left_cols])
    l = left.withColumn("_asof_us", us(ts_col)).select(
        *[F.col(k).alias(a) for k, a in zip(on, keys)],
        "_asof_us",
        F.lit(1).alias("_asof_ord"),
        # left rows never tie with right rows on (_asof_us, _asof_ord),
        # so the tiebreak slot is a typed NULL, matching the right side
        F.lit(None).cast(r.schema["_asof_tb"].dataType).alias("_asof_tb"),
        F.lit(None).cast(r.schema["_asof_pay"].dataType).alias("_asof_pay"),
        row_t.alias("_asof_row"),
    )
    r = r.withColumn("_asof_row", F.lit(None).cast(l.schema["_asof_row"].dataType))

    # forward = the same running-last scan over DESCENDING time: the
    # last qualifying row in that order is the earliest at-or-after one
    ts_order = (
        F.col("_asof_us").desc()
        if direction == "forward"
        else F.col("_asof_us").asc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, "_asof_ord", "_asof_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_asof_pay", ignorenulls=True).over(w)

    # SQL equality-join semantics: a null in any key column never matches
    key_ok = F.lit(True)
    for k in keys:
        key_ok = key_ok & F.col(k).isNotNull()
    matched = F.when(key_ok, matched)
    if tolerance_us is not None:
        gap = (
            matched["matched_us"] - F.col("_asof_us")
            if direction == "forward"
            else F.col("_asof_us") - matched["matched_us"]
        )
        matched = F.when(gap <= F.lit(tolerance_us), matched)

    out = (
        l.unionByName(r)
        .withColumn("_asof_match", matched)
        .filter(F.col("_asof_ord") == 1)
    )
    proj = [F.col(f"_asof_row.{c}").alias(c) for c in left_cols]
    proj.append(F.col("_asof_match.matched_us").alias("matched_us"))
    proj.extend(
        F.col(f"_asof_match.{c}").alias(f"{c}{suffix}") for c in payload_cols
    )
    return out.select(*proj)


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    start_us_col: str = "start_us",
    end_us_col: str = "end_us",
    payload_cols: Optional[Sequence[str]] = None,
    bucket_us: int = 3_600_000_000,
    end_inclusive: bool = True,
    max_span_buckets: int = 4096,
) -> DataFrame:
    """Interval (range-containment) join without a range join: every
    event row paired with every same-key interval containing its
    timestamp — attribute events to campaigns, sessions, deploy
    windows, maintenance periods.  Overlapping intervals yield one
    output row per match; unmatched events are dropped (inner
    semantics, the classic contract).

    Spark executes a raw ``ts BETWEEN start AND end`` join as a
    broadcast nested loop (or an exploded inequality sort-merge) —
    quadratic per key at scale.  This operator BUCKETS the time axis
    instead: each interval explodes into the ``bucket_us``-wide bucket
    ids it covers (the small side fans out; ``max_span_buckets`` guards
    a runaway interval — raise ``bucket_us`` for long spans), each
    event maps to exactly ONE bucket, and the join is a plain
    hash-partitioned equi-join on ``(keys..., bucket)`` followed by the
    exact containment filter.  Each (event, interval) pair meets
    exactly once — the event's single bucket appears once in the
    interval's bucket set — so no post-join dedup is needed.

    ``intervals`` carries integer-µs ``start_us_col``/``end_us_col``
    (the engine's cross-engine time convention); ``ts_col`` is a
    timestamp.  Output = every event column, plus each payload column
    from the matched interval (collisions with event columns get an
    ``_iv`` suffix), plus the matched ``start_us``/``end_us``.
    """
    on = list(on)
    if bucket_us < 1:
        raise ValueError(f"bucket_us must be >= 1, got {bucket_us}")
    if max_span_buckets < 1:
        raise ValueError(
            f"max_span_buckets must be >= 1, got {max_span_buckets}"
        )
    if payload_cols is None:
        payload_cols = [
            c
            for c in intervals.columns
            if c not in on and c not in (start_us_col, end_us_col)
        ]
    payload_cols = list(payload_cols)

    s_us, e_us = F.col(start_us_col), F.col(end_us_col)
    span_buckets = (
        F.floor(e_us / bucket_us) - F.floor(s_us / bucket_us) + 1
    )
    # The guard LIVES IN the sequence's end bound so column pruning
    # cannot eliminate it: Spark's sequence(a, b) with b < a silently
    # DESCENDS (the decontam.ngrams trap) — an inverted interval would
    # fan out backwards, and a (0, 2^63) row would explode without
    # bound.  A null/inverted/over-span interval routes to raise_error
    # instead (when()'s null condition takes the otherwise branch, so
    # null bounds cannot silently drop rows either).
    ok = (
        s_us.isNotNull()
        & e_us.isNotNull()
        & (e_us >= s_us)
        & (span_buckets <= max_span_buckets)
    )
    end_bucket = F.when(ok, F.floor(e_us / bucket_us)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "interval_join: null/inverted interval or span > "
                    f"{max_span_buckets} buckets of {bucket_us}us "
                    "(raise bucket_us): start_us="
                ),
                s_us.cast("string"),
                F.lit(" end_us="),
                e_us.cast("string"),
            )
        ).cast("long")
    )

    iv_keys = [f"_iv_k{i}" for i in range(len(on))]
    iv = intervals.select(
        *[F.col(k).alias(a) for k, a in zip(on, iv_keys)],
        s_us.alias("_iv_s"),
        e_us.alias("_iv_e"),
        F.struct(
            s_us.alias("start_us"),
            e_us.alias("end_us"),
            *[F.col(c).alias(c) for c in payload_cols],
        ).alias("_iv_pay"),
        F.explode(
            F.sequence(F.floor(s_us / bucket_us), end_bucket)
        ).alias("_iv_b"),
    )

    ev_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.withColumn("_ev_us", ev_us).withColumn(
        "_ev_b", F.floor(F.col("_ev_us") / bucket_us)
    )
    cond = [
        ev[k] == iv[a] for k, a in zip(on, iv_keys)
    ] + [ev["_ev_b"] == iv["_iv_b"]]
    contain = (F.col("_ev_us") >= F.col("_iv_s")) & (
        F.col("_ev_us") <= F.col("_iv_e")
        if end_inclusive
        else F.col("_ev_us") < F.col("_iv_e")
    )
    joined = ev.join(iv, cond, "inner").where(contain)
    out_pay = [
        F.col("_iv_pay")[f].alias(
            f if f not in events.columns else f"{f}_iv"
        )
        for f in ["start_us", "end_us", *payload_cols]
    ]
    return joined.select(*[ev[c] for c in events.columns], *out_pay)
