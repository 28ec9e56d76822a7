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

__all__ = ["key_frequency_histogram", "join_key_profile"]


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
