"""Population Stability Index — the lightweight distribution-drift check.

Complements the LoOP kernel (drift.py): where LoOP scores individual
rows, PSI scores whole partitions — "has this partition's value
distribution shifted against the corpus baseline?"  The standard gate
in feature/data-quality monitoring (PSI < 0.1 stable, 0.1-0.25 drifting,
> 0.25 shifted).

Plan shape (the 100-TB story): the per-partition histogram is ONE
``groupBy(partition)`` pass of ``n_bins`` conditional sums packed into an
array column — map-side partial aggregation, no bin spine, no join that
could trip on null partition keys.  The global baseline histogram is the
same aggregate without keys (one row, broadcast by the cross join), and
the PSI fold is a ``zip_with`` + ``aggregate`` over two 16-slot arrays —
all JVM expressions, zero Python.

Definition: with additive smoothing ``eps`` per bin (so empty bins never
divide by zero and both engines share the exact formula),

    p_i = (c_i + eps) / (n + eps * B)        (partition)
    q_i = (g_i + eps) / (N + eps * B)        (baseline)
    PSI = sum_i (p_i - q_i) * ln(p_i / q_i)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

__all__ = [
    "histogram_psi",
    "histogram_ks",
    "baseline_histogram",
    "histogram_w1",
    "baseline_cumulative",
]


def _bin(x: Column, n_bins: int, bin_width: float) -> Column:
    return F.greatest(
        F.lit(0),
        F.least(F.lit(n_bins - 1), F.floor(x / F.lit(bin_width)).cast("int")),
    )


def histogram_psi(
    df: DataFrame,
    value_col: str,
    partition_col: str,
    n_bins: int = 16,
    bin_width: float = 40.0,
    eps: float = 0.5,
) -> DataFrame:
    """Per-partition PSI of ``value_col``'s histogram vs the global
    (all-partitions) baseline.  Nulls and NaNs in ``value_col`` are
    excluded (Spark casts ``floor(NaN)`` to int 0, which would silently
    bin NaN into bin 0 while DuckDB errors on the same cast);
    values outside ``[0, n_bins * bin_width)`` clamp into the edge bins.

    Returns ``(partition_col, n_rows, psi)`` — psi rounded to 6 dp.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if bin_width <= 0 or eps <= 0:
        raise ValueError("bin_width and eps must be > 0")

    x = F.col(value_col).cast("double")
    obs = df.filter(x.isNotNull() & ~F.isnan(x)).select(
        F.col(partition_col), _bin(x, n_bins, bin_width).alias("_bin")
    )
    hist_cols = [
        F.sum(F.when(F.col("_bin") == i, 1).otherwise(0)).cast("double").alias(f"_h{i}")
        for i in range(n_bins)
    ]
    part_h = obs.groupBy(partition_col).agg(*hist_cols)
    glob_h = obs.agg(*hist_cols)

    arr = F.array(*[F.col(f"_h{i}") for i in range(n_bins)])
    part = part_h.select(
        partition_col,
        arr.alias("_p"),
        F.aggregate(arr, F.lit(0.0), lambda a, c: a + c).alias("_n"),
    )
    glob = glob_h.select(
        arr.alias("_q"),
        F.aggregate(arr, F.lit(0.0), lambda a, c: a + c).alias("_gn"),
    )

    joined = part.crossJoin(F.broadcast(glob))
    b = float(n_bins)
    terms = F.zip_with(
        F.col("_p"),
        F.col("_q"),
        lambda c, g: (
            (c + F.lit(eps)) / (F.col("_n") + F.lit(eps) * F.lit(b))
            - (g + F.lit(eps)) / (F.col("_gn") + F.lit(eps) * F.lit(b))
        )
        * F.log(
            ((c + F.lit(eps)) / (F.col("_n") + F.lit(eps) * F.lit(b)))
            / ((g + F.lit(eps)) / (F.col("_gn") + F.lit(eps) * F.lit(b)))
        ),
    )
    return joined.select(
        partition_col,
        F.col("_n").cast("long").alias("n_rows"),
        F.round(
            F.aggregate(terms, F.lit(0.0), lambda a, t: a + t), 6
        ).alias("psi"),
    )


def baseline_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 16,
    bin_width: float = 40.0,
) -> list:
    """Pooled histogram counts as driver-side floats — the FROZEN
    baseline a streaming drift monitor scores incoming windows against
    (mirrors the reference's fit-then-stream split: the model is pinned
    at fit time, never updated by the stream it judges).  One aggregate
    row of ``n_bins`` counters — control-plane sized, not row data.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if bin_width <= 0:
        raise ValueError("bin_width must be > 0")
    x = F.col(value_col).cast("double")
    obs = df.filter(x.isNotNull() & ~F.isnan(x)).select(
        _bin(x, n_bins, bin_width).alias("_bin")
    )
    row = obs.agg(
        *[
            F.sum(F.when(F.col("_bin") == i, 1).otherwise(0))
            .cast("double")
            .alias(f"_h{i}")
            for i in range(n_bins)
        ]
    ).first()
    return [float(row[i] or 0.0) for i in range(n_bins)]


def histogram_ks(
    df: DataFrame,
    value_col: str,
    partition_col: str,
    n_bins: int = 32,
    bin_width: float = 20.0,
) -> DataFrame:
    """Grid two-sample Kolmogorov-Smirnov statistic per partition vs the
    pooled baseline: ``D = max_i |F_part(edge_i) - F_pool(edge_i)|`` with
    both empirical CDFs evaluated at the ``n_bins`` grid edges.  The
    rank-free sibling of :func:`histogram_psi` — PSI weighs *density*
    ratios bin by bin (log-sensitive to tail bins), KS reads the largest
    *cumulative* gap, the classic location/shape-shift test.

    Plan shape: the CDF comes straight out of ONE ``groupBy(partition)``
    pass — each of the ``n_bins`` slots is a conditional *cumulative*
    count ``sum(bin <= i)``, so no second pass, no spine join, no
    per-partition sort (the exact-rank KS would need a full sort per
    partition; the grid variant is the 100-TB-sane form, and at B bins
    its error vs exact KS is bounded by the mass of one bin).  Baseline
    is the keyless twin broadcast via cross join; the sup-norm is a
    ``zip_with`` + ``array_max`` over two B-slot arrays — all JVM.

    Unlike PSI no smoothing is needed (a partition only appears with
    >= 1 non-null row, and cumulative counts divide by that total), so
    both engines compute bit-identical IEEE divisions — no sum-order
    reassociation anywhere.

    Returns ``(partition_col, n_rows, ks)`` — ks rounded to 6 dp.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if bin_width <= 0:
        raise ValueError("bin_width must be > 0")

    x = F.col(value_col).cast("double")
    obs = df.filter(x.isNotNull() & ~F.isnan(x)).select(
        F.col(partition_col), _bin(x, n_bins, bin_width).alias("_bin")
    )
    cum_cols = [
        F.sum(F.when(F.col("_bin") <= i, 1).otherwise(0))
        .cast("double")
        .alias(f"_c{i}")
        for i in range(n_bins)
    ]
    arr = F.array(*[F.col(f"_c{i}") for i in range(n_bins)])
    # the last slot counts bin <= n_bins-1 == every row (bins are clamped)
    part = obs.groupBy(partition_col).agg(*cum_cols).select(
        partition_col, arr.alias("_p"), F.element_at(arr, n_bins).alias("_pt")
    )
    glob = obs.agg(*cum_cols).select(
        arr.alias("_q"), F.element_at(arr, n_bins).alias("_qt")
    )

    joined = part.crossJoin(F.broadcast(glob))
    diffs = F.zip_with(
        F.col("_p"),
        F.col("_q"),
        lambda c, g: F.abs(c / F.col("_pt") - g / F.col("_qt")),
    )
    return joined.select(
        partition_col,
        F.col("_pt").cast("long").alias("n_rows"),
        F.round(F.array_max(diffs), 6).alias("ks"),
    )


def histogram_w1(
    df: DataFrame,
    value_col: str,
    partition_col: str,
    n_bins: int = 32,
    bin_width: float = 20.0,
) -> DataFrame:
    """Grid Wasserstein-1 (earth-mover) distance per partition vs the
    pooled baseline — the third drift lens beside :func:`histogram_psi`
    (density ratios) and :func:`histogram_ks` (largest CDF gap): W1
    integrates EVERY CDF gap, so it sees a small shift spread across
    the whole distribution that KS's single sup-norm point understates
    and PSI's log-ratios miss when no bin empties.

    Unlike PSI/KS this one is fully INTEGER-DECIDED: on the grid,
    ``W1 = Σ_i |F_p(i) − F_q(i)|`` (in bin-width units) cross-multiplies
    to ``Σ_i |c_i·N − g_i·n|`` over exact cumulative counts — no
    division until one final truncating 6-dp fixed-point ``div`` in
    decimal(38,0), so the metric is bit-identical on any engine and
    partitioning at any scale that fits 38 digits (Σ ≤ B·n·N — fine
    past 10¹⁵ rows).

    Returns ``(partition_col, n_rows, w1_num, w1_bins_6dp)`` —
    ``w1_num`` the exact integer numerator, ``w1_bins_6dp`` the
    distance in bin-width units ``(w1_num·10⁶) div (n·N)``.

    Plan shape: identical to :func:`histogram_ks` — ONE
    ``groupBy(partition)`` pass of conditional cumulative counts, the
    keyless pooled twin broadcast via cross join, a ``zip_with`` +
    ``aggregate`` over two B-slot arrays, all JVM.

    Reference parity: no counterpart in /root/reference/PyNomaly —
    engine addition (drift family).
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if bin_width <= 0:
        raise ValueError("bin_width must be > 0")
    x = F.col(value_col).cast("double")
    obs = df.filter(x.isNotNull() & ~F.isnan(x)).select(
        F.col(partition_col), _bin(x, n_bins, bin_width).alias("_bin")
    )
    cum_cols = [
        F.sum(F.when(F.col("_bin") <= i, 1).otherwise(0))
        .cast("long")
        .alias(f"_c{i}")
        for i in range(n_bins)
    ]
    arr = F.array(*[F.col(f"_c{i}") for i in range(n_bins)])
    part = obs.groupBy(partition_col).agg(*cum_cols).select(
        partition_col, arr.alias("_p"), F.element_at(arr, n_bins).alias("_pt")
    )
    glob = obs.agg(*cum_cols).select(
        arr.alias("_q"), F.element_at(arr, n_bins).alias("_qt")
    )
    dec = "decimal(38,0)"
    joined = part.crossJoin(F.broadcast(glob))
    # |c_i·N − g_i·n| summed in decimal(38,0); the last slot is zero by
    # construction (both CDFs hit their totals) — harmless to include.
    diffs = F.zip_with(
        F.col("_p"),
        F.col("_q"),
        lambda c, g: F.abs(
            c.cast(dec) * F.col("_qt").cast(dec)
            - g.cast(dec) * F.col("_pt").cast(dec)
        ),
    )
    num = F.aggregate(
        diffs, F.lit(0).cast(dec), lambda acc, v: acc + v
    )
    return joined.select(
        partition_col,
        F.col("_pt").cast("long").alias("n_rows"),
        num.cast(dec).alias("_num"),
        (F.col("_pt").cast(dec) * F.col("_qt").cast(dec)).alias("_den"),
    ).select(
        partition_col,
        "n_rows",
        F.col("_num").cast("long").alias("w1_num"),
        F.expr("(_num * 1000000) div _den").cast("long").alias(
            "w1_bins_6dp"
        ),
    )


def baseline_cumulative(
    df: DataFrame,
    value_col: str,
    n_bins: int = 32,
    bin_width: float = 20.0,
) -> list:
    """Pooled CUMULATIVE histogram counts as driver-side ints — the
    FROZEN baseline for :func:`pynomaly_spark.streaming.
    streaming_w1_drift` (the integer-exact sibling of
    :func:`baseline_histogram`; same fit-then-stream contract).  One
    aggregate row of ``n_bins`` cumulative counters — control-plane
    sized, not row data.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if bin_width <= 0:
        raise ValueError("bin_width must be > 0")
    x = F.col(value_col).cast("double")
    obs = df.filter(x.isNotNull() & ~F.isnan(x)).select(
        _bin(x, n_bins, bin_width).alias("_bin")
    )
    row = obs.agg(
        *[
            F.sum(F.when(F.col("_bin") <= i, 1).otherwise(0))
            .cast("long")
            .alias(f"_c{i}")
            for i in range(n_bins)
        ]
    ).first()
    return [int(row[i] or 0) for i in range(n_bins)]
