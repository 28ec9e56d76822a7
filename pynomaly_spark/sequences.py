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

__all__ = [
    "transition_counts",
    "cusum_flags",
    "path_counts",
    "acf",
    "cooccurrence_pairs",
    "linear_attribution",
    "markov_accuracy",
    "haar_energy",
]


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


def path_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    depth: int = 3,
    top_k: int = 20,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Top-k frequent ``depth``-step event paths (sequential pattern
    mining, n-gram flavor): the most common contiguous state sequences
    across all entities — the session-flow summary behind funnel
    design and anomalous-journey detection.

    Returns ``s0..s{depth-1}, n_paths, rank`` (rank 1..top_k by
    ``n_paths DESC`` then the path lexicographically — a total order,
    so the k-boundary is deterministic cross-engine).

    Paths are built with ``depth-1`` stacked lags over ONE keyed sort
    (same window spec → one shuffle, one sort); rows with NULL
    key/ts/state are dropped BEFORE the lags (transitions' skip
    convention).  The count aggregate collapses map-side to ≤|S|^depth
    rows; the final rank is a window over that tiny grouped frame —
    never over event rows.
    """
    if depth < 2:
        raise ValueError(f"path_counts: depth must be >= 2, got {depth}")
    if top_k < 1:
        raise ValueError(f"path_counts: top_k must be >= 1, got {top_k}")
    w = Window.partitionBy(key_col).orderBy("_us", tiebreak_col)
    base = (
        df.where(
            F.col(key_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(state_col).isNotNull()
        )
        .withColumn("_us", F.unix_micros(F.col(ts_col).cast("timestamp")))
    )
    cols = [
        F.lag(state_col, depth - 1 - i).over(w).alias(f"s{i}")
        for i in range(depth - 1)
    ] + [F.col(state_col).alias(f"s{depth - 1}")]
    paths = base.select(*cols).where(
        F.col("s0").isNotNull()  # lags fill back-to-front: s0 is last
    )
    names = [f"s{i}" for i in range(depth)]
    counted = paths.groupBy(*names).agg(
        F.count(F.lit(1)).alias("n_paths")
    )
    w_rank = Window.orderBy(
        F.col("n_paths").desc(), *[F.col(c).asc() for c in names]
    )
    return (
        counted.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= top_k)
        .select(*names, F.col("n_paths").cast("long"), F.col("rank").cast("long"))
    )


def acf(
    df: DataFrame,
    key_col: str,
    idx_col: str,
    val_col: str,
    max_lag: int = 6,
    r: int = 6,
) -> DataFrame:
    """Sample autocorrelation per series — the seasonality/persistence
    probe (is traffic hourly-periodic? does an error burst predict the
    next hour?) over a REGULAR integer-indexed series ``(key, idx,
    x)``; callers gap-fill first so a missing period is an explicit 0,
    not a silently skipped lag.

    For each lag ``k`` in 1..``max_lag``: Pearson correlation of the
    complete pairs ``(x_t, x_{t+k})`` — the pairwise form (each lag's
    own pair means) rather than the global-mean estimator, so the
    statistic is a plain correlation with an exact 2-moment closed
    form: every moment is a sum of small-integer products (exact in
    double), the final expression is the same IEEE tree on any engine.

    Returns ``(key, lag, n_pairs, acf)``; ``acf`` NULL when either
    side of a lag's pair set is constant; lags with no complete pairs
    emit nothing.

    Scale (100 TB): ONE key-keyed shuffle + in-partition sort computes
    every lag's lead in the same window pass; the per-(key, lag) moment
    aggregate then collapses map-side.  A key's whole series must fit
    one task's sort spill (keys are the unit of parallelism — the
    ``sessionize`` hot-key caveat).

    Reference parity: no counterpart in /root/reference/PyNomaly —
    engine addition (time-series family).
    """
    if max_lag < 1:
        raise ValueError("acf: max_lag must be >= 1")
    missing = [c for c in (key_col, idx_col, val_col) if c not in df.columns]
    if missing:
        raise ValueError(f"acf: unknown columns {missing}")
    w = Window.partitionBy(key_col).orderBy(F.col(idx_col).asc())
    x = F.col(val_col).cast("double")
    base = df.select(
        F.col(key_col).alias("key"),
        x.alias("_x"),
        *[
            F.lead(x, k).over(w).alias(f"_y{k}")
            for k in range(1, int(max_lag) + 1)
        ],
    )
    pairs = base.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("lag"),
                        F.col("_x").alias("x"),
                        F.col(f"_y{k}").alias("y"),
                    )
                    for k in range(1, int(max_lag) + 1)
                ]
            )
        ).alias("_p"),
    ).select(
        "key", "_p.lag", "_p.x", "_p.y"
    ).where(F.col("y").isNotNull())
    m = pairs.groupBy("key", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n_pairs").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    va = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vb = n * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "key",
        "lag",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round(
            F.when((va > 0) & (vb > 0), num / F.sqrt(va * vb)), r
        ).alias("acf"),
    )


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int = 1024,
) -> DataFrame:
    """Market-basket pair mining: for every unordered item pair that
    shares a basket, the co-occurrence support and the lift
    ``N·n_ab / (n_a·n_b)`` — the association-rule screen (Agrawal &
    Srikant 1994's frequent-2-itemset stage, which at web scale is the
    stage that matters: higher orders mine the survivors of this one).

    Scale (100 TB): the dangerous input is the VIRAL basket — a basket
    of k items emits k(k−1)/2 pairs, so one million-item basket alone
    is ~5·10¹¹ rows out of the self-join.  ``max_basket`` drops
    oversized baskets BEFORE the join (the standard cap in production
    basket mining; NULL-safe distinct first, so duplicate lines don't
    inflate).  The pair counts come from one equi-self-join on the
    basket key (both sides the same shuffle), collapsed by a map-side
    combined aggregate; ``min_support`` prunes before the frequency
    joins; the 1-row basket count broadcasts.  Lift's single division
    is the only float.

    Reference parity: no counterpart in /root/reference/PyNomaly —
    engine addition (co-occurrence analytics for recommendation /
    data-curation pipelines).
    """
    if basket_col not in df.columns or item_col not in df.columns:
        raise ValueError(
            f"cooccurrence_pairs: unknown column {basket_col!r} or "
            f"{item_col!r}"
        )
    if min_support < 1:
        raise ValueError("cooccurrence_pairs: min_support must be >= 1")
    items = (
        df.where(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(basket_col, item_col)
        .distinct()
    )
    if max_basket is not None:
        keep = (
            items.groupBy(basket_col)
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .where(F.col("_bsz") <= max_basket)
            .select(basket_col)
        )
        items = items.join(keep, basket_col, "left_semi")
    n_baskets = items.agg(
        F.countDistinct(basket_col).cast("long").alias("_N")
    )
    a = items.select(
        F.col(basket_col).alias("_bk"), F.col(item_col).alias("item_a")
    )
    b = items.select(
        F.col(basket_col).alias("_bk2"), F.col(item_col).alias("item_b")
    )
    pairs = (
        a.join(
            b,
            (F.col("_bk") == F.col("_bk2"))
            & (F.col("item_a") < F.col("item_b")),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= min_support)
    )
    freq = items.groupBy(item_col).agg(
        F.count(F.lit(1)).cast("long").alias("_f")
    )
    fa = freq.select(F.col(item_col).alias("_ia"), F.col("_f").alias("n_a"))
    fb = freq.select(F.col(item_col).alias("_ib"), F.col("_f").alias("n_b"))
    out = (
        pairs.join(fa, F.col("item_a") == F.col("_ia"))
        .join(fb, F.col("item_b") == F.col("_ib"))
        .crossJoin(F.broadcast(n_baskets))
    )
    lift = (F.col("_N") * F.col("support")).cast("double") / (
        F.col("n_a") * F.col("n_b")
    )
    return out.select(
        "item_a", "item_b", "support", "n_a", "n_b", lift.alias("lift")
    )


def linear_attribution(
    events: DataFrame,
    user_col: str,
    time_col: str,
    id_col: str,
    type_col: str,
    value_col: str,
    conversion_type: str,
    touch_types: list,
    window_us: int = 7 * 86_400_000_000,
) -> DataFrame:
    """Multi-touch LINEAR attribution: each conversion's cents value is
    split equally across the user's touch events inside the lookback
    window ``(t_conv - window, t_conv]`` — the marketing/credit rollup
    that last-touch (as-of join) throws away.  The split is EXACT
    integer arithmetic: every touch gets ``cents div n`` and the
    earliest touch absorbs the remainder ``cents % n`` (total attributed
    == total converted cents, an auditable invariant; ``div``/``%`` on
    non-negative longs are identical in Spark and DuckDB).

    Returns one row per touch type — ``event_type, touches, purchases,
    attributed_cents`` — plus an ``unattributed`` row carrying the
    conversions with no in-window touch, so the output reconciles to
    the conversion total exactly.

    Scale (100 TB): the conversion×touch join is TIME-BLOCKED — touches
    explode into their ``window_us`` block and the next, conversions
    probe their own block only, so any pair within the window shares a
    block (lossless, the banded-LSH completeness argument) and a
    chatty user costs O(per-window activity²), never O(history²).
    Duplicate meetings collapse on the (conversion, touch) id pair; the
    per-conversion rank window is keyed by conversion id (fan-in
    bounded by the window), never by user.

    Reference parity: no counterpart in /root/reference/PyNomaly —
    engine addition (event-pipeline analytics family).
    """
    for c in (user_col, time_col, id_col, type_col, value_col):
        if c not in events.columns:
            raise ValueError(f"linear_attribution: unknown column {c!r}")
    if not touch_types:
        raise ValueError("linear_attribution: touch_types must be non-empty")
    w = int(window_us)
    if w <= 0:
        raise ValueError("linear_attribution: window_us must be positive")
    base = events.where(
        F.col(user_col).isNotNull()
        & F.col(time_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("_id"),
        F.col(type_col).alias("_ty"),
        F.expr(f"unix_micros(cast({time_col} as timestamp))").alias("_us"),
        F.col(value_col).alias("_val"),
    )
    conv = base.where(
        (F.col("_ty") == conversion_type) & F.col("_val").isNotNull()
    ).select(
        "_u",
        F.col("_id").alias("pid"),
        F.col("_us").alias("_pus"),
        F.round(F.col("_val") * 100).cast("long").alias("_cents"),
        F.expr(f"_us div {w}").alias("_bk"),
    )
    touch = base.where(F.col("_ty").isin(list(touch_types))).select(
        F.col("_u").alias("_u2"),
        F.col("_id").alias("tid"),
        F.col("_ty").alias("touch_type"),
        F.col("_us").alias("_tus"),
        F.explode(
            F.array(F.expr(f"_us div {w}"), F.expr(f"_us div {w} + 1"))
        ).alias("_bk2"),
    )
    hits = (
        conv.join(
            touch,
            (F.col("_u") == F.col("_u2"))
            & (F.col("_bk") == F.col("_bk2"))
            & (F.col("_tus") <= F.col("_pus"))
            & (F.col("_tus") > F.col("_pus") - F.lit(w)),
        )
        .select("pid", "_cents", "tid", "touch_type", "_tus")
        .distinct()
    )
    w_rank = Window.partitionBy("pid").orderBy(
        F.col("_tus").asc(), F.col("tid").asc()
    )
    shared = (
        hits.withColumn("_rnk", F.row_number().over(w_rank))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("pid")))
        .select(
            "pid",
            "touch_type",
            (
                F.expr("_cents div _n")
                + F.when(F.col("_rnk") == 1, F.expr("_cents % _n"))
                .otherwise(F.lit(0))
            ).alias("_share"),
        )
    )
    attributed = shared.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("touches"),
        F.countDistinct("pid").cast("long").alias("purchases"),
        F.sum("_share").cast("long").alias("attributed_cents"),
    )
    untouched = (
        conv.join(
            hits.select("pid").distinct(), on="pid", how="left_anti"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("purchases"),
            F.coalesce(F.sum("_cents"), F.lit(0))
            .cast("long")
            .alias("attributed_cents"),
        )
        .select(
            F.lit("unattributed").alias("touch_type"),
            F.lit(0).cast("long").alias("touches"),
            "purchases",
            "attributed_cents",
        )
    )
    return attributed.select(
        "touch_type", "touches", "purchases", "attributed_cents"
    ).unionByName(untouched)


def markov_accuracy(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Top-1 next-state predictor accuracy of the first-order Markov
    model — the eval that tells a pipeline whether sequence context
    carries signal (accuracy ≈ the majority-class rate means it does
    not).  In-sample by construction: the predictor is the argmax row
    of :func:`transition_counts`, and because that matrix already
    aggregates every adjacent pair, its own cells ARE the evaluation —
    ``correct = n_pair(prev, argmax)``, ``total = n_prev`` — so the
    whole eval costs ZERO extra passes over the events.

    Returns ``prev_state, predicted, correct, total, acc_6dp`` with the
    accuracy in truncating 6-dp fixed point (``div`` — integer-decided
    cross-engine).  Argmax ties break ``(n_pair DESC, curr ASC)``.

    Scale (100 TB): exactly :func:`transition_counts`' cost (one
    entity-keyed lag shuffle + one ≤|S|²-row aggregate); the argmax
    window runs on the collapsed control-plane frame only.

    Reference parity: no counterpart in /root/reference/PyNomaly —
    engine addition (sequence-analytics family).
    """
    tc = transition_counts(df, key_col, ts_col, state_col, tiebreak_col)
    w = Window.partitionBy("prev_state").orderBy(
        F.col("n_pair").desc(), F.col("curr_state").asc()
    )
    return (
        tc.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "prev_state",
            F.col("curr_state").alias("predicted"),
            F.col("n_pair").cast("long").alias("correct"),
            F.col("n_prev").cast("long").alias("total"),
            F.expr("(n_pair * 1000000L) div n_prev")
            .cast("long")
            .alias("acc_6dp"),
        )
    )


def haar_energy(
    df: DataFrame,
    bucket_col: str,
    value_col: str,
    levels: int = 6,
) -> DataFrame:
    """Unnormalized Haar wavelet energy spectrum of an integer time
    series — at which dyadic time scale does the variance live?  A
    spiky bot burst concentrates energy at fine levels, a diurnal
    cycle at the ~2^4-2^5-hour levels, a regime shift at the coarsest;
    the spectrum is the one-pass screen that tells a pipeline which
    window size its downstream detectors should use.

    For level k (1..levels) the series is cut into blocks of 2^k
    buckets anchored at the series minimum; each block's detail is
    ``d = Σ(left half) − Σ(right half)`` and the level's energy is
    ``Σ d²`` — all integer arithmetic on exact counts (the
    unnormalized transform trades the textbook 1/√2 for exactness;
    relative comparisons across levels are unchanged for flat-ish
    series and the consumer can rescale).  Missing buckets contribute
    zero WITHOUT a gap-fill spine: block membership and half-parity
    are computed from the bucket id, so sparse frames aggregate
    correctly as-is.

    Returns ``level, block_span, n_blocks, n_nonzero_blocks,
    energy`` — ``n_blocks`` the full grid count (span-derived),
    ``n_nonzero_blocks`` those with a nonzero detail.

    Scale (100 TB): the input should already be the collapsed
    (bucket, value) frame (control-plane sized — bounded by the time
    span, not the data).  Per level: ONE map-side-combined aggregate
    over that frame; the level union is a union of tiny frames.  The
    anchor is a broadcast 1-row aggregate, never a collect.

    Reference parity: no counterpart in /root/reference/PyNomaly —
    engine addition (time-series family).
    """
    if not 1 <= int(levels) <= 20:
        raise ValueError("haar_energy: levels must be in [1, 20]")
    for c in (bucket_col, value_col):
        if c not in df.columns:
            raise ValueError(f"haar_energy: unknown column {c!r}")
    base = df.where(
        F.col(bucket_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(bucket_col).cast("long").alias("_t"),
        F.col(value_col).cast("long").alias("_x"),
    )
    anchor = base.agg(
        F.min("_t").alias("_t0"), F.max("_t").alias("_t1")
    )
    keyed = base.crossJoin(F.broadcast(anchor))
    dec = "decimal(38,0)"
    out = None
    for k in range(1, int(levels) + 1):
        span = 1 << k
        half = span >> 1
        blk = F.expr(f"(_t - _t0) div {span}")
        sign = F.when(
            F.expr(f"pmod((_t - _t0) div {half}, 2)") == 0, F.lit(1)
        ).otherwise(F.lit(-1))
        per_block = (
            keyed.groupBy(blk.alias("_b"))
            .agg(
                F.sum(sign * F.col("_x")).cast("long").alias("_d"),
                F.max(F.expr(f"(_t1 - _t0) div {span} + 1"))
                .alias("_nb"),
            )
        )
        lvl = per_block.agg(
            F.lit(k).cast("long").alias("level"),
            F.lit(span).cast("long").alias("block_span"),
            F.max("_nb").cast("long").alias("n_blocks"),
            F.sum((F.col("_d") != 0).cast("long"))
            .cast("long")
            .alias("n_nonzero_blocks"),
            F.sum(F.col("_d").cast(dec) * F.col("_d").cast(dec))
            .cast(dec)
            .cast("long")
            .alias("energy"),
        )
        out = lvl if out is None else out.unionByName(lvl)
    return out
