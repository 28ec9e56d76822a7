"""Sequence packing: concat-and-chunk assignment of documents into
fixed-size training context windows.

LLM training consumes fixed-length token windows, not documents.  The
standard prep step ("concat and chunk") concatenates a shard's documents
into one token stream and slices it every ``cap`` tokens; a document
therefore lands at stream offset ``cum_before`` (the tokens of every
earlier document) and spans chunks ``floor(cum_before/cap) ..
floor((cum_before+n-1)/cap)``.  The reference library has no analog
(scoring kernel only, /root/reference/PyNomaly/loop.py); this extends the
engine's training-data surface per the task brief.

The whole operator reduces to an EXCLUSIVE PREFIX SUM of token counts in
stream order — the one primitive that is sequential by definition.  A
naive ``Window.orderBy`` with no partition key funnels the corpus through
a single reducer; at 100 TB that is the job.  Instead the scan is
two-level, the classic distributed prefix sum:

1. range-bucket the stream (boundary literals from ``approxQuantile`` —
   a bounded, driver-side control-plane step; boundary placement affects
   only parallelism, never results), local cumsum per ``(group, bucket)``
   window — each bucket sorts ~1/n_buckets of its group, in parallel;
2. per-bucket token totals (one tiny ``groupBy`` relation, groups ×
   buckets rows), exclusive-prefix them over the bucket index, broadcast
   the offsets back.

``cum_before = bucket_offset + local_before`` is exact for any bucket
placement.  Chunk ids stay under 2^53 (a 100 TB corpus is ~2×10^13
tokens), so the double-precision ``floor`` division is exact.

Preconditions (documented, mirrored by the oracle twin): ``order_col``
must be unique within its group — a total stream order is what "the
stream" means; ties would make ``cum_before`` partition-order dependent.
Rows with NULL order ids or non-positive token counts carry no stream
content and are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_chunks", "chunk_stats", "sliding_chunks"]


def pack_chunks(
    df: DataFrame,
    token_col: str,
    order_col: str,
    cap: int,
    group_col: str | None = None,
    n_buckets: int = 32,
) -> DataFrame:
    """Per-document chunk assignment for concat-and-chunk packing.

    Returns ``df``'s columns plus ``n_tokens`` (long), ``cum_before``
    (exclusive prefix sum in ``(group_col, order_col)`` stream order),
    ``first_chunk``, ``last_chunk``, ``n_chunks``, ``offset_in_chunk``.
    All outputs are integers — the cross-engine comparison is float-free.

    ``group_col=None`` packs one global stream (still bucket-parallel);
    with a group, every group is its own independent stream, exactly how
    sharded training data is prepared.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")

    grp = [group_col] if group_col else []
    src = df.where(
        F.col(order_col).isNotNull() & (F.col(token_col) > 0)
    ).withColumn("n_tokens", F.col(token_col).cast("long"))

    # control-plane: ~n_buckets-1 boundary literals; placement affects
    # parallelism only (cum_before is exact for ANY bucketing), so the
    # sketch's approximation error is irrelevant to correctness
    if n_buckets > 1:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        try:
            bounds = sorted(
                set(
                    src.select(F.col(order_col).cast("double").alias("_o"))
                    .where(F.col("_o").isNotNull())
                    .stat.approxQuantile("_o", probs, 0.01)
                )
            )
        except Exception:
            # non-castable order ids (string keys) can't range-bucket:
            # fall back to one bucket — slower (single sort per group)
            # but correct, instead of a sketch error or dropped rows
            bounds = []
    else:
        bounds = []
    bkt = F.lit(0)
    for b in bounds:  # flat comparison sum — <=63 terms, whole-stage codegen
        bkt = bkt + (F.col(order_col).cast("double") >= F.lit(b)).cast("int")
    # a non-castable order value (string ids) would make the bucket NULL
    # and the null-unsafe offsets join would silently DROP those rows —
    # coalesce pins them to bucket 0 (correctness is bucket-invariant)
    keyed = src.withColumn("_bucket", F.coalesce(bkt, F.lit(0)))

    # level 1: local exclusive cumsum inside each (group, bucket) slice
    w_local = (
        Window.partitionBy(*grp, "_bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = keyed.withColumn(
        "_local_before", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )

    # level 2: exclusive prefix of bucket totals — groups x buckets rows,
    # a control-plane relation; broadcast back
    totals = keyed.groupBy(*grp, "_bucket").agg(
        F.sum("n_tokens").alias("_bt")
    )
    w_bkt = (
        Window.partitionBy(*grp)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *[F.col(c).alias(f"_r_{c}") for c in grp],
        F.col("_bucket").alias("_r_bucket"),
        F.coalesce(F.sum("_bt").over(w_bkt), F.lit(0)).alias("_bucket_off"),
    )
    cond = F.col("_bucket") == F.col("_r_bucket")
    for c in grp:  # null group values are legitimate stream keys
        cond = cond & F.col(c).eqNullSafe(F.col(f"_r_{c}"))
    joined = local.join(F.broadcast(offsets), cond).withColumn(
        "cum_before", F.col("_bucket_off") + F.col("_local_before")
    )

    capL = F.lit(int(cap)).cast("long")
    first = F.floor(F.col("cum_before") / capL).cast("long")
    last = F.floor((F.col("cum_before") + F.col("n_tokens") - 1) / capL).cast(
        "long"
    )
    return joined.select(
        *df.columns,
        "n_tokens",
        "cum_before",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + 1).alias("n_chunks"),
        F.pmod(F.col("cum_before"), capL).alias("offset_in_chunk"),
    )


def chunk_stats(
    packed: DataFrame,
    cap: int,
    order_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Per-chunk summary of a :func:`pack_chunks` result.

    Explodes each document onto the chunks it touches (``sequence`` is
    bounded by ``ceil(n_tokens/cap)+1`` — never corpus-sized) and
    aggregates ``(group?, chunk_id) -> n_docs, chunk_tokens, first_doc``.
    ``chunk_tokens`` is the exact token fill: every chunk except each
    stream's last must hold exactly ``cap`` (asserted in tests).
    """
    grp = [group_col] if group_col else []
    capL = F.lit(int(cap)).cast("long")
    e = packed.select(
        *grp,
        order_col,
        "cum_before",
        "n_tokens",
        F.explode(F.sequence("first_chunk", "last_chunk")).alias("chunk_id"),
    )
    fill = F.least(
        (F.col("chunk_id") + 1) * capL, F.col("cum_before") + F.col("n_tokens")
    ) - F.greatest(F.col("chunk_id") * capL, F.col("cum_before"))
    return (
        e.groupBy(*grp, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(fill).alias("chunk_tokens"),
            F.min(order_col).alias("first_doc"),
        )
    )


def sliding_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window chunking with overlap — the retrieval-indexing
    sibling of :func:`pack_chunks` (RAG corpora chunk documents into
    ``width``-token windows every ``stride`` tokens so no passage is
    split across a hard boundary; ``stride < width`` = overlap).

    One map-side pass, no shuffle at all: the token array is a
    MATERIALIZED column (the higher-order-function re-evaluation trap),
    window starts are a bounded per-row ``sequence(0, n-1, stride)``
    explode, and each chunk emits its exact token span plus the sha256
    of its re-joined text — the content key downstream dedup/indexing
    joins on, and the invariant the oracle twin pins byte-for-byte.
    Rows with null id/text or zero tokens produce no chunks.  Output:
    ``(id_col, chunk_idx, start_tok, n_chunk_tokens, chunk_sha)``.
    """
    if width < 1 or stride < 1:
        raise ValueError(
            f"width and stride must be >= 1, got {width}/{stride}"
        )
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != ""
    )
    d = (
        df.where(F.col(text_col).isNotNull() & F.col(id_col).isNotNull())
        .withColumn("_toks", toks)
        .withColumn("_n", F.size("_toks"))
        .where(F.col("_n") > 0)
    )
    starts = F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
    d = d.select(
        id_col,
        "_toks",
        "_n",
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    )
    chunk = F.slice("_toks", F.col("start_tok") + 1, width)
    return d.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.least(F.lit(width), F.col("_n") - F.col("start_tok"))
        .cast("long")
        .alias("n_chunk_tokens"),
        F.sha2(F.concat_ws(" ", chunk), 256).alias("chunk_sha"),
    )
