"""Unigram language-model quality scoring — the CCNet-style likelihood
filter: train token frequencies on a corpus, score each document by its
mean token log-probability, flag the improbable tail (boilerplate, key
soup, wrong-language shards).

The reference library has no analog (scoring kernel only,
/root/reference/PyNomaly/loop.py); this extends the engine's
training-data surface per the task brief.  Real pipelines use a 5-gram
KenLM; the unigram model is the same contract (train -> frozen model ->
per-doc likelihood -> threshold gate) with an engine-portable kernel.

Scale design (100 TB reasoning):

* the model is a ``(token, c)`` relation — vocab-sized, not corpus-
  sized, and prunable with ``min_count`` (pruned tokens score as OOV).
* the scoring join is the skew case of the engine: token keys are
  Zipfian, and a plain shuffle join sends every ``(doc, "the")`` row to
  one reducer.  The join therefore splits the vocab into a HOT head
  (``c >= hot_min`` — a few thousand tokens carrying most of the token
  mass, broadcast, map-side: the hot keys never shuffle) and the rare
  tail (shuffle join over keys that are rare BY CONSTRUCTION, so that
  exchange is skew-free).  This is the standard two-pass skew join with
  the split chosen by frequency instead of sampling.
* documents are reduced to ``(doc, token, tf)`` before any join —
  join input is distinct doc-token pairs, not token occurrences.

Cross-engine determinism: per-token log-probabilities are identical
IEEE expressions on both engines; only the per-doc accumulation order
differs, so the per-doc mean is rounded to 6 dp before any further
aggregation (the repo-standard device).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import _TOKEN_SPLIT

__all__ = ["unigram_model", "score_unigram_logprob"]


def _tokens(df: DataFrame, text_col: str, cols: list) -> DataFrame:
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            *cols,
            F.explode(
                F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT)
            ).alias("_t"),
        )
        .where(F.col("_t") != "")
    )


def unigram_model(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Token unigram counts ``(token, c)`` over the corpus (shared
    tokenizer ``textops._TOKEN_SPLIT``; lowercased, empty tokens
    dropped).  ``min_count`` prunes the long tail — pruned tokens score
    as OOV, which is how production LMs bound their vocab."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    return (
        _tokens(df, text_col, [])
        .groupBy(F.col("_t").alias("token"))
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_count)
    )


def score_unigram_logprob(
    df: DataFrame,
    model: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple = (),
    alpha: float = 0.5,
    hot_min: int = 1000,
) -> DataFrame:
    """Per-document mean token log-probability under a frozen unigram
    model (additive-``alpha`` smoothing; OOV floor ``alpha / (N +
    alpha*(V+1))``).  Returns ``(id_col, *carry_cols, n_tokens,
    logprob)`` with ``logprob`` rounded to 6 dp; documents with no
    tokens produce no row (no likelihood is defined for them).

    ``model=None`` self-trains on the scored corpus itself — the model
    is derived FROM the per-doc tf relation (``sum(tf) by token`` ==
    :func:`unigram_model` exactly), so the corpus is exploded and
    shuffled ONCE: every model/stat consumer hangs off the same tf
    exchange (``ReusedExchange`` in the physical plan — tested) instead
    of a second full scan+explode.  Pass an explicit model for the
    frozen train-then-score deployment.

    ``hot_min`` sets the broadcast head of the skew-split join (see
    module docstring); results are invariant to its value — tested.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    cols = [id_col, *carry_cols]
    tf = (
        _tokens(df, text_col, cols)
        .groupBy(*cols, "_t")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    if model is None:
        model = tf.groupBy(F.col("_t").alias("token")).agg(
            F.sum("_tf").alias("c")
        )
    hot = model.where(F.col("c") >= hot_min).select(
        F.col("token").alias("_ht"), F.col("c").cast("double").alias("_hc")
    )
    tail = model.where(F.col("c") < hot_min).select(
        F.col("token").alias("_tt"), F.col("c").cast("double").alias("_tc")
    )
    j1 = tf.join(F.broadcast(hot), F.col("_t") == F.col("_ht"), "left").drop(
        "_ht"
    )
    matched = j1.where(F.col("_hc").isNotNull()).select(
        *cols, "_t", "_tf", F.col("_hc").alias("_c")
    )
    missed = (
        j1.where(F.col("_hc").isNull())
        .join(tail, F.col("_t") == F.col("_tt"), "left")
        .select(
            *cols, "_t", "_tf",
            F.coalesce(F.col("_tc"), F.lit(0.0)).alias("_c"),
        )
    )
    stats = model.agg(
        # empty model (everything pruned): N=0, V=0 -> every token is
        # OOV at the alpha/alpha floor, logprob 0 — defined, not null
        F.coalesce(F.sum(F.col("c").cast("double")), F.lit(0.0)).alias("_N"),
        F.count(F.lit(1)).cast("double").alias("_V"),
    )
    denom = F.col("_N") + F.lit(alpha) * (F.col("_V") + F.lit(1.0))
    lp = F.log((F.col("_c") + F.lit(alpha)) / denom)
    return (
        matched.unionByName(missed)
        .crossJoin(F.broadcast(stats))
        .groupBy(*cols)
        .agg(
            F.sum("_tf").cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("_tf") * lp) / F.sum(F.col("_tf")), 6
            ).alias("logprob"),
        )
    )
