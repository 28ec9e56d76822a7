"""BM25 ranked retrieval over the document corpus.

Keyword search is the retrieval counterpart of the TF-IDF keyword query:
given a small set of term queries, score every matching document with
BM25 (Robertson/Sparck-Jones, the standard probabilistic ranking
function) and return the top-k per query.  The reference library has no
analog (scoring kernel only, /root/reference/PyNomaly/loop.py); this
extends the engine's training-data surface (corpus search / example
mining for eval curation).

Scale design (100 TB reasoning):

* the corpus is filtered to the QUERY VOCABULARY before any aggregation
  — a literal ``IN`` predicate on the exploded tokens, map-side, so
  only rows containing query terms survive the scan stage; everything
  downstream is query-vocab-sized per doc.
* doc lengths come from one corpus-keyed aggregate; the join back to
  the matched docs is an id-keyed shuffle join whose left side is
  already pruned to matching docs.
* the query-term relation is tiny and broadcast; the final per-query
  top-k goes through :func:`similarity.two_phase_topk` (salted, no
  single-reducer funnel) with the rounded-score rank device so ranks
  agree across engines.

Cross-engine determinism: n, df, tf and doc lengths are integers (exact
in doubles in any summation order); the only order-dependent float is
the per-(query, doc) sum over matched terms, rounded to 6 dp before
ranking and output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import two_phase_topk
from .textops import _TOKEN_SPLIT

__all__ = ["bm25_topk"]


def bm25_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    rank_round: int = 6,
    phase1: bool = True,
) -> DataFrame:
    """Top-``k`` documents per query under BM25.

    ``queries`` is ``[(query_id, [term, ...]), ...]`` — terms are
    lowercased and matched under the shared tokenizer
    (``textops._TOKEN_SPLIT``).  Returns ``(query_id, rnk, doc_id,
    score)`` with ``score = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b
    + b*dl/avgdl))`` and ``idf = ln(1 + (n - df + 0.5)/(df + 0.5))``
    (always positive), rounded to ``rank_round`` dp; ranks break score
    ties by ascending doc id.
    """
    if not queries or any(not terms for _, terms in queries):
        raise ValueError("queries must be non-empty lists of terms")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    vocab = sorted({t.lower() for _, terms in queries for t in terms})

    src = docs.where(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    )
    toks = src.select(
        id_col,
        F.explode(
            F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT)
        ).alias("_t"),
    ).where(F.col("_t") != "")
    # doc length is a PER-ROW expression — no explode, no corpus-wide
    # groupBy(id) shuffle; only the narrow (id, dl) pairs ever move.
    # Docs with zero tokens carry no stream content (match the
    # aggregate-form semantics: they are absent from dl and stats).
    dl = src.select(
        id_col,
        F.size(
            F.filter(
                F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT),
                lambda t: t != "",
            )
        ).cast("long").alias("_dl"),
    ).where(F.col("_dl") > 0)
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        (
            F.sum("_dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("_avgdl"),
    )
    tf = (
        toks.where(F.col("_t").isin(vocab))
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).cast("double").alias("_tf"))
    )
    dfreq = tf.groupBy("_t").agg(
        F.count(F.lit(1)).cast("double").alias("_df")
    )
    qrel = spark.createDataFrame(
        [(qid, t.lower()) for qid, terms in queries for t in set(terms)],
        "query_id string, _t string",
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    norm = F.col("_tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")
    )
    term_score = idf * F.col("_tf") * F.lit(k1 + 1.0) / norm
    scored = (
        tf.join(F.broadcast(qrel), "_t")
        .join(F.broadcast(dfreq), "_t")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum(term_score), rank_round).alias("score"))
    )
    return two_phase_topk(
        scored,
        ["query_id"],
        [F.desc("score"), F.asc(id_col)],
        k,
        phase1=phase1,
    ).select("query_id", F.col("rnk").cast("long").alias("rnk"), id_col, "score")
