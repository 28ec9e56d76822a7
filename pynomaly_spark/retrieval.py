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

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import two_phase_topk
from .textops import _TOKEN_SPLIT

__all__ = ["bm25_topk", "build_postings", "rrf_fuse", "boolean_search"]


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


def build_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 1000,
    n_salt: int = 16,
) -> DataFrame:
    """Build an impact-ordered inverted index: per term, corpus stats
    plus the top-``max_postings`` postings by term frequency.

    Returns ``term, df`` (documents containing the term), ``cf``
    (corpus frequency — total occurrences), ``n_postings``
    (``min(df, max_postings)``), ``postings`` — the capped posting list
    rendered ``"doc:tf|doc:tf|..."`` ordered by (tf DESC, doc ASC).
    ``df``/``cf`` are computed over ALL postings; only the stored list
    is truncated (impact-ordered pruning, the standard IR trade: the
    highest-tf postings dominate any tf-weighted score, so serving
    keeps rank quality while the index stays bounded per term).

    Scale (100 TB): a web-corpus stopword has ~1e9 postings, so the cap
    cannot be a plain per-term window (one reducer sorts the whole
    posting list).  The top-k is SALTED TWO-PHASE and exact: postings
    first rank within (term, salt-of-doc) — ``n_salt`` bounded local
    sorts — and only the ≤ ``n_salt * max_postings`` local winners per
    term reach the final window; the per-term top-k is always contained
    in the union of per-salt top-ks.  The postings string itself is
    bounded by ``max_postings`` — no unbounded collect_list.

    Cross-engine determinism: tf/df/cf are integers, the posting order
    (tf DESC, doc ASC) is a total order, and the rendered string is
    byte-identical to DuckDB's ``string_agg(... ORDER BY ...)``
    (the oracle twin in queries.py).  Tokenizer is the shared
    ``textops._TOKEN_SPLIT``, same as BM25 — an index built here serves
    the engine's own scorer.
    """
    if max_postings < 1:
        raise ValueError(f"max_postings must be >= 1, got {max_postings}")
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    tf = (
        docs.where(F.col(text_col).isNotNull() & F.col(id_col).isNotNull())
        .select(
            id_col,
            F.explode(
                F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT)
            ).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )
    # exact salted two-phase per-term top-k by (tf DESC, doc ASC)
    from pyspark.sql import Window

    order = [F.desc("tf"), F.asc(id_col)]
    local = Window.partitionBy("term", "_salt").orderBy(*order)
    final = Window.partitionBy("term").orderBy(*order)
    capped = (
        tf.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt))
        )
        .withColumn("_rn1", F.row_number().over(local))
        .where(F.col("_rn1") <= max_postings)
        .withColumn("_rn", F.row_number().over(final))
        .where(F.col("_rn") <= max_postings)
    )
    postings = capped.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_postings"),
        F.concat_ws(
            "|",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("_rn").alias("r"),
                            F.concat_ws(
                                ":",
                                F.col(id_col).cast("string"),
                                F.col("tf").cast("string"),
                            ).alias("p"),
                        )
                    )
                ),
                lambda x: x["p"],
            ),
        ).alias("postings"),
    )
    return stats.join(postings, "term").select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.col("cf").cast("long").alias("cf"),
        F.col("n_postings").cast("long").alias("n_postings"),
        "postings",
    )


def rrf_fuse(
    rankings,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rnk",
    k0: int = 60,
    top_k: int = 10,
    r: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of N per-query rankings — the standard
    hybrid-search combiner (lexical BM25 + vector ANN, or any mix of
    retrieval backends): a document's fused score is

        rrf = Σ_i 1 / (k0 + rank_i)        (k0 = 60, Cormack et al.)

    summing only over rankings that returned it.  Every term is one
    IEEE division of exact integers and the sum is a FIXED-ORDER
    two-plus-term expression (not an aggregate), so the fused score is
    bit-identical on any engine — ties then break on the document id.

    Input: a list of DataFrames each ``(query_col, doc_col,
    rank_col)`` with dense integer ranks starting at 1 (the shape
    every ``*_topk`` operator here emits).  Returns ``(query_col,
    rnk, doc_col, rrf_score)`` — the fused top-``top_k`` per query,
    score rounded to ``r`` dp for display (ranking uses the exact
    value).

    Scale: fusion runs on CANDIDATE LISTS (top-k per query), never the
    corpus — the full-outer joins and the per-query window each see at
    most Σ_i k_i rows per query, so the whole operator is
    candidate-set-sized regardless of corpus scale.

    Reference parity: no counterpart in /root/reference/PyNomaly —
    engine addition (retrieval family, beside ``bm25_topk``).
    """
    from functools import reduce

    from pyspark.sql import Window

    rankings = list(rankings)
    if len(rankings) < 2:
        raise ValueError("rrf_fuse: need at least 2 rankings")
    if k0 < 1:
        raise ValueError(f"rrf_fuse: k0 must be >= 1, got {k0}")
    renamed = []
    for i, rdf in enumerate(rankings):
        missing = [
            c for c in (query_col, doc_col, rank_col) if c not in rdf.columns
        ]
        if missing:
            raise ValueError(
                f"rrf_fuse: ranking {i} lacks columns {missing}"
            )
        renamed.append(
            rdf.select(
                F.col(query_col).alias("_q"),
                F.col(doc_col).alias("_d"),
                F.col(rank_col).alias(f"_r{i}"),
            )
        )
    j = reduce(lambda a, b: a.join(b, ["_q", "_d"], "full"), renamed)
    score = None
    for i in range(len(rankings)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(k0) + F.col(f"_r{i}")), F.lit(0.0)
        )
        score = term if score is None else score + term
    w = Window.partitionBy("_q").orderBy(
        F.desc(score), F.asc(F.col("_d"))
    )
    return (
        j.withColumn("_rrf", score)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= int(top_k))
        .select(
            F.col("_q").alias(query_col),
            F.col("_rk").cast("long").alias("rnk"),
            F.col("_d").alias(doc_col),
            F.round(F.col("_rrf"), r).alias("rrf_score"),
        )
    )


def boolean_search(
    docs: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "and",
) -> DataFrame:
    """Boolean set retrieval: documents matching ALL (``mode="and"``)
    or ANY (``mode="or"``) of the query terms under the shared
    tokenizer (``textops._TOKEN_SPLIT``, lowercased) — the filter
    primitive under every faceted search and eval-set pull.

    Returns ``(id_col, n_matched)`` — for AND, only rows with
    ``n_matched == len(terms)`` survive; for OR, any match.

    Scale (100 TB): the term postings are NEVER materialized as a
    per-term join chain (an m-term AND as m semi-joins is m shuffles);
    instead tokens are pruned to the query vocabulary MAP-SIDE (the
    ``bm25_topk`` discipline — the explode emits only query-term hits,
    a |docs|·|terms|-bounded trickle), deduped per (doc, term), and
    the conjunction is ONE count aggregate: ``count == m``.  One
    shuffle total, independent of term count.
    """
    if not terms:
        raise ValueError("boolean_search: terms must be non-empty")
    if mode not in ("and", "or"):
        raise ValueError(f"boolean_search: mode must be and|or, got {mode}")
    vocab = sorted({t.lower() for t in terms})
    toks = (
        docs.where(F.col(text_col).isNotNull() & F.col(id_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT),
                        lambda t: t.isin(*vocab),
                    )
                )
            ).alias("_t"),
        )
    )
    hits = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_matched")
    )
    if mode == "and":
        return hits.where(F.col("n_matched") == len(vocab))
    return hits
