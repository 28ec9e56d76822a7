"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation set.

Every serious LLM data pipeline runs this pass before training: any
document that contains an n-gram from a held-out benchmark is either
dropped or audited, otherwise eval scores measure memorization.  The
reference library has no analog (it is a scoring kernel,
``/root/reference/PyNomaly/loop.py``); this operator belongs to the
engine's training-data surface alongside the dedup families.

Spark-first shape (100 TB reasoning):

* Eval sets are small relative to the corpus (10^3-10^7 n-grams), so the
  eval n-gram relation is broadcast and the contamination join is
  map-side — the only shuffle is the per-document hit aggregation, which
  partial-aggregates (``groupBy(doc).count`` after an exploded
  broadcast-semi match) and is keyed by the document id, never by the
  n-gram (hot n-grams therefore cannot skew a reducer).
* The n-gram generation is pure Catalyst (``split`` → ``filter`` →
  ``transform``/``slice`` → ``explode``): whole-stage codegen, no Python.
* ``hash_keys=True`` joins on ``xxhash64(gram)`` instead of the gram
  string — the broadcast side shrinks to 8 bytes/gram (the same
  narrow-key trick the uniqueness check uses, ``checks.py``), at a
  2^-64 per-pair collision risk that a report-level operator tolerates.

The DuckDB oracle twin (``queries._decontam_sql``) reproduces the
string-key variant exactly: same tokenizer regex, same n-gram windows,
same distinct-hit counting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_tokens",
    "word_ngrams",
    "ngrams_from_tokens",
    "exploded_ngrams",
    "eval_ngrams",
    "contamination_report",
    "decontaminate",
]

# Tokenizer shared with the oracle twin: lowercase, split on anything
# outside [a-z0-9].  ASCII class semantics agree between Java regex
# (Spark) and RE2 (DuckDB); accented/CJK characters are separators in
# both.  Import this constant in SQL generators — never copy the string.
NGRAM_TOKEN_SPLIT = "[^a-z0-9]+"


def word_tokens(text_col: str = "text") -> Column:
    """Lowercased word tokens with empty strings dropped (array<string>)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), NGRAM_TOKEN_SPLIT),
        lambda t: t != "",
    )


def ngrams_from_tokens(tokens_col, n: int = 3) -> Column:
    """N-grams from an ALREADY-MATERIALIZED ``array<string>`` column.

    Guarded: rows with fewer than ``n`` tokens yield an empty array
    (Spark's ``sequence(1, 0)`` would otherwise DESCEND and fabricate
    windows).  ``transform`` lambdas take exactly one argument.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    tk = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(text_col: str = "text", n: int = 3) -> Column:
    """All word ``n``-grams of the document as ``array<string>``.

    Convenience single-expression form for small/ad-hoc frames.  HOT
    PATHS MUST NOT USE THIS: the per-position lambda re-evaluates the
    tokenizer split, costing ~7x (measured 3.7s vs 0.5s over sf0.1) —
    materialize :func:`word_tokens` in its own projection first and
    apply :func:`ngrams_from_tokens` (what :func:`exploded_ngrams`
    does), which whole-stage codegen then evaluates once per row.
    """
    return ngrams_from_tokens(word_tokens(text_col), n)


def exploded_ngrams(
    docs: DataFrame, text_col: str, id_cols: list, n: int
) -> DataFrame:
    """``(*id_cols, gram)`` rows via the two-projection fast path:
    tokens materialized once per row, then n-grams, then explode."""
    return docs.where(F.col(text_col).isNotNull()).select(
        *id_cols, word_tokens(text_col).alias("_tk")
    ).select(
        *id_cols,
        F.explode(ngrams_from_tokens("_tk", n)).alias("gram"),
    )


def eval_ngrams(
    eval_docs: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct n-grams of the evaluation set: one ``gram`` column.

    Run once per benchmark release and persist; the result is the small
    side of every subsequent contamination join.
    """
    return exploded_ngrams(eval_docs, text_col, [], n).distinct()


def contamination_report(
    train_docs: DataFrame,
    eval_grams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    hash_keys: bool = False,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-document contamination: ``(id_col, gram_hits)`` for every
    training document sharing at least one n-gram with the eval set.

    ``gram_hits`` counts DISTINCT matching n-grams (a doc repeating one
    leaked question scores 1, not once per repetition) — the standard
    audit statistic.  Clean documents are absent from the result; a
    left-anti join against it recovers the decontaminated corpus.

    ``broadcast_eval=False`` drops the broadcast hint for abnormally
    large eval relations and lets AQE choose the join strategy.
    """
    grams = exploded_ngrams(train_docs, text_col, [F.col(id_col)], n)
    ev = eval_grams
    if hash_keys:
        grams = grams.select(id_col, F.xxhash64("gram").alias("gk"))
        ev = ev.select(F.xxhash64("gram").alias("gk")).distinct()
        key = "gk"
    else:
        key = "gram"
    if broadcast_eval:
        ev = F.broadcast(ev)
    # join BEFORE deduplicating: the broadcast inner join is map-side
    # and discards every non-matching gram, so the countDistinct
    # shuffle moves only the (rare) contaminated grams — deduplicating
    # the full exploded gram table first would shuffle every n-gram of
    # the whole corpus
    return (
        grams.join(ev, key)
        .groupBy(id_col)
        .agg(F.count_distinct(F.col(key)).alias("gram_hits"))
    )


def decontaminate(
    train_docs: DataFrame,
    eval_grams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    hash_keys: bool = False,
    broadcast_eval: bool = True,
) -> DataFrame:
    """The corpus with every contaminated document removed: a left-anti
    join of ``train_docs`` against :func:`contamination_report` on
    ``id_col`` (null-text rows carry no n-grams and are kept)."""
    report = contamination_report(
        train_docs,
        eval_grams,
        text_col=text_col,
        id_col=id_col,
        n=n,
        hash_keys=hash_keys,
        broadcast_eval=broadcast_eval,
    )
    return train_docs.join(report.select(id_col), id_col, "left_anti")
