"""BM25 retrieval (retrieval.py): python reference parity, vocab
pruning in the plan, phase1 invariance, validation."""

import math
import re

import pytest

from pynomaly_spark.retrieval import bm25_topk
from pynomaly_spark.textops import _TOKEN_SPLIT

DOCS = [
    (1, "hash join hash join hash probe build"),
    (2, "sort merge join large table scan"),
    (3, "window aggregate over stream of events"),
    (4, "the quick brown fox"),
    (5, "hash hash hash hash hash hash hash hash"),
    (6, None),
]
QS = [("qa", ["hash", "join"]), ("qb", ["stream"])]


def _py_bm25(k1=1.2, b=0.75):
    tokzr = re.compile(_TOKEN_SPLIT)
    tok = lambda s: [t for t in tokzr.split(s.lower()) if t]  # noqa: E731
    corpus = {i: tok(t) for i, t in DOCS if t is not None}
    n = len(corpus)
    avgdl = sum(len(v) for v in corpus.values()) / n
    out = {}
    for qid, terms in QS:
        scores = {}
        for i, toks in corpus.items():
            s = 0.0
            for t in set(terms):
                tf = toks.count(t)
                if tf == 0:
                    continue
                df = sum(1 for v in corpus.values() if t in v)
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(toks) / avgdl)
                )
            if s > 0:
                scores[i] = round(s, 6)
        out[qid] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return out


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_python_reference(spark):
    got = {}
    rows = bm25_topk(spark, _df(spark), QS, k=10).collect()
    for r in rows:
        got.setdefault(r.query_id, []).append((r.rnk, r.doc_id, r.score))
    ref = _py_bm25()
    for qid, ranked in ref.items():
        mine = sorted(got[qid])
        assert [(d, s) for _, d, s in mine] == [
            (d, pytest.approx(s, abs=2e-6)) for d, s in ranked
        ]
    # doc 5 spams 'hash' but saturates: doc 1 (hash AND join) wins qa
    assert got["qa"][0][1] == 1 or sorted(got["qa"])[0][1] == 1


def test_bm25_k_truncates_and_phase1_invariant(spark):
    a = sorted(
        map(
            tuple,
            bm25_topk(spark, _df(spark), QS, k=2, phase1=True).collect(),
        )
    )
    c = sorted(
        map(
            tuple,
            bm25_topk(spark, _df(spark), QS, k=2, phase1=False).collect(),
        )
    )
    assert a == c
    assert max(r[1] for r in a) <= 2


def test_bm25_vocab_prune_in_plan(spark):
    """The literal IN filter must appear below the first aggregate —
    only query-vocabulary tokens survive the scan stage."""
    plan = (
        bm25_topk(spark, _df(spark), QS, k=3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "hash" in plan and ("IN (" in plan or "INSET" in plan.upper())


def test_bm25_validates_args(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        bm25_topk(spark, df, [])
    with pytest.raises(ValueError):
        bm25_topk(spark, df, [("q", [])])
    with pytest.raises(ValueError):
        bm25_topk(spark, df, QS, k=0)


# ---------------------------------------------------------------------------
# retrieval.boolean_search — conjunctive/disjunctive set retrieval
# ---------------------------------------------------------------------------

def test_boolean_search_and_or_semantics(spark):
    from pynomaly_spark.retrieval import boolean_search
    import pytest as _pytest

    docs = spark.createDataFrame(
        [
            (1, "Scan the WINDOW, then merge"),   # all 3 (case-folded)
            (2, "scan scan scan window"),          # 2 of 3, dup-proof
            (3, "merge only"),                     # 1 of 3
            (4, "nothing relevant"),               # 0
            (5, None),                             # null text dropped
        ],
        "doc_id long, text string",
    )
    terms = ["scan", "merge", "window"]
    a = {r["doc_id"]: r["n_matched"]
         for r in boolean_search(docs, terms, mode="and").collect()}
    assert a == {1: 3}
    o = {r["doc_id"]: r["n_matched"]
         for r in boolean_search(docs, terms, mode="or").collect()}
    assert o == {1: 3, 2: 2, 3: 1}
    # duplicate query terms collapse; single shuffle regardless of m
    dup = boolean_search(docs, ["scan", "SCAN", "scan"], mode="and")
    assert {r["doc_id"] for r in dup.collect()} == {1, 2}
    plan = dup._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # conjunction is an aggregate, not joins
    with _pytest.raises(ValueError, match="non-empty"):
        boolean_search(docs, [])
    with _pytest.raises(ValueError, match="mode"):
        boolean_search(docs, terms, mode="xor")
