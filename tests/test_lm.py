"""Unigram-LM quality scoring (lm.py): python reference parity,
hot/tail split invariance, OOV floor, empty-model semantics, plan
shape of the skew-split join."""

import math
import re

import pytest

from pynomaly_spark.lm import score_unigram_logprob, unigram_model
from pynomaly_spark.textops import _TOKEN_SPLIT

DOCS = [
    (1, "the cat sat on the mat", "a"),
    (2, "the dog ate the cat food", "a"),
    (3, "zxqv glorp wibble zxqv", "b"),   # improbable tokens
    (4, "the the the the", "b"),
    (5, None, "b"),                        # null text -> no row
    (6, "    ", "b"),                      # no tokens -> no row
]


def _py_scores(texts, alpha=0.5, model_texts=None):
    tokzr = re.compile(_TOKEN_SPLIT)
    tok = lambda s: [t for t in tokzr.split(s.lower()) if t]  # noqa: E731
    counts = {}
    for s in model_texts if model_texts is not None else texts:
        if s is None:
            continue
        for t in tok(s):
            counts[t] = counts.get(t, 0) + 1
    N, V = sum(counts.values()), len(counts)
    out = {}
    for i, s in enumerate(texts):
        if s is None or not tok(s):
            continue
        lps = [
            math.log((counts.get(t, 0) + alpha) / (N + alpha * (V + 1)))
            for t in tok(s)
        ]
        out[i] = round(sum(lps) / len(lps), 6)
    return out


def _df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, source string"
    )


def test_scores_match_python_reference(spark):
    df = _df(spark)
    model = unigram_model(df, "text")
    got = {
        r.doc_id: r
        for r in score_unigram_logprob(
            df, model, "text", "doc_id", carry_cols=("source",), hot_min=3
        ).collect()
    }
    ref = _py_scores([t for _, t, _ in DOCS])
    assert set(got) == {i + 1 for i in ref}
    for i, lp in ref.items():
        assert got[i + 1].logprob == pytest.approx(lp, abs=2e-6)
    # the gibberish doc is the least probable, the stop-soup the most
    assert got[3].logprob == min(r.logprob for r in got.values())
    assert got[4].logprob == max(r.logprob for r in got.values())
    assert got[1].source == "a" and got[1].n_tokens == 6


def test_hot_min_split_invariance(spark):
    """hot/tail is a physical split; scores must not depend on it."""
    df = _df(spark)
    model = unigram_model(df, "text")
    base = None
    for hot_min in (1, 3, 10**9):  # all-hot / mixed / all-tail
        rows = sorted(
            (r.doc_id, r.n_tokens, r.logprob)
            for r in score_unigram_logprob(
                df, model, "text", "doc_id", hot_min=hot_min
            ).collect()
        )
        if base is None:
            base = rows
        assert rows == base, hot_min


def test_oov_floor_and_frozen_model(spark):
    """A frozen model scores NEW docs: unseen tokens take the alpha
    floor, and the model is not updated by what it scores."""
    train = _df(spark).where("doc_id <= 2")
    model = unigram_model(train, "text")
    new = _df(spark).where("doc_id = 3")  # all-OOV under the frozen model
    r = score_unigram_logprob(new, model, "text", "doc_id").collect()[0]
    counts = {}
    for _, t, _ in DOCS[:2]:
        for w in re.split(_TOKEN_SPLIT, t.lower()):
            if w:
                counts[w] = counts.get(w, 0) + 1
    N, V = sum(counts.values()), len(counts)
    floor = math.log(0.5 / (N + 0.5 * (V + 1)))
    assert r.logprob == pytest.approx(round(floor, 6), abs=2e-6)


def test_min_count_prunes_to_oov(spark):
    df = _df(spark)
    pruned = unigram_model(df, "text", min_count=3)
    kept = {r.token for r in pruned.collect()}
    assert "the" in kept and "cat" not in kept  # 'cat' appears twice
    scored = score_unigram_logprob(df, pruned, "text", "doc_id", hot_min=2)
    assert scored.count() == 4  # pruning never drops documents


def test_empty_model_scores_at_alpha_floor(spark):
    df = _df(spark)
    empty = unigram_model(df, "text", min_count=10**9)
    rows = score_unigram_logprob(df, empty, "text", "doc_id").collect()
    # N=0, V=0 -> every token at ln(alpha/alpha) = 0
    assert rows and all(r.logprob == 0.0 for r in rows)


def test_validates_args(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        unigram_model(df, "text", min_count=0)
    with pytest.raises(ValueError):
        score_unigram_logprob(df, unigram_model(df, "text"), alpha=0.0)


def test_hot_join_is_broadcast(spark):
    """The hot head must join map-side: a BroadcastHashJoin over the
    hot relation, no shuffle of the hot keys."""
    df = _df(spark)
    model = unigram_model(df, "text")
    plan = (
        score_unigram_logprob(df, model, "text", "doc_id", hot_min=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_self_trained_equals_explicit_model(spark):
    """model=None derives the model from the scoring tf exchange; it
    must equal training explicitly on the same corpus, and the physical
    plan must reuse the tf exchange instead of re-exploding."""
    df = _df(spark)
    explicit = sorted(
        map(
            tuple,
            score_unigram_logprob(
                df, unigram_model(df, "text"), "text", "doc_id", hot_min=3
            ).collect(),
        )
    )
    selftrained = score_unigram_logprob(
        df, None, "text", "doc_id", hot_min=3
    )
    assert sorted(map(tuple, selftrained.collect())) == explicit
    plan = selftrained._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


class TestDsirScores:
    def _py(self, texts, target_ids, n=2, bucket_chars=3):
        import hashlib
        import math
        import re
        from collections import Counter

        from pynomaly_spark.decontam import NGRAM_TOKEN_SPLIT

        def grams(t):
            tk = [x for x in re.split(NGRAM_TOKEN_SPLIT, t.lower()) if x]
            return [
                " ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)
            ]

        nb = float(16 ** bucket_chars)
        per, rc, tc = {}, Counter(), Counter()
        for d, t in texts:
            bs = [
                hashlib.md5(g.encode()).hexdigest()[:bucket_chars]
                for g in grams(t)
            ]
            per[d] = bs
            rc.update(bs)
            if d in target_ids:
                tc.update(bs)
        big_r, big_t = sum(rc.values()), sum(tc.values())
        w = {
            b: math.log((tc.get(b, 0) + 1.0) / (big_t + nb))
            - math.log((c + 1.0) / (big_r + nb))
            for b, c in rc.items()
        }
        return {
            d: (len(bs), round(sum(w[b] for b in bs) / len(bs), 6))
            for d, bs in per.items()
            if bs
        }

    def test_matches_python_reference(self, spark):
        from pynomaly_spark.lm import dsir_scores

        texts = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox sat still"),
            (3, "numeric tables and boiler plate spam spam spam"),
            (4, "one"),  # single token -> no bigrams -> absent
            (5, None),
        ]
        raw = spark.createDataFrame(texts, ["doc_id", "text"])
        target = raw.where("doc_id <= 2")
        got = {
            r.doc_id: r
            for r in dsir_scores(raw, target, "text", "doc_id").collect()
        }
        want = self._py(
            [(d, t) for d, t in texts if t is not None], {1, 2}
        )
        assert set(got) == set(want)
        for d, (ng, score) in want.items():
            assert got[d].n_grams == ng
            assert got[d].dsir_logratio == pytest.approx(score, abs=2e-6)
            assert got[d].keep_flag == int(got[d].dsir_logratio >= 0.0)
        # target-like docs outscore the spam doc
        assert got[1].dsir_logratio > got[3].dsir_logratio

    def test_empty_target_is_uniform_prior(self, spark):
        from pynomaly_spark.lm import dsir_scores

        raw = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta alpha beta")],
            ["doc_id", "text"],
        )
        target = raw.where("doc_id < 0")
        rows = dsir_scores(raw, target, "text", "doc_id").collect()
        assert len(rows) == 2  # scores exist; smoothing avoids log(0)
        for r in rows:
            assert r.dsir_logratio is not None

    def test_validates_args_and_broadcasts(self, spark):
        from pynomaly_spark.lm import dsir_scores

        raw = spark.createDataFrame(
            [(1, "alpha beta gamma")], ["doc_id", "text"]
        )
        with pytest.raises(ValueError):
            dsir_scores(raw, raw, "text", "doc_id", n=0)
        with pytest.raises(ValueError):
            dsir_scores(raw, raw, "text", "doc_id", bucket_chars=9)
        plan = (
            dsir_scores(raw, raw, "text", "doc_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# lm.build_vocab — banded two-level frequency rank
# ---------------------------------------------------------------------------

def test_build_vocab_ids_match_global_order(spark):
    from pynomaly_spark.lm import build_vocab
    import pyspark.sql.functions as F

    # zipfish synthetic: token t_i appears (1000 // (i+1)) times; many
    # count ties in the tail + a heavy head crossing head_cap=16
    rows = []
    for i in range(300):
        rows += [(f"t{i:03d}",)] * max(1, 1000 // (i + 1))
    df = spark.createDataFrame(rows, "tok string")
    got = build_vocab(df, "tok", min_count=1, head_cap=16).collect()
    # contiguous 0-based ids
    ids = sorted(r["vocab_id"] for r in got)
    assert ids == list(range(len(got)))
    # id order == (n DESC, token ASC)
    by_id = sorted(got, key=lambda r: r["vocab_id"])
    expect = sorted(got, key=lambda r: (-r["n"], r["token"]))
    assert [r["token"] for r in by_id] == [r["token"] for r in expect]
    assert by_id[0]["token"] == "t000" and by_id[0]["n"] == 1000


def test_build_vocab_min_count_nulls_and_validation(spark):
    from pynomaly_spark.lm import build_vocab
    import pytest as _pytest

    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("",), (None,)], "tok string"
    )
    got = {r["token"]: r for r in build_vocab(df, "tok", min_count=2).collect()}
    assert set(got) == {"a"} and got["a"]["vocab_id"] == 0
    with _pytest.raises(ValueError, match="min_count"):
        build_vocab(df, "tok", min_count=0)
    with _pytest.raises(ValueError, match="unknown column"):
        build_vocab(df, "nope")


def test_feature_hash_sign_cancellation_and_bounds(spark):
    from pynomaly_spark.lm import feature_hash
    import hashlib

    def slot_sign(t, dim=8):
        h = hashlib.md5(f"fh:{t}".encode()).hexdigest()
        return int(h[:4], 16) % dim, (int(h[4], 16) % 2) * 2 - 1

    rows = [(1, "alpha"), (1, "alpha"), (1, "beta"), (2, "gamma"),
            (2, ""), (None, "x"), (3, None)]
    df = spark.createDataFrame(rows, "doc long, tok string")
    got = {(r["doc"], r["slot"]): r["weight"]
           for r in feature_hash(df, "doc", "tok", dim=8).collect()}
    # recompute expected sparse map in python with the same hash
    expect = {}
    for d, t in rows:
        if d is None or not t:
            continue
        s, sg = slot_sign(t)
        expect[(d, s)] = expect.get((d, s), 0) + sg
    assert got == expect
    assert all(0 <= s < 8 for _, s in got)
    with pytest.raises(ValueError, match="power of two"):
        feature_hash(df, "doc", "tok", dim=100)
    with pytest.raises(ValueError, match="unknown column"):
        feature_hash(df, "doc", "nope")


def test_linear_score_exact_margin_and_pruned_slots(spark):
    """Known sparse features × known weights → exact integer margin;
    slots absent from the weight table contribute 0; the sign decision
    follows the margin."""
    from pynomaly_spark.lm import linear_score

    feats = spark.createDataFrame(
        [(1, 0, 2), (1, 1, -1), (1, 9, 100),   # slot 9 is pruned
         (2, 0, -3), (3, 1, 0)],
        "doc_id long, slot long, weight long",
    )
    weights = spark.createDataFrame(
        [(0, 5), (1, -4)], "slot long, w long"
    )
    got = {r["doc_id"]: (r["score"], r["positive"])
           for r in linear_score(feats, weights, id_col="doc_id").collect()}
    assert got == {1: (2 * 5 + (-1) * -4 + 0, True),
                   2: (-15, False), 3: (0, False)}
    # bias shifts the margin and can flip the decision
    got_b = {r["doc_id"]: (r["score"], r["positive"])
             for r in linear_score(
                 feats, weights, id_col="doc_id", bias=16).collect()}
    assert got_b[2] == (1, True)
    with pytest.raises(ValueError, match="unknown feature column"):
        linear_score(feats, weights, id_col="nope")
    with pytest.raises(ValueError, match="unknown weight column"):
        linear_score(feats, weights.withColumnRenamed("w", "v"))


def test_bigram_logprob_handchecked_and_oov_floor(spark):
    """Self-trained bigram scores match a literal python recursion;
    a frozen model sends unseen contexts to the 1/(V2+1) floor;
    word-salad scores below fluent text under a frozen fluent model."""
    import math

    from pynomaly_spark.lm import bigram_model, score_bigram_logprob

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "zz")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["logprob"])
           for r in score_bigram_logprob(docs, None, alpha=0.5).collect()}
    # corpus bigrams: (the,cat) x2, (cat,sat), (cat,ran); V2 = 3
    # c1: the=2, cat=2
    def lp(c12, c1, v2=3.0, a=0.5):
        return math.log((c12 + a) / (c1 + a * (v2 + 1)))
    exp1 = (lp(2, 2) + lp(1, 2)) / 2
    assert got[1] == (2, round(exp1, 6))
    assert 3 not in got                      # <2 tokens -> no row
    # frozen model + unseen context
    model = bigram_model(docs)
    new = spark.createDataFrame([(9, "qq ww")], "doc_id long, text string")
    r = score_bigram_logprob(new, model, alpha=0.5).collect()[0]
    assert r["logprob"] == round(math.log(0.5 / (0.0 + 0.5 * 4)), 6)
    # discrimination: scrambled text scores lower under the fluent model
    fluent = spark.createDataFrame(
        [(1, "the cat sat the cat ran the cat sat")],
        "doc_id long, text string",
    )
    m2 = bigram_model(fluent)
    pair = spark.createDataFrame(
        [(1, "the cat sat"), (2, "sat the ran cat")],
        "doc_id long, text string",
    )
    sc = {r["doc_id"]: r["logprob"]
          for r in score_bigram_logprob(pair, m2).collect()}
    assert sc[1] > sc[2]
