"""Decontamination + deterministic sampling operators.

Planted-overlap correctness, two-phase group-cap exactness vs the naive
window, hot-group pruning, and empty/null-input edges.
"""

import pyspark.sql.functions as F
import pytest

from pynomaly_spark.decontam import (
    contamination_report,
    eval_ngrams,
    word_ngrams,
)
from pynomaly_spark.sampling import (
    deterministic_sample,
    group_cap,
    temperature_rates,
    temperature_resample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDecontam:
    def test_planted_overlap(self, spark):
        ev = _docs(spark, [(100, "the quick brown fox jumps")])
        tr = _docs(
            spark,
            [
                (1, "a quick brown fox ran away"),   # shares 1 trigram
                (2, "completely unrelated words here"),
                (3, "the quick brown fox jumps again"),  # shares 3
                (4, None),
            ],
        )
        grams = eval_ngrams(ev, n=3)
        out = {
            r["doc_id"]: r["gram_hits"]
            for r in contamination_report(tr, grams, n=3).collect()
        }
        assert out == {1: 1, 3: 3}

    def test_repeated_leak_counts_once(self, spark):
        ev = _docs(spark, [(100, "alpha beta gamma")])
        tr = _docs(
            spark, [(1, "alpha beta gamma and alpha beta gamma again")]
        )
        out = contamination_report(tr, eval_ngrams(ev, n=3), n=3).collect()
        assert [(r["doc_id"], r["gram_hits"]) for r in out] == [(1, 1)]

    def test_hash_keys_matches_string_keys(self, spark):
        ev = _docs(spark, [(100, "one two three four five")])
        tr = _docs(
            spark,
            [(i, f"filler {w} one two three tail") for i, w in
             enumerate(["a", "b", "c"])],
        )
        grams = eval_ngrams(ev, n=3)
        a = sorted(
            contamination_report(tr, grams, n=3, hash_keys=False).collect()
        )
        b = sorted(
            contamination_report(tr, grams, n=3, hash_keys=True).collect()
        )
        assert a == b and len(a) == 3

    def test_short_docs_yield_no_ngrams(self, spark):
        # fewer tokens than n must NOT fabricate windows (Spark's
        # sequence(1, 0) descends if unguarded)
        df = _docs(spark, [(1, "two words"), (2, ""), (3, "one")])
        rows = df.select(
            F.size(word_ngrams("text", 3)).alias("k")
        ).collect()
        assert [r["k"] for r in rows] == [0, 0, 0]

    def test_tokenizer_case_and_punct(self, spark):
        df = _docs(spark, [(1, "Hello, WORLD!  foo")])
        (row,) = df.select(word_ngrams("text", 2).alias("g")).collect()
        assert row["g"] == ["hello world", "world foo"]

    def test_empty_eval_set(self, spark):
        tr = _docs(spark, [(1, "some training text here")])
        ev = _docs(spark, []).where(F.lit(False))
        out = contamination_report(tr, eval_ngrams(ev, n=3), n=3)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "doc_id", "gram_hits",
        ]

    def test_bad_n_raises(self, spark):
        with pytest.raises(ValueError):
            word_ngrams("text", 0)


def _grouped(spark, sizes):
    rows = []
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


class TestGroupCap:
    def test_two_phase_matches_naive_window(self, spark):
        df = _grouped(spark, {"a": 57, "b": 3, "c": 200})
        naive = sorted(
            group_cap(df, "source", 8, two_phase=False).collect()
        )
        fast = sorted(
            group_cap(df, "source", 8, two_phase=True).collect()
        )
        assert naive == fast
        per = {}
        for r in naive:
            per[r["source"]] = max(per.get(r["source"], 0), r["rnk"])
        assert per == {"a": 8, "b": 3, "c": 8}

    def test_hot_group_pruned_before_window(self, spark):
        # one viral group: phase 1 must shrink the window's input far
        # below the group size (prefix-exactness keeps results identical)
        df = _grouped(spark, {"hot": 5000, "cold": 10})
        capped = group_cap(df, "source", 5, two_phase=True, oversample=4.0)
        rows = capped.collect()
        assert len(rows) == 10  # 5 + 5
        naive = group_cap(df, "source", 5, two_phase=False).collect()
        assert sorted(rows) == sorted(naive)

    def test_retry_when_oversample_too_tight(self, spark):
        # oversample <1 makes phase-1 undershoot k for some groups: the
        # retry pass must still return the exact top-k
        df = _grouped(spark, {"a": 100, "b": 50})
        exact = sorted(group_cap(df, "source", 20, two_phase=False).collect())
        tight = sorted(
            group_cap(
                df, "source", 20, two_phase=True, oversample=0.5
            ).collect()
        )
        assert exact == tight

    def test_deterministic_across_runs(self, spark):
        df = _grouped(spark, {"a": 40}).repartition(7)
        one = sorted(group_cap(df, "source", 6).collect())
        two = sorted(group_cap(df.repartition(3), "source", 6).collect())
        assert one == two

    def test_bad_k_raises(self, spark):
        df = _grouped(spark, {"a": 2})
        with pytest.raises(ValueError):
            group_cap(df, "source", 0)


class TestDeterministicSample:
    def test_rate_and_reproducibility(self, spark):
        df = spark.range(4000).withColumnRenamed("id", "doc_id")
        kept = df.where(deterministic_sample(df, 0.25)).collect()
        frac = len(kept) / 4000
        assert 0.20 < frac < 0.30
        again = df.where(deterministic_sample(df, 0.25)).collect()
        assert sorted(kept) == sorted(again)

    def test_nested_rates(self, spark):
        # a smaller sample must be a subset of a larger one (prefix
        # property of the hash threshold) — the audit-friendly behavior
        df = spark.range(2000).withColumnRenamed("id", "doc_id")
        small = {r["doc_id"] for r in df.where(
            deterministic_sample(df, 0.1)).collect()}
        big = {r["doc_id"] for r in df.where(
            deterministic_sample(df, 0.3)).collect()}
        assert small <= big

    def test_bad_rate_raises(self, spark):
        df = spark.range(5).withColumnRenamed("id", "doc_id")
        with pytest.raises(ValueError):
            deterministic_sample(df, 1.5)


class TestDupClusters:
    def _pairs(self, spark, rows):
        from pyspark.sql.types import LongType, StructField, StructType

        schema = StructType(
            [StructField("id_a", LongType()), StructField("id_b", LongType())]
        )
        return spark.createDataFrame(rows, schema)

    def test_transitive_chain_collapses(self, spark):
        from pynomaly_spark.dedup import dup_clusters

        # A~B, B~C, C~D: one cluster rooted at the smallest id, even
        # though A~C and A~D were never emitted
        out = dup_clusters(self._pairs(spark, [(1, 2), (2, 3), (3, 4)]))
        rows = {r["node"]: r for r in out.collect()}
        assert set(rows) == {1, 2, 3, 4}
        assert all(r["cluster_id"] == 1 for r in rows.values())
        assert all(r["cluster_size"] == 4 for r in rows.values())
        assert [n for n, r in rows.items() if r["is_canonical"]] == [1]

    def test_separate_components(self, spark):
        from pynomaly_spark.dedup import dup_clusters

        out = dup_clusters(
            self._pairs(spark, [(10, 11), (20, 21), (21, 22)])
        ).collect()
        by_cluster = {}
        for r in out:
            by_cluster.setdefault(r["cluster_id"], set()).add(r["node"])
        assert by_cluster == {10: {10, 11}, 20: {20, 21, 22}}

    def test_long_chain_converges_via_pointer_doubling(self, spark):
        from pynomaly_spark.dedup import dup_clusters

        # 64-node path has diameter 63: plain hash-min would need 63
        # rounds; with the shortcut step, well under max_iter=10
        pairs = self._pairs(spark, [(i, i + 1) for i in range(63)])
        out = dup_clusters(pairs, max_iter=10).collect()
        assert len(out) == 64
        assert all(r["cluster_id"] == 0 for r in out)

    def test_strict_raises_when_not_converged(self, spark):
        from pynomaly_spark.dedup import dup_clusters

        pairs = self._pairs(spark, [(i, i + 1) for i in range(20)])
        with pytest.raises(RuntimeError):
            dup_clusters(pairs, max_iter=1, strict=True)
        # non-strict returns the partial labels instead
        partial = dup_clusters(pairs, max_iter=1, strict=False)
        assert partial.count() == 21

    def test_empty_pairs(self, spark):
        from pynomaly_spark.dedup import dup_clusters

        out = dup_clusters(self._pairs(spark, []))
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "node", "cluster_id", "cluster_size", "is_canonical",
        ]


class TestPiiAndRepetition:
    def test_pii_counts_and_scrub(self, spark):
        from pynomaly_spark.textops import pii_counts, pii_scrub

        df = spark.createDataFrame(
            [
                (1, "mail me at Jane.Doe+x@Example.org or 10.0.0.1"),
                (2, "call 555-867-5309 twice: 555-867-5309"),
                (3, "clean text with no identifiers at all"),
                (4, "a@b.io and 192.168.1.255 and 555-123-4567"),
            ],
            "doc_id long, text string",
        )
        out = df.select(
            "doc_id",
            pii_counts("text").alias("p"),
            pii_scrub("text").alias("s"),
        ).collect()
        rows = {r["doc_id"]: r for r in out}
        assert rows[1]["p"]["n_email"] == 1 and rows[1]["p"]["n_ipv4"] == 1
        assert rows[2]["p"]["n_phone"] == 2
        assert tuple(rows[3]["p"]) == (0, 0, 0)
        assert rows[3]["s"] == "clean text with no identifiers at all"
        assert rows[4]["s"] == "<EMAIL> and <IP> and <PHONE>"
        assert "Jane.Doe" not in rows[1]["s"] and "10.0.0.1" not in rows[1]["s"]
        assert "5309" not in rows[2]["s"]

    def test_repetition_separates_spam_from_prose(self, spark):
        from pynomaly_spark.textops import repetition_stats

        df = spark.createDataFrame(
            [
                (1, "buy now " * 50),               # one bigram repeated
                (2, "the quick brown fox jumps over a lazy dog today"),
                (3, "x"),                            # < n tokens: absent
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in repetition_stats(df, "text", "doc_id", n=2).collect()
        }
        assert set(out) == {1, 2}
        assert out[1]["dup_gram_fraction"] > 0.9
        assert out[1]["top_gram_fraction"] > 0.49
        assert out[2]["dup_gram_fraction"] == 0.0
        assert abs(out[2]["top_gram_fraction"] - 1.0 / 9.0) < 1e-9


def test_decontaminate_removes_only_contaminated(spark):
    from pynomaly_spark.decontam import decontaminate, eval_ngrams

    ev = _docs(spark, [(100, "the quick brown fox jumps")])
    tr = _docs(
        spark,
        [
            (1, "a quick brown fox ran away"),
            (2, "completely unrelated words here"),
            (3, None),
        ],
    )
    clean = decontaminate(tr, eval_ngrams(ev, n=3), n=3)
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 3]


def test_group_cap_null_group_is_a_real_group(spark):
    # a NULL domain must be capped like any other group on BOTH paths
    # (the name-based count join would silently drop it from two-phase)
    rows = [(i, None) for i in range(30)] + [(100 + i, "a") for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    naive = sorted(group_cap(df, "source", 5, two_phase=False).collect())
    fast = sorted(group_cap(df, "source", 5, two_phase=True).collect())
    assert naive == fast
    nulls = [r for r in fast if r["source"] is None]
    assert len(nulls) == 5 and {r["rnk"] for r in nulls} == {1, 2, 3, 4, 5}


class TestTemperatureResample:
    def _skewed(self, spark):
        rows = (
            [(i, "head") for i in range(1000)]
            + [(2000 + i, "mid") for i in range(100)]
            + [(3000 + i, "tail") for i in range(10)]
        )
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def test_rates_match_numpy(self, spark):
        import numpy as np

        df = self._skewed(spark)
        out = {r["lang"]: r for r in temperature_rates(df, "lang", 0.3).collect()}
        n = np.array([1000.0, 100.0, 10.0])
        pa = (n / n.sum()) ** 0.3
        rate = np.minimum(1.0, (pa / pa.sum()) * n.sum() / n)
        for lang, nn, rr in zip(("head", "mid", "tail"), n, rate):
            assert out[lang]["n_rows"] == int(nn)
            assert out[lang]["rate"] == pytest.approx(round(float(rr), 6), abs=2e-6)
        # alpha < 1 downsamples the head and keeps the whole tail
        assert out["head"]["rate"] < 1.0
        assert out["tail"]["rate"] == 1.0

    def test_resample_flattens_and_reproduces(self, spark):
        df = self._skewed(spark)
        kept = temperature_resample(df, "lang", 0.3)
        counts = {r["lang"]: r["n"] for r in
                  kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
        # tail keeps everything; head lands near n*rate (hash-uniform)
        assert counts["tail"] == 10
        rate = {r["lang"]: r["rate"] for r in
                temperature_rates(df, "lang", 0.3).collect()}
        assert counts["head"] == pytest.approx(1000 * rate["head"], rel=0.25)
        # head share strictly shrinks vs the natural distribution
        total = sum(counts.values())
        assert counts["head"] / total < 1000 / 1110
        again = {r["lang"]: r["n"] for r in
                 temperature_resample(df, "lang", 0.3)
                 .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert counts == again

    def test_alpha_one_keeps_natural_distribution(self, spark):
        df = self._skewed(spark)
        for r in temperature_rates(df, "lang", 1.0).collect():
            assert r["rate"] == 1.0
        assert temperature_resample(df, "lang", 1.0).count() == 1110

    def test_null_group_is_rated_and_sampled(self, spark):
        rows = [(i, "a") for i in range(50)] + [(100 + i, None) for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        rates = {r["lang"]: r["rate"] for r in
                 temperature_rates(df, "lang", 0.5).collect()}
        assert None in rates and rates[None] == 1.0  # equal groups: no downsampling
        kept = temperature_resample(df, "lang", 0.5)
        assert kept.where(F.col("lang").isNull()).count() == 50

    def test_target_total_scales_rates(self, spark):
        df = self._skewed(spark)
        # asking for a tenth of the corpus must cut every rate (clamped at 1)
        small = {r["lang"]: r["rate"] for r in
                 temperature_rates(df, "lang", 0.3, target_total=111).collect()}
        full = {r["lang"]: r["rate"] for r in
                temperature_rates(df, "lang", 0.3).collect()}
        for lang in ("head", "mid"):
            assert small[lang] < full[lang]

    def test_bad_args_raise(self, spark):
        df = self._skewed(spark)
        with pytest.raises(ValueError):
            temperature_rates(df, "lang", 0.0)
        with pytest.raises(ValueError):
            temperature_rates(df, "lang", 0.3, target_total=-1)


def test_full_rate_sample_keeps_everything(spark):
    # rate=1.0 once rendered a 9-hex-char threshold that the 8-char
    # string compare judged SMALLER than most keys, dropping ~94% of
    # rows; the full sample must keep every non-null id
    df = spark.range(500).withColumnRenamed("id", "doc_id")
    assert df.where(deterministic_sample(df, 1.0)).count() == 500
    assert df.where(deterministic_sample(df, 0.0)).count() == 0


class TestSplitAssign:
    def _docs(self, spark):
        from pyspark.sql import functions as F
        return (
            spark.range(4000)
            .withColumnRenamed("id", "doc_id")
            .withColumn("lang", F.concat(F.lit("l"), F.pmod("doc_id", 4)))
        )

    def test_fractions_and_stratification(self, spark):
        from pynomaly_spark.sampling import split_assign
        df = self._docs(spark)
        tagged = df.select("lang", split_assign("doc_id").alias("split"))
        total = {r["split"]: r["count"] for r in
                 tagged.groupBy("split").count().collect()}
        assert set(total) == {"train", "val", "test"}
        assert abs(total["train"] / 4000 - 0.9) < 0.03
        assert abs(total["val"] / 4000 - 0.05) < 0.02
        # stratification for free: every lang sees ~the same fractions
        for r in tagged.groupBy("lang", "split").count().collect():
            frac = r["count"] / 1000
            want = 0.9 if r["split"] == "train" else 0.05
            assert abs(frac - want) < 0.05, (r["lang"], r["split"], frac)

    def test_disjoint_exhaustive_reproducible(self, spark):
        from pynomaly_spark.sampling import split_assign
        df = self._docs(spark)
        a = dict(df.select("doc_id", split_assign("doc_id").alias("s"))
                 .collect())
        b = dict(df.repartition(13)
                 .select("doc_id", split_assign("doc_id").alias("s"))
                 .collect())
        assert a == b and len(a) == 4000 and None not in a.values()

    def test_salt_opens_fresh_family(self, spark):
        from pyspark.sql import functions as F
        from pynomaly_spark.sampling import deterministic_sample, split_assign
        df = self._docs(spark)
        # test-split membership must be ~independent of the 10% sample
        both = df.where(
            deterministic_sample(df, 0.1)
            & (split_assign("doc_id") == "test")
        ).count()
        assert 5 <= both <= 45  # E=20 under independence; 0 or 200 = coupled

    def test_null_id_gets_null_split(self, spark):
        from pynomaly_spark.sampling import split_assign
        df = spark.createDataFrame([(1,), (None,)], "doc_id bigint")
        rows = {r["doc_id"]: r["s"] for r in
                df.select("doc_id", split_assign("doc_id").alias("s"))
                .collect()}
        assert rows[1] is not None and rows[None] is None

    def test_threshold_validation(self, spark):
        import pytest as _pt
        from pynomaly_spark.sampling import split_thresholds
        with _pt.raises(ValueError):
            split_thresholds({})
        with _pt.raises(ValueError):
            split_thresholds({"a": 0.5, "b": 0.4})
        with _pt.raises(ValueError):
            split_thresholds({"a": 1.2, "b": -0.2})
        ts = split_thresholds({"train": 0.9, "val": 0.05, "test": 0.05})
        assert ts[0] == ("train", "e6666666") and ts[-1] == ("test", None)


class TestShuffleOrder:
    def _docs(self, spark, n=500):
        return spark.range(n).select(F.col("id").alias("doc_id")).repartition(7)

    def test_positions_are_the_md5_permutation(self, spark):
        from pynomaly_spark.sampling import shuffle_order

        df = self._docs(spark)
        got = {
            r.doc_id: r.position
            for r in shuffle_order(df, "doc_id", seed="t").collect()
        }
        # reference: single global sort by the same key
        ref_rows = (
            df.withColumn(
                "_k", F.md5(F.concat(F.lit("t:"), F.col("doc_id").cast("string")))
            )
            .orderBy("_k", "doc_id")
            .collect()
        )
        ref = {r.doc_id: i for i, r in enumerate(ref_rows)}
        assert got == ref
        assert sorted(got.values()) == list(range(500))

    def test_bucket_count_invariance_and_shards(self, spark):
        from pynomaly_spark.sampling import shuffle_order

        df = self._docs(spark, 200)
        a = {
            r.doc_id: (r.position, r.shard)
            for r in shuffle_order(df, "doc_id", n_shards=4).collect()
        }
        b = {
            r.doc_id: (r.position, r.shard)
            for r in shuffle_order(df, "doc_id", n_shards=4, n_buckets=1).collect()
        }
        assert a == b
        sizes = {}
        for _, sh in a.values():
            sizes[sh] = sizes.get(sh, 0) + 1
        assert max(sizes.values()) - min(sizes.values()) <= 1
        assert set(sizes) == {0, 1, 2, 3}

    def test_null_ids_dropped_and_seed_changes_order(self, spark):
        from pynomaly_spark.sampling import shuffle_order

        df = spark.createDataFrame(
            [(1,), (2,), (None,), (3,)], "doc_id bigint"
        )
        rows = shuffle_order(df, "doc_id", seed="a").collect()
        assert sorted(r.doc_id for r in rows) == [1, 2, 3]
        assert sorted(r.position for r in rows) == [0, 1, 2]
        pa = {r.doc_id: r.position
              for r in shuffle_order(self._docs(spark), "doc_id", seed="a").collect()}
        pb = {r.doc_id: r.position
              for r in shuffle_order(self._docs(spark), "doc_id", seed="b").collect()}
        assert pa != pb  # fresh hash family per seed

    def test_big_window_is_bucket_partitioned(self, spark):
        from pynomaly_spark.sampling import shuffle_order

        plan = (
            shuffle_order(self._docs(spark), "doc_id")
            ._jdf.queryExecution()
            .optimizedPlan()
            .numberedTreeString()
        )
        # the corpus-sized rank must be keyed by _bucket; the only
        # unkeyed window is the <=n_buckets offsets prefix sum
        import re

        wins = re.findall(r"Window \[.*?\]", plan)
        ranked = [w for w in wins if "row_number" in w]
        assert ranked and all("_bucket" in w for w in ranked)

    def test_validates_args(self, spark):
        from pynomaly_spark.sampling import shuffle_order

        df = self._docs(spark, 10)
        with pytest.raises(ValueError):
            shuffle_order(df, "doc_id", n_buckets=0)
        with pytest.raises(ValueError):
            shuffle_order(df, "doc_id", n_buckets=65537)
        with pytest.raises(ValueError):
            shuffle_order(df, "doc_id", n_shards=-1)


def test_sample_bias_audit_flags_planted_bias(spark):
    """An unbiased value passes; a value CORRELATED with the sample
    hash (planted: kept ids get 10x the value) must flag."""
    import hashlib

    from pynomaly_spark.sampling import sample_bias_audit
    import pytest as _pytest

    rate = 0.25
    thresh = format(int(rate * (1 << 32)), "08x")
    kept = lambda i: hashlib.md5(str(i).encode()).hexdigest()[:8] < thresh
    # unbiased: constant-ish value independent of the hash
    fair = [("g", i, 100 + (i % 7)) for i in range(400)]
    df = spark.createDataFrame(fair, "grp string, doc_id long, v long")
    out = sample_bias_audit(df, "grp", "v", rate).collect()[0]
    assert out["flag"] == 0 and out["n_sample"] > 0
    # planted bias: kept rows carry 10x values
    biased = [
        ("g", i, 1000 if kept(i) else 100) for i in range(400)
    ]
    df2 = spark.createDataFrame(biased, "grp string, doc_id long, v long")
    out2 = sample_bias_audit(df2, "grp", "v", rate).collect()[0]
    assert out2["flag"] == 1 and out2["ratio_6dp"] > 1000000
    assert out2["mean_sample_6dp"] == 1000 * 1000000
    with _pytest.raises(ValueError, match="unknown column"):
        sample_bias_audit(df, "grp", "nope", rate)


def test_shard_manifest_detects_row_drop_and_swap(spark, tmp_path):
    """The manifest's order-independent checksum changes when a row is
    dropped or an id is swapped, and is invariant to partitioning."""
    from pynomaly_spark.queries import QUERIES

    rows = [(i, f"text {i} " * 3, "en", "s") for i in range(200)]
    schema = "doc_id long, text string, lang string, source string"

    def manifest(rs, sub):
        d = str(tmp_path / sub)
        spark.createDataFrame(rs, schema).coalesce(1).write.parquet(
            f"{d}/documents.parquet"
        )
        return {
            r["shard"]: (r["n_docs"], r["bytes"], r["checksum"])
            for r in QUERIES["doc_shard_manifest"](spark, d).collect()
        }

    base = manifest(rows, "base")
    assert len(base) == 8 and sum(v[0] for v in base.values()) == 200
    # shard sizes differ by at most one (round-robin contract)
    sizes = [v[0] for v in base.values()]
    assert max(sizes) - min(sizes) <= 1
    # dropping a row changes at least one shard's triple
    dropped = manifest(rows[:-1], "drop")
    assert dropped != base
    # swapping an id (same count, same bytes) still changes a checksum
    swapped = manifest(
        [(10_000 if i == 7 else i, t, l, s) for (i, t, l, s) in rows],
        "swap",
    )
    assert any(
        base[k][2] != swapped[k][2]
        for k in base
        if k in swapped
    )
