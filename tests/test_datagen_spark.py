"""Distributed datagen: determinism + exact planted-defect counts."""

import pytest
from pyspark.sql import functions as F

from pynomaly_spark.datagen_spark import generate_code_table_spark


@pytest.fixture(scope="module")
def generated(spark):
    files, commits, expected = generate_code_table_spark(
        spark, 20_000, seed=7
    )
    return files.persist(), commits, expected


def test_total_rows(generated):
    files, _, exp = generated
    assert files.count() == exp["total_rows"]


def test_planted_counts(generated):
    files, commits, exp = generated
    dup = (
        files.groupBy("repo", "path", "commit")
        .count()
        .where("count > 1")
        .agg(F.sum(F.col("count") - 1))
        .head()[0]
    )
    assert dup == exp["dup_extra_rows"]
    orphans = files.join(commits, on=["repo", "commit"], how="left_anti")
    assert orphans.count() == exp["orphan_rows"]
    assert (
        files.where("lang is null").count() == exp["null_lang_rows"]
    )
    assert (
        files.where("content is null").count() == exp["null_content_rows"]
    )


def _content_digest(df):
    # order-insensitive xor of row hashes (sum would overflow ANSI longs)
    return df.agg(F.expr("bit_xor(xxhash64(repo, path, commit, lang, content))")).head()[0]


def test_deterministic(spark, generated):
    files, _, _ = generated
    files2, _, _ = generate_code_table_spark(spark, 20_000, seed=7)
    assert _content_digest(files) == _content_digest(files2)
    files3, _, _ = generate_code_table_spark(spark, 20_000, seed=8)
    assert _content_digest(files) != _content_digest(files3)


def test_skew_present(generated):
    files, _, _ = generated
    top = (
        files.groupBy("repo").count().orderBy(F.desc("count")).head()
    )
    assert top["count"] > 0.2 * 20_000  # hot repo carries real skew
    langs = files.groupBy("lang").count().toPandas()
    assert langs.set_index("lang")["count"].idxmax() == "python"
