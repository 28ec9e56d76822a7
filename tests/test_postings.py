"""Inverted-index builder (retrieval.build_postings).

Cross-engine parity for the registry query lives in the oracle gate;
these pin the operator semantics: impact order, exact salted cap,
full-corpus stats under truncation.
"""

import pytest

from pynomaly_spark.retrieval import build_postings


def _corpus(spark):
    rows = [
        (1, "apple apple apple banana"),
        (2, "apple banana banana"),
        (3, "apple cherry"),
        (4, "banana"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_order_stats_and_render(spark):
    out = {r["term"]: r for r in build_postings(_corpus(spark)).collect()}
    assert set(out) == {"apple", "banana", "cherry"}
    a = out["apple"]
    # impact order: tf DESC, then doc ASC among the tf=1 tie (docs 2,3)
    assert a["postings"] == "1:3|2:1|3:1"
    assert (a["df"], a["cf"], a["n_postings"]) == (3, 5, 3)
    b = out["banana"]
    assert b["postings"] == "2:2|1:1|4:1"
    assert out["cherry"]["postings"] == "3:1"


def test_postings_cap_keeps_full_stats(spark):
    out = {
        r["term"]: r
        for r in build_postings(_corpus(spark), max_postings=2).collect()
    }
    a = out["apple"]
    # stored list truncated to the 2 highest-impact postings...
    assert a["postings"] == "1:3|2:1" and a["n_postings"] == 2
    # ...but df/cf still cover the whole corpus
    assert (a["df"], a["cf"]) == (3, 5)


def test_postings_salted_cap_is_exact(spark):
    # the salted two-phase top-k must equal the plain single-window
    # top-k on a corpus where many docs share a term
    from pyspark.sql import functions as F

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("hot "),
            # varying tf for the shared term
            F.array_join(
                F.array_repeat(F.lit("hot"), (F.col("id") % 7).cast("int")),
                " ",
            ),
            F.lit(" tail"),
        ).alias("text"),
    )
    a = build_postings(df, max_postings=5, n_salt=1).collect()
    b = build_postings(df, max_postings=5, n_salt=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_postings_validation(spark):
    with pytest.raises(ValueError):
        build_postings(_corpus(spark), max_postings=0)
    with pytest.raises(ValueError):
        build_postings(_corpus(spark), n_salt=0)
