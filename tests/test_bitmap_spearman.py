"""presence_bitmap and spearman_rho (pynomaly_spark.profiling)."""

import pytest

from pynomaly_spark.profiling import presence_bitmap, spearman_rho


def test_presence_bitmap_mask_and_counts(spark):
    df = spark.createDataFrame(
        [("a", 0), ("a", 3), ("a", 3), ("b", 62)], "k string, s long"
    )
    out = {
        r["k"]: r.asDict()
        for r in presence_bitmap(df, ["k"], "s", n_slots=63).collect()
    }
    assert out["a"]["mask"] == (1 << 0) | (1 << 3)
    assert out["a"]["slots_active"] == 2 and out["a"]["n_rows"] == 3
    assert out["b"]["mask"] == 1 << 62 and out["b"]["slots_active"] == 1


def test_presence_bitmap_guards(spark):
    df = spark.createDataFrame([("a", 24)], "k string, s long")
    with pytest.raises(Exception, match="slot outside"):
        presence_bitmap(df, ["k"], "s", n_slots=24).collect()
    nulls = spark.createDataFrame([("a", None)], "k string, s long")
    with pytest.raises(Exception, match="slot outside"):
        presence_bitmap(nulls, ["k"], "s", n_slots=24).collect()
    with pytest.raises(ValueError, match="n_slots"):
        presence_bitmap(df, ["k"], "s", n_slots=64)
    with pytest.raises(ValueError, match="key_cols"):
        presence_bitmap(df, [], "s", n_slots=24)
    with pytest.raises(ValueError, match="unknown column"):
        presence_bitmap(df, ["k"], "nope", n_slots=24)


def _rho(spark, rows):
    df = spark.createDataFrame(rows, "x long, y long")
    return spearman_rho(df, "x", "y").collect()[0].asDict()


def test_spearman_perfect_and_inverse(spark):
    assert _rho(spark, [(1, 10), (2, 20), (3, 30)])["rho_6dp"] == 1000000
    assert _rho(spark, [(1, 30), (2, 20), (3, 10)])["rho_6dp"] == -1000000


def test_spearman_midrank_ties_hand_value(spark):
    # x = [1,1,2] -> doubled midranks [3,3,6]; y = [5,7,9] -> [2,4,6].
    # rho = 18/sqrt(18*24) = 0.8660254 -> floor at 6 dp = 866025.
    out = _rho(spark, [(1, 5), (1, 7), (2, 9)])
    assert out["rho_6dp"] == 866025
    assert out["n"] == 3
    assert out["n_distinct_x"] == 2 and out["n_distinct_y"] == 3


def test_spearman_constant_column_is_null(spark):
    out = _rho(spark, [(1, 5), (1, 7), (1, 9)])
    assert out["rho_6dp"] is None
    with pytest.raises(ValueError, match="unknown column"):
        spearman_rho(
            spark.createDataFrame([(1, 2)], "x long, y long"), "x", "z"
        )
