"""profiling.cms_build / cms_estimate (count-min sketch).

Cross-engine value parity lives in the oracle gate (events_cms); these
tests pin the sketch's defining properties on hand-built frames: the
never-undercount guarantee, exactness when the sketch is collision-free,
mergeability (union + re-aggregate == rebuild), cell budget, null
handling, absent-probe semantics, and the O(sketch) shuffle shape.
"""

import random

import pytest
from pyspark.sql import functions as F

from pynomaly_spark.profiling import cms_build, cms_estimate


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def test_cms_never_undercounts_and_exact_when_wide(spark):
    rng = random.Random(3)
    keys = [f"key{rng.randrange(40)}" for _ in range(500)]
    exact = {}
    for k in keys:
        exact[k] = exact.get(k, 0) + 1
    df = _keys_df(spark, keys)
    # narrow sketch: collisions guaranteed (40 keys, 16 buckets)
    sk = cms_build(df, "k", depth=3, width=16)
    probes = df.distinct()
    est = {
        r["k"]: r["cms_n"]
        for r in cms_estimate(sk, probes, "k", depth=3, width=16).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    assert any(est[k] > exact[k] for k in exact)  # collisions happened
    # wide sketch: 40 keys across 4x4096 cells -> almost surely exact
    sk2 = cms_build(df, "k", depth=4, width=4096)
    est2 = {
        r["k"]: r["cms_n"]
        for r in cms_estimate(sk2, probes, "k", depth=4, width=4096).collect()
    }
    assert est2 == exact


def test_cms_mergeable(spark):
    a = _keys_df(spark, ["x"] * 5 + ["y"] * 2)
    b = _keys_df(spark, ["x"] * 3 + ["z"] * 4)
    merged = (
        cms_build(a, "k", 2, 8)
        .union(cms_build(b, "k", 2, 8))
        .groupBy("row", "bucket")
        .agg(F.sum("cell_n").alias("cell_n"))
    )
    rebuilt = cms_build(a.union(b), "k", 2, 8)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


def test_cms_cell_budget_and_nulls(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), (None,)] * 10, "k string"
    )
    sk = cms_build(df, "k", depth=4, width=8)
    cells = sk.collect()
    assert len(cells) <= 4 * 8
    assert {r["row"] for r in cells} <= set(range(4))
    assert all(0 <= r["bucket"] < 8 for r in cells)
    # null keys dropped: total mass = depth * non-null rows
    assert sum(r["cell_n"] for r in cells) == 4 * 20


def test_cms_absent_probe_reads_cells_not_join_miss(spark):
    df = _keys_df(spark, ["a"] * 7)
    sk = cms_build(df, "k", depth=2, width=4)
    probes = _keys_df(spark, ["a", "never-seen"])
    est = {
        r["k"]: r["cms_n"]
        for r in cms_estimate(sk, probes, "k", depth=2, width=4).collect()
    }
    assert est["a"] == 7
    # CMS semantics: an absent key reads whatever is in its cells
    # (0 if its cells are empty, 'a's mass if it collides) — never NULL
    assert est["never-seen"] in (0, 7)


def test_cms_validates_shape(spark):
    df = _keys_df(spark, ["a"])
    with pytest.raises(ValueError, match="bad shape"):
        cms_build(df, "k", depth=0, width=8)
    with pytest.raises(ValueError, match="unknown column"):
        cms_build(df, "nope")


def test_cms_shuffle_carries_cells_not_rows(spark):
    # the aggregate must combine map-side: the plan is a two-phase
    # HashAggregate around ONE exchange keyed by (row, bucket)
    df = _keys_df(spark, ["a", "b"] * 50)
    plan = (
        cms_build(df, "k", 4, 16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan


# --------------------------------------------------------------------------
# benford_profile
# --------------------------------------------------------------------------

def test_benford_digit_extraction_and_shares(spark):
    import math

    from pynomaly_spark.profiling import benford_profile

    rows = [
        ("g", 1.23),    # 123 cents -> digit 1
        ("g", 0.19),    # 19 -> 1
        ("g", 95.0),    # 9500 -> 9
        ("g", -5.0),    # dropped: negative
        ("g", 0.0),     # dropped: zero cents
        ("g", None),    # dropped
        ("h", 2.22),    # 222 -> 2
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = {
        (r["event_type"], r["digit"]): r
        for r in benford_profile(df, ["event_type"], "value").collect()
    }
    assert set(out) == {("g", 1), ("g", 9), ("h", 2)}
    g1 = out[("g", 1)]
    assert g1["n"] == 2 and g1["share6"] == round(2 / 3, 6)
    assert g1["benford6"] == round(math.log10(2), 6)
    assert g1["dev6"] == round(g1["share6"] - g1["benford6"], 6)
    with pytest.raises(ValueError, match="unknown columns"):
        benford_profile(df, ["nope"], "value")


# --------------------------------------------------------------------------
# cms_join_cardinality
# --------------------------------------------------------------------------

def test_join_cardinality_upper_bound_and_tightness(spark):
    import random

    from pynomaly_spark.profiling import cms_build, cms_join_cardinality

    rng = random.Random(13)
    l = _keys_df(spark, [f"k{rng.randrange(30)}" for _ in range(300)])
    r = _keys_df(spark, [f"k{rng.randrange(30)}" for _ in range(200)])
    lc, rc = {}, {}
    for row in l.collect():
        lc[row["k"]] = lc.get(row["k"], 0) + 1
    for row in r.collect():
        rc[row["k"]] = rc.get(row["k"], 0) + 1
    exact = sum(lc[k] * rc.get(k, 0) for k in lc)

    def est(width):
        return cms_join_cardinality(
            cms_build(l, "k", 4, width),
            cms_build(r, "k", 4, width),
            4,
            width,
        ).collect()[0]

    narrow = est(16)
    wide = est(4096)
    assert narrow["n_rows_l"] == 300 and narrow["n_rows_r"] == 200
    # upper bound always; collisions inflate the narrow sketch
    assert narrow["est_join_rows"] >= exact
    assert wide["est_join_rows"] >= exact
    # a wide sketch is (weakly) tighter and here exact: 30 keys in
    # 4x4096 cells collide with negligible probability
    assert wide["est_join_rows"] <= narrow["est_join_rows"]
    assert wide["est_join_rows"] == exact


def test_join_cardinality_disjoint_keys(spark):
    from pynomaly_spark.profiling import cms_build, cms_join_cardinality

    l = _keys_df(spark, [f"a{i}" for i in range(10)])
    r = _keys_df(spark, [f"b{i}" for i in range(10)])
    got = cms_join_cardinality(
        cms_build(l, "k", 4, 4096), cms_build(r, "k", 4, 4096), 4, 4096
    ).collect()[0]
    assert got["est_join_rows"] == 0
