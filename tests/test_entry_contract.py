"""Driver-contract replica: entry() smoke + oracle parity at sf0.001.

(The driver itself runs the oracle gate at sf0.01; sf0.001 keeps the
suite fast.  ``python tests/oracle_compare.py /root/testdata/sf0.01``
runs the full-scale version.)
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"partition_id", "check_name", "metric", "value", "passed"} <= cols


def test_queries_and_oracles_line_up():
    import __spark_entry__ as mod

    q = mod.queries()
    o = mod.oracle_sql()
    assert set(o) <= set(q)
    # rows-only entries are the documented non-SQL-expressible ops:
    # the erf map of the LoOP kernel (all prior stages hash-verified via
    # emb_loop_stages), banded xxhash64 LSH bucketing, and binary codec
    # work.  Round 3 flipped doc_simhash / emb_ann_lsh / emb_ann_ivf to
    # oracle-checked (md5 twin + injected plane/centroid literals) and
    # added the oracle-checked emb_ann_recall gate.
    rows_only = set(q) - set(o)
    assert rows_only == {
        "doc_drift_loop", "emb_drift_loop",
        "doc_media_features", "doc_media_wav",
    }


def test_oracle_parity_all(spark):
    from tests.oracle_compare import compare_all

    res = compare_all(spark, SF)
    failures = {k: v for k, v in res.items() if not v["ok"]}
    assert not failures, failures
