"""Cross-engine type hygiene for the oracle twins.

The driver's correctness gate hashes RENDERED values, so a DuckDB
column whose logical type differs from Spark's (the classic case: an
un-cast window ``sum()`` over BIGINT is HUGEINT, which pandas renders
as float64 -> "5.0" vs Spark's long "5") hash-mismatches even when the
numbers are identical.  Round 4 shipped exactly this bug in
``events_sessions``.  This test binds EVERY oracle twin in DuckDB and
asserts no HUGEINT/UHUGEINT ever reaches the output schema.

No Spark needed — DuckDB binding only, so this runs in ~seconds.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_compare import TABLES  # noqa: E402

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")

BANNED = ("HUGEINT", "UHUGEINT")


def _oracles():
    import __spark_entry__ as entry_mod

    return entry_mod.oracle_sql()


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_no_hugeint_in_any_oracle_output():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    offenders = {}
    for name, sql in _oracles().items():
        rel = con.sql(sql)
        bad = [
            f"{col}:{typ}"
            for col, typ in zip(rel.columns, map(str, rel.types))
            if any(b in str(typ).upper() for b in BANNED)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle twins emit HUGEINT columns (pandas renders these as "
        f"float64 and the driver hash diverges from Spark): {offenders} "
        "— wrap each in CAST(... AS BIGINT)"
    )
