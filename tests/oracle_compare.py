"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry through Spark AND its
``oracle_sql()`` twin through DuckDB on the same parquet, normalizes
(column-name sort, row sort, float rounding), and diffs values.

Usage: python tests/oracle_compare.py [sf_dir]   (default sf0.001)
Also importable by pytest (``compare_all``).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].map(
                lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else round(float(v), 9)
            )
        elif "int" in str(df[c].dtype).lower():
            df[c] = df[c].astype("int64", errors="ignore")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _render_cell(v) -> str:
    """Driver-style rendering: the gate hashes each value AS RENDERED,
    so an int64 ``5`` and a float64 ``5.0`` are different even though a
    tolerant numeric compare treats them as equal (that asymmetry is
    exactly how the round-4 ``events_sessions`` HUGEINT bug shipped —
    the DuckDB window ``sum()`` arrived as float64 and hashed "5.0")."""
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "\\N"
        return repr(v)
    return str(v)


def _rendered(df: pd.DataFrame) -> list:
    return [
        "\x1f".join(_render_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]


def compare_all(spark, sf_dir: str, names=None):
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        spark_df = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            results[name] = {
                "mode": "rows_only",
                "rows": len(spark_df),
                "ok": len(spark_df) >= 0,
            }
            continue
        duck_df = con.sql(oracles[name]).df()
        a, b = _normalize(spark_df), _normalize(duck_df)
        ok = True
        detail = ""
        if list(a.columns) != list(b.columns):
            ok, detail = False, f"columns {list(a.columns)} vs {list(b.columns)}"
        elif len(a) != len(b):
            ok, detail = False, f"rowcount {len(a)} vs {len(b)}"
        else:
            try:
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=False, atol=1e-9, rtol=1e-9
                )
            except AssertionError as e:
                ok, detail = False, str(e).split("\n")[0][:300]
            if ok:
                # Driver-strictness pass: compare RENDERED values the way
                # the gate hashes them (type/rendering divergences such as
                # int-vs-float are invisible to the tolerant compare).
                ra, rb = _rendered(a), _rendered(b)
                if ra != rb:
                    bad_i = next(i for i, (x, y) in enumerate(zip(ra, rb)) if x != y)
                    ok = False
                    detail = (
                        f"rendered-value mismatch (type/format) at row {bad_i}: "
                        f"spark={ra[bad_i][:120]!r} oracle={rb[bad_i][:120]!r}"
                    )
        results[name] = {"mode": "oracle", "rows": len(a), "ok": ok, "detail": detail}
    return results


if __name__ == "__main__":
    from pynomaly_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("oracle-compare", cpus=4)
    res = compare_all(spark, sf)
    bad = 0
    for name, r in sorted(res.items()):
        status = "OK " if r["ok"] else "FAIL"
        bad += 0 if r["ok"] else 1
        print(f"{status} {name:26s} mode={r['mode']:9s} rows={r['rows']}"
              + (f" {r.get('detail','')}" if not r["ok"] else ""))
    print(f"\n{len(res) - bad}/{len(res)} queries match")
    sys.exit(1 if bad else 0)
