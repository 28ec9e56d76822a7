"""Extra benchmarks for the optimization rounds (bench.py is FROZEN).

Noop-sink isolation per query (guide §1.4) with job labels (§1.5) and
optional plan capture.  Usage:

    python bench_extra.py [--sf-dir DIR] [--repeat N] [--plans OUTDIR]
                          [--suite] [query ...]

Defaults to the bench.py HEADLINE list at $SPARK_GRAFT_SF_DIR (or
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints one JSON line
per query: {"query", "runs": [...], "median"} plus a box probe, and with
--plans writes ``<outdir>/<query>.txt`` containing
``explain("formatted")`` output.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--suite", action="store_true",
                    help="also time run_suite over the code table")
    args = ap.parse_args()

    from bench import HEADLINE, _box_probe, _noop_run

    names = args.queries or list(HEADLINE)
    box = _box_probe()

    from pynomaly_spark.queries import QUERIES
    from pynomaly_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    spark = get_spark("bench_extra", cpus=cpus)
    sc = spark.sparkContext

    # warm-up identical in spirit to bench.py
    _noop_run(QUERIES["doc_drift_loop"](spark, args.sf_dir).limit(1000))
    _noop_run(QUERIES["lineitem_pricing"](spark, args.sf_dir))

    print(json.dumps({"box": box, "sf_dir": args.sf_dir, "cpus": cpus}))
    for name in names:
        df = QUERIES[name](spark, args.sf_dir)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")
                ))
        runs = []
        for i in range(args.repeat):
            sc.setJobDescription(f"bench_extra:{name}#{i}")
            df = QUERIES[name](spark, args.sf_dir)
            t0 = time.perf_counter()
            _noop_run(df)
            runs.append(round(time.perf_counter() - t0, 4))
        sc.setJobDescription(None)
        print(json.dumps({
            "query": name,
            "runs": runs,
            "median": sorted(runs)[len(runs) // 2],
        }), flush=True)

    if args.suite:
        from bench import CODE_TABLE_ROWS, _code_table_dir
        from pynomaly_spark.checks import (
            CheckSuite, RowInvariant, run_suite,
        )

        ct = _code_table_dir(spark)
        files = spark.read.parquet(f"{ct}/files.parquet")
        commits = spark.read.parquet(f"{ct}/commits.parquet")
        oracle = spark.read.parquet(f"{ct}/sha_oracle.parquet")
        suite = CheckSuite.default()
        suite.checks.append(RowInvariant())
        stage = "/dev/shm/pynomaly-stage" if os.path.isdir("/dev/shm") else None
        if stage:
            os.makedirs(stage, exist_ok=True)
        warm = run_suite(files.limit(2000), suite, commits=commits,
                         sha_oracle=oracle, stage_dir=stage)
        _noop_run(warm.unified())
        warm.unpersist()
        runs = []
        for i in range(args.repeat):
            sc.setJobDescription(f"bench_extra:validate_suite#{i}")
            t0 = time.perf_counter()
            res = run_suite(files, suite, commits=commits,
                            sha_oracle=oracle, stage_dir=stage)
            _noop_run(res.unified())
            runs.append(round(time.perf_counter() - t0, 4))
            try:
                res.unpersist()
            except Exception:
                pass
        sc.setJobDescription(None)
        print(json.dumps({
            "query": "validate_suite",
            "runs": runs,
            "median": sorted(runs)[len(runs) // 2],
            "rows": CODE_TABLE_ROWS,
        }), flush=True)


if __name__ == "__main__":
    main()
