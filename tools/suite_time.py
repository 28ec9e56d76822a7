"""Suite phase-timing harness (round-6 scratch; bench.py stays frozen).

Runs the exact bench.py validate_suite workload — same 1M-row code
table, same CheckSuite.default() + RowInvariant, same stage_dir and
warm-up — with PYNOMALY_SUITE_TIMINGS enabled, printing per-phase marks
and per-run wall times.  Usage:

    python tools/suite_time.py [--runs 3] [--rows 1000000]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PYNOMALY_SUITE_TIMINGS", "1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--rows", type=int, default=1_000_000)
    args = ap.parse_args()

    os.environ.setdefault("BENCH_CODE_ROWS", str(args.rows))
    from bench import CODE_TABLE_ROWS, _box_probe, _code_table_dir, _noop_run
    from pynomaly_spark.checks import CheckSuite, RowInvariant, run_suite
    from pynomaly_spark.session import get_spark

    print("box:", _box_probe(), file=sys.stderr)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    extra = {"spark.ui.showConsoleProgress": "false"}
    evdir = os.environ.get("SUITE_TIME_EVENTLOG")
    if evdir:
        os.makedirs(evdir, exist_ok=True)
        extra = {"spark.eventLog.enabled": "true", "spark.eventLog.dir": evdir}
    spark = get_spark("suite-time", cpus=cpus, extra_conf=extra)
    ct = _code_table_dir(spark)
    files = spark.read.parquet(f"{ct}/files.parquet")
    commits = spark.read.parquet(f"{ct}/commits.parquet")
    oracle = spark.read.parquet(f"{ct}/sha_oracle.parquet")
    suite = CheckSuite.default()
    suite.checks.append(RowInvariant())
    stage = "/dev/shm/pynomaly-stage" if os.path.isdir("/dev/shm") else None
    if stage:
        os.makedirs(stage, exist_ok=True)

    warm = run_suite(
        files.limit(2000), suite, commits=commits, sha_oracle=oracle,
        stage_dir=stage,
    )
    _noop_run(warm.unified())
    warm.unpersist()

    runs = []
    for i in range(args.runs):
        print(f"--- run {i} ---", file=sys.stderr)
        t0 = time.perf_counter()
        res = run_suite(
            files, suite, commits=commits, sha_oracle=oracle,
            stage_dir=stage,
        )
        _noop_run(res.unified())
        dt = time.perf_counter() - t0
        runs.append(round(dt, 3))
        print(f"run {i}: {dt:.3f}s", file=sys.stderr)
        try:
            res.unpersist()
        except Exception:
            pass
    print({"rows": CODE_TABLE_ROWS, "runs": runs,
           "median": sorted(runs)[len(runs) // 2]})


if __name__ == "__main__":
    main()
