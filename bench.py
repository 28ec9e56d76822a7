"""Per-round benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric", "value", "unit", "queries", "sf", ...}``.

Each query executes via the noop data source (full plan execution, no
driver collect), timed after a warm-up pass that initializes the JVM,
Arrow, and Python worker pools.  The north metric — validated files/sec
over the synthetic code table — is measured alongside (full constraint
suite + LoOP drift via run_suite).

The N-vs-4N scaling evidence lives in ``bench_scaling.py`` (spark-submit
at local[8] vs local[32]); this file is the quick per-round signal.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "doc_null_rate",
    "doc_length_quantiles",
    "lineitem_uniqueness",
    "orders_ri_orphans",
    "lineitem_pricing",
    "doc_dedup_exact",
    "doc_minhash",
    "doc_token_stats",
    "events_hourly",
    "ann_cosine_topk",
    "doc_drift_loop",
    "emb_drift_loop",
]

CODE_TABLE_ROWS = int(os.environ.get("BENCH_CODE_ROWS", "1000000"))


def _box_probe() -> dict:
    """Pre-run host-health telemetry embedded in the output JSON.

    Absolute wall-times on this sandbox swing 3-10x with hypervisor
    neighbor load (2026-08-18: a reboot landed the VM on a contended
    host — suite 31.9s vs the 11.6-12.3s quiet steady state, with zero
    local load).  ``numpy_gbps`` is the memory-bandwidth canary
    (healthy >= 9.5, degraded days measured 1.9-8.5); judge this run's
    numbers against these fields before comparing across rounds.  Cost
    ~1s; see tools/box_probe.py for the full probe.
    """
    out = {}
    try:
        out["load1"] = round(os.getloadavg()[0], 2)
    except Exception:
        pass
    try:
        import numpy as np

        x = np.random.rand(25_000_000)
        x.sum()  # touch
        t0 = time.perf_counter()
        for _ in range(4):
            x.sum()
        dt = (time.perf_counter() - t0) / 4
        out["numpy_gbps"] = round(25e6 * 8 / dt / 1e9, 2)
    except Exception:
        pass
    return out


def _noop_run(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _code_table_dir(spark) -> str:
    """Build (once) and cache the synthetic code table for the north metric."""
    from pynomaly_spark.datagen_spark import DATAGEN_VERSION

    cache = f"/tmp/pynomaly_bench/scode_v{DATAGEN_VERSION}_{CODE_TABLE_ROWS}"
    marker = f"{cache}/_DONE"
    if not os.path.exists(marker):
        from pynomaly_spark.datagen_spark import write_code_table_spark

        write_code_table_spark(spark, cache, CODE_TABLE_ROWS, seed=7)
        open(marker, "w").write("ok")
    return cache


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    box = _box_probe()  # pre-run conditions, before the JVM competes

    from pynomaly_spark.queries import QUERIES
    from pynomaly_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus)

    # warm-up: exercise scan + shuffle + Arrow UDF machinery once
    warm = QUERIES["doc_drift_loop"](spark, sf_dir)
    _noop_run(warm.limit(1000))
    _noop_run(QUERIES["lineitem_pricing"](spark, sf_dir))

    timings = {}
    for name in HEADLINE:
        df = QUERIES[name](spark, sf_dir)
        t0 = time.perf_counter()
        _noop_run(df)
        timings[name] = round(time.perf_counter() - t0, 4)

    # north metric: validated files/sec over the synthetic code table
    from pynomaly_spark.checks import (
        CheckSuite,
        Drift,
        RowInvariant,
        run_suite,
    )

    ct = _code_table_dir(spark)
    files = spark.read.parquet(f"{ct}/files.parquet")
    commits = spark.read.parquet(f"{ct}/commits.parquet")
    oracle = spark.read.parquet(f"{ct}/sha_oracle.parquet")
    # bench what we ship: the default suite IS the benchmarked config
    # (Drift.max_group_rows=1000 cache-resident sub-fits); BENCH_SALT_ROWS
    # remains an explicit experiment knob only
    suite = CheckSuite.default()
    if "BENCH_SALT_ROWS" in os.environ:
        suite.checks = [
            Drift(max_group_rows=int(os.environ["BENCH_SALT_ROWS"]))
            if isinstance(c, Drift)
            else c
            for c in suite.checks
        ]
    suite.checks.append(RowInvariant())
    n_files = files.count()
    stage = "/dev/shm/pynomaly-stage" if os.path.isdir("/dev/shm") else None
    if stage:
        os.makedirs(stage, exist_ok=True)
    # one-time JVM/Arrow/Python-worker/codegen initialization on a tiny
    # slice of the real input, BEFORE the clock starts — the exact
    # warm-up validate_job.py applies (and the same treatment the
    # headline queries get above); a production job amortizes this
    # fresh-JVM cost across runs.  Flagged in the output JSON.
    warm = run_suite(
        files.limit(2000), suite, commits=commits,
        sha_oracle=oracle, stage_dir=stage,
    )
    _noop_run(warm.unified())
    warm.unpersist()
    # MEDIAN of 3 measured runs: this sandbox's hypervisor stalls are
    # transient and enormous (measured 2026-08-19: back-to-back
    # identical runs of 112.0s then 15.8s on a quiet box) — a single
    # measured run is hostage to one stall landing mid-run, and a
    # best-of would overclaim; the median is the honest steady-state
    # estimator.  All raw samples ship in the JSON.
    suite_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = run_suite(
            files, suite, commits=commits, sha_oracle=oracle,
            stage_dir=stage,
        )
        # ONE fused action for both outputs (kind-tagged union):
        # run_suite pre-materializes the shared mid-frames, so this
        # single job reads hot caches — one driver sync instead of two
        _noop_run(res.unified())
        suite_runs.append(round(time.perf_counter() - t0, 4))
        try:
            res.unpersist()
        except Exception:
            pass
    validate_sec = sorted(suite_runs)[1]
    timings["validate_suite"] = round(validate_sec, 4)

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "validated_files_per_sec": round(n_files / validate_sec, 1),
        "code_table_rows": n_files,
        "cpus": cpus,
        "suite_warmup": True,
        "suite_runs": suite_runs,  # raw samples; validate_suite = median
        "box": box,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
