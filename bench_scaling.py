"""N-vs-4N scaling evidence (the north rule's two-cluster-size criterion).

No real cluster exists in this sandbox, so the same validate job runs via
``spark-submit --py-files`` at two parallelism levels — ``local[8]`` and
``local[32]`` — on the SAME input, and we report throughput at both plus
``efficiency = (throughput_32 / throughput_8) / 4`` (target >= 0.8).

Each run is a fresh JVM (true cold executor state); the input parquet is
pre-generated once so both runs read identical bytes.  Results append to
``BENCH/BASELINE.md``.

Usage: python bench_scaling.py [--rows 200000] [--repeats 1]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))


def make_pyfiles_zip(path: str) -> str:
    """Package pynomaly_spark for --py-files (the cluster deploy artifact)."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "pynomaly_spark")
        for root, _, names in os.walk(pkg):
            for n in names:
                if n.endswith(".py"):
                    full = os.path.join(root, n)
                    zf.write(full, os.path.relpath(full, REPO))
    return path


def ensure_input(rows: int) -> str:
    sys.path.insert(0, REPO)
    from pynomaly_spark.datagen_spark import DATAGEN_VERSION

    cache = f"/tmp/pynomaly_bench/code_v{DATAGEN_VERSION}_{rows}"
    if not os.path.exists(f"{cache}/_DONE"):
        # Datagen runs in a SUBPROCESS: an in-process SparkSession's
        # py4j gateway JVM survives spark.stop() for the lifetime of
        # THIS script (measured: a leftover datagen JVM idled at ~330%
        # CPU through the first sample's legs, poisoning both
        # measurements).  A child process guarantees the JVM dies
        # before the first measured leg starts.
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "from pynomaly_spark.session import get_spark\n"
            "spark = get_spark('scaling-datagen', cpus=32)\n"
            "rows = %d; cache = %r\n"
            "if rows > 500000:\n"
            "    from pynomaly_spark.datagen_spark import "
            "write_code_table_spark\n"
            "    write_code_table_spark(spark, cache, rows, seed=7)\n"
            "else:\n"
            "    from pynomaly_spark.datagen import CodeTableSpec, "
            "write_code_table\n"
            "    write_code_table(spark, cache, "
            "CodeTableSpec(n_rows=rows, seed=7))\n"
            "open(cache + '/_DONE', 'w').write('ok')\n"
            "spark.stop()\n" % (REPO, rows, cache)
        )
        subprocess.run(
            [sys.executable, "-c", code], check=True, timeout=1800
        )
    return cache


def run_once(cores: int, input_dir: str, zip_path: str, salt_rows: int) -> dict:
    env = dict(os.environ)
    env.update(
        OMP_NUM_THREADS="1",
        OPENBLAS_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
    )
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(shutil.which("pyspark") or sys.executable),
        "spark-submit",
    )
    os.makedirs("/dev/shm/pynomaly-spark-local", exist_ok=True)
    cmd = [
        spark_submit,
        "--master", f"local[{cores}]",
        "--conf", f"spark.sql.shuffle.partitions={cores}",
        "--conf", f"spark.default.parallelism={cores}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.driver.memory=16g",
        "--conf", "spark.ui.enabled=false",
        # sandbox virtual disk serializes concurrent shuffle writers;
        # tmpfs stands in for the striped NVMe a real cluster uses
        "--conf", "spark.local.dir=/dev/shm/pynomaly-spark-local",
        "--py-files", zip_path,
        os.path.join(REPO, "pynomaly_spark", "jobs", "validate_job.py"),
        "--input", input_dir,
        "--salt-rows", str(salt_rows),
        # verdict outputs on tmpfs: the sandbox virtual disk serializes
        # concurrent writers (same rationale as the shuffle dirs) — a
        # real cluster writes to a parallel DFS
        "--out", "/dev/shm/pynomaly-validate-out",
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env, timeout=1800
    )
    for line in out.stdout.splitlines()[::-1]:
        line = line.strip()
        if line.startswith("{") and '"files_per_sec"' in line:
            return json.loads(line)
    raise RuntimeError(
        f"no result line from local[{cores}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--salt-rows", type=int, default=1000)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    input_dir = ensure_input(args.rows)
    zip_path = make_pyfiles_zip("/tmp/pynomaly_bench/pynomaly_spark.zip")

    def best(cores: int) -> dict:
        runs = [
            run_once(cores, input_dir, zip_path, args.salt_rows)
            for _ in range(args.repeats)
        ]
        return max(runs, key=lambda r: r["files_per_sec"])

    # warm OS page cache with one discarded low-core run, then measure
    run_once(args.low, input_dir, zip_path, args.salt_rows)
    lo = best(args.low)
    hi = best(args.high)
    eff = (hi["files_per_sec"] / lo["files_per_sec"]) / (args.high / args.low)

    result = {
        "rows": args.rows,
        f"files_per_sec_local{args.low}": lo["files_per_sec"],
        f"files_per_sec_local{args.high}": hi["files_per_sec"],
        f"wall_sec_local{args.low}": lo["wall_sec"],
        f"wall_sec_local{args.high}": hi["wall_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "passed": eff >= 0.8,
    }
    print(json.dumps(result))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    is_new = not os.path.exists(md)
    with open(md, "a") as fh:
        if is_new:
            fh.write(
                "# BENCH/BASELINE — north-metric scaling evidence\n\n"
                "Same validate job (full constraint suite + salted LoOP "
                "drift), same input parquet, two parallelism levels via "
                "`spark-submit --py-files` in fresh JVMs. "
                "`efficiency = (thr_high / thr_low) / (cores_high / cores_low)`."
                " See SCALING_ANALYSIS.md for the hardware-ceiling study.\n\n"
                "| date (UTC) | rows | pair | low files/s | high files/s | "
                "wall low (s) | wall high (s) | efficiency | pass (>=0.8) |\n"
                "|---|---|---|---|---|---|---|---|---|\n"
            )
        fh.write(
            f"| {datetime.datetime.utcnow().strftime('%Y-%m-%d %H:%M')} "
            f"| {args.rows} | local[{args.low}]->local[{args.high}] "
            f"| {lo['files_per_sec']} | {hi['files_per_sec']} "
            f"| {lo['wall_sec']} | {hi['wall_sec']} "
            f"| {result['scaling_efficiency']} | {'YES' if result['passed'] else 'NO'} |\n"
        )


if __name__ == "__main__":
    main()
