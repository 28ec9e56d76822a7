"""Raw-sample series for the north rule's N->4N criterion.

Runs the same validate job alternately at local[LOW] and local[HIGH]
(fresh JVM each, identical cached input) and records each RAW pairing —
no best-of — so the distribution, not a cherry-picked peak, is the
evidence.  Appends every sample to BENCH/BASELINE.md and prints a
median summary.

Usage: python bench_scaling_series.py [--rows 8000000] [--samples 5]
       [--low 2] [--high 8]
KEEP THE BOX IDLE while it runs (see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import statistics

from bench_scaling import REPO, ensure_input, make_pyfiles_zip, run_once


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--salt-rows", type=int, default=1000)
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    input_dir = ensure_input(args.rows)
    zip_path = make_pyfiles_zip("/tmp/pynomaly_bench/pynomaly_spark.zip")

    # one discarded run to warm the OS page cache for the input parquet
    run_once(args.low, input_dir, zip_path, args.salt_rows)

    effs = []
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    for i in range(args.samples):
        load1 = os.getloadavg()[0]
        lo = run_once(args.low, input_dir, zip_path, args.salt_rows)
        hi = run_once(args.high, input_dir, zip_path, args.salt_rows)
        eff = (hi["files_per_sec"] / lo["files_per_sec"]) / (
            args.high / args.low
        )
        effs.append(eff)
        row = {
            "sample": i + 1,
            "low": lo["files_per_sec"],
            "high": hi["files_per_sec"],
            "eff": round(eff, 3),
            "load1_before": round(load1, 2),
        }
        print(json.dumps(row), flush=True)
        with open(md, "a") as fh:
            fh.write(
                f"| {datetime.datetime.utcnow().strftime('%Y-%m-%d %H:%M')} "
                f"| {args.rows} | local[{args.low}]->local[{args.high}] "
                f"| {lo['files_per_sec']} | {hi['files_per_sec']} "
                f"| {lo['wall_sec']} | {hi['wall_sec']} "
                f"| {round(eff, 3)} | {'YES' if eff >= 0.8 else 'NO'} |"
                f"{' <!-- ' + args.note + ' -->' if args.note else ''}\n"
            )

    summary = {
        "rows": args.rows,
        "pair": f"{args.low}->{args.high}",
        "samples": len(effs),
        "median_eff": round(statistics.median(effs), 3),
        "min": round(min(effs), 3),
        "max": round(max(effs), 3),
        "n_pass": sum(e >= 0.8 for e in effs),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
