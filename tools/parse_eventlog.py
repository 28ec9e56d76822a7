"""Parse a Spark event log into a per-stage cost table (round-6 scratch).

Usage: python tools/parse_eventlog.py <eventlog-file-or-dir> [--top 30]
Prints stages sorted by wall time with executor run time, input bytes,
shuffle read/write bytes, task count, and the stage name line.
"""
from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    path = args.path
    if os.path.isdir(path):
        cands = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith(".")
        ]
        path = max(cands, key=os.path.getmtime)

    stages = {}
    task_metrics = {}
    for line in open(path):
        try:
            ev = json.loads(line)
        except Exception:
            continue
        et = ev.get("Event")
        if et == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            stages[sid] = {
                "name": si.get("Stage Name", "?"),
                "wall_s": (comp - sub) / 1000.0 if sub and comp else None,
                "tasks": si.get("Number of Tasks"),
            }
        elif et == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            tm = ev.get("Task Metrics") or {}
            agg = task_metrics.setdefault(
                sid,
                {"run_s": 0.0, "input_mb": 0.0, "sr_mb": 0.0, "sw_mb": 0.0,
                 "fetch_s": 0.0, "n": 0},
            )
            agg["run_s"] += tm.get("Executor Run Time", 0) / 1000.0
            agg["input_mb"] += (
                tm.get("Input Metrics", {}).get("Bytes Read", 0) / 1e6
            )
            agg["sr_mb"] += (
                tm.get("Shuffle Read Metrics", {}).get("Remote Bytes Read", 0)
                + tm.get("Shuffle Read Metrics", {}).get("Local Bytes Read", 0)
            ) / 1e6
            agg["sw_mb"] += (
                tm.get("Shuffle Write Metrics", {}).get(
                    "Shuffle Bytes Written", 0
                )
                / 1e6
            )
            agg["fetch_s"] += (
                tm.get("Shuffle Read Metrics", {}).get("Fetch Wait Time", 0)
                / 1000.0
            )
            agg["n"] += 1

    rows = []
    for sid, s in stages.items():
        m = task_metrics.get(sid, {})
        rows.append((s.get("wall_s") or 0.0, sid, s, m))
    rows.sort(reverse=True)
    print(
        f"{'wall_s':>7} {'stage':>5} {'tasks':>5} {'run_s':>7} "
        f"{'in_MB':>8} {'srd_MB':>8} {'swr_MB':>8}  name"
    )
    for wall, sid, s, m in rows[: args.top]:
        print(
            f"{wall:7.2f} {sid:5d} {s['tasks']:5d} "
            f"{m.get('run_s', 0):7.1f} {m.get('input_mb', 0):8.1f} "
            f"{m.get('sr_mb', 0):8.1f} {m.get('sw_mb', 0):8.1f}  "
            f"{s['name'][:90]}"
        )


if __name__ == "__main__":
    main()
