"""2->8 work-only decomposition: what does THIS HARDWARE scale 2->8?

The north rule's N->4N criterion is about the ENGINE's plan, but the
observed 2->8 suite efficiency is the product of (plan scaling) x
(hardware scaling of the instruction mix).  This tool measures the
second factor directly: each kernel class runs as K independent
worker PROCESSES (no shared Python state, like executor threads in
separate task slots) at K=2 and K=8, and reports

    eff(kernel) = (throughput_8 / throughput_2) / 4

A plan defect depresses the SUITE below these hardware ceilings; bus
saturation shows up as eff(numpy)/eff(io) << eff(alu) ~ 1.0 while the
suite lands between them, weighted by its phase mix.

Kernels (matched to the suite's measured hot phases):
  alu    — pure-Python integer loop (per-core private: the ceiling)
  sha    — hashlib.sha256 chain (digest phases: sha invariant, md5
           sampling keys; mostly register/L1-bound)
  numpy  — 400 MB float64 reduction per worker (drift kernel / Arrow
           batches; DRAM-bandwidth-bound)
  regex  — token-split + findall over a 20 MB text corpus per worker
           (textops/tokenizers; mixed L2/DRAM)
  io     — write+read 256 MB to spark.local.dir's tmpfs per worker
           (shuffle spill path; pure memory-bus traffic)

Usage: python tools/scaling_decomp.py [--json out.json]
Prints one JSON line; KEEP THE BOX IDLE (same protocol as
bench_scaling_series.py).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import os
import re
import tempfile
import time


def k_alu() -> float:
    s = 0
    for i in range(8_000_000):
        s += i * i
    return float(s % 97)


def k_sha() -> float:
    x = b"x" * 64
    for _ in range(150_000):
        x = hashlib.sha256(x).digest()
    return float(x[0])


def k_numpy() -> float:
    import numpy as np

    x = np.empty(50_000_000, dtype=np.float64)
    x.fill(1.0)
    acc = 0.0
    for _ in range(6):
        acc += float(x.sum())
    return acc


_WORDS = None


def k_regex() -> float:
    global _WORDS
    text = ("the quick brown fox jumps over the lazy dog " * 500_000)[
        : 20_000_000
    ]
    n = 0
    for _ in range(2):
        n += len(re.findall(r"[a-z]+", text))
    return float(n)


def k_io() -> float:
    d = os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm")
    blob = b"\xab" * (32 * 1024 * 1024)
    total = 0
    with tempfile.NamedTemporaryFile(dir=d) as fh:
        for _ in range(8):
            fh.write(blob)
        fh.flush()
        fh.seek(0)
        while True:
            b = fh.read(32 * 1024 * 1024)
            if not b:
                break
            total += len(b)
    return float(total)


KERNELS = {
    "alu": k_alu,
    "sha": k_sha,
    "numpy": k_numpy,
    "regex": k_regex,
    "io": k_io,
}


def _worker(fn, q):
    t = time.time()
    fn()
    q.put(time.time() - t)


def run_k(fn, k: int) -> float:
    """Aggregate throughput (work-units/sec) of k concurrent processes,
    median of 3 repeats."""
    rates = []
    for _ in range(3):
        q = mp.Queue()
        ps = [mp.Process(target=_worker, args=(fn, q)) for _ in range(k)]
        t = time.time()
        for p in ps:
            p.start()
        for p in ps:
            p.join()
        wall = time.time() - t
        rates.append(k / wall)
    rates.sort()
    return rates[1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    args = ap.parse_args()

    out = {
        "ts": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
        "load1": os.getloadavg()[0],
        "low": args.low,
        "high": args.high,
    }
    ratio = args.high / args.low
    for name, fn in KERNELS.items():
        lo = run_k(fn, args.low)
        hi = run_k(fn, args.high)
        out[name] = {
            "tp_low": round(lo, 4),
            "tp_high": round(hi, 4),
            "eff": round(hi / lo / ratio, 3),
        }
    line = json.dumps(out)
    print(line)
    if args.json:
        with open(args.json, "a") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
