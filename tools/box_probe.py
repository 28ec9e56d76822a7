"""Box-health probe — detects hypervisor host changes / neighbor load.

Absolute throughput on this sandbox moved 3-10x between sessions (the
2026-08-18 04:47 UTC reboot landed the VM on a visibly slower/contended
host: local[2] validate legs fell from the 34-52k files/s band of 45+
historical samples to 12-15k with zero local load).  Every timing
comparison across sessions must first compare THIS probe's output to
the reference values recorded below; scaling-series samples taken while
the probe is degraded are not comparable to quiet-host samples.

Usage: python tools/box_probe.py   # prints one JSON line

Reference values (degraded host, 2026-08-18 06:55 UTC, load < 0.1):
  alu_s ~1.8  sha_mbps ~60  numpy_gbps ~5.0  alu8_speedup ~?
Healthy-host expectation (inferred from round-3/4 series): alu_s well
under 1.0, numpy_gbps >= 10.
"""

import hashlib
import json
import multiprocessing as mp
import time


def alu(n: int = 10_000_000) -> float:
    t = time.time()
    s = 0
    for i in range(n):
        s += i * i
    return time.time() - t


def sha(n: int = 200_000) -> float:
    x = b"x" * 64
    t = time.time()
    for _ in range(n):
        x = hashlib.sha256(x).digest()[:64]
    dt = time.time() - t
    return n * 64 / dt / 1e6  # MB/s hashed


def numpy_bw() -> float:
    import numpy as np

    x = np.random.rand(50_000_000)
    x.sum()  # touch
    t = time.time()
    for _ in range(4):
        x.sum()
    dt = (time.time() - t) / 4
    return 50e6 * 8 / dt / 1e9  # GB/s


def _alu_worker(q):
    q.put(alu(5_000_000))


def alu_par(k: int = 8) -> float:
    """k-way parallel ALU: wall time of k concurrent half-size loops.
    speedup = (k * t_half) / wall where t_half = alu(5M) single."""
    t_half = alu(5_000_000)
    q = mp.Queue()
    ps = [mp.Process(target=_alu_worker, args=(q,)) for _ in range(k)]
    t = time.time()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    wall = time.time() - t
    return k * t_half / wall


if __name__ == "__main__":
    import os

    print(
        json.dumps(
            {
                "ts": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
                "load1": os.getloadavg()[0],
                "alu_s": round(alu(), 3),
                "sha_mbps": round(sha(), 1),
                "numpy_gbps": round(numpy_bw(), 2),
                "alu8_speedup": round(alu_par(8), 2),
            }
        )
    )
