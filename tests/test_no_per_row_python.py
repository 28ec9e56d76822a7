"""Engine-wide gate: no per-row Python in analytic hot paths.

The north rule requires all heavy math in vectorized pandas/Arrow UDFs or
native Catalyst expressions.  This gate greps the engine source for the
slow-path constructs:

* ``udf(`` / ``@udf`` — row-at-a-time Python UDFs (forbidden);
* ``.rdd`` — RDD drops out of Catalyst (forbidden);
* ``.collect()`` — driver-side loops over data (allowed only in
  documented control-plane spots: tiny partition lists, plan-time
  sampling, never row data).
"""

import os
import re

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "pynomaly_spark")

# control-plane collect()s that are explicitly allowed (file, reason)
COLLECT_ALLOWLIST = {
    "checkpoint.py",  # distinct partition ids (thousands, not rows)
    "knn.py",  # plan-time cell-size sampling (bounded 2000 rows)
    "similarity.py",  # plan-time IVF centroid training sample (bounded)
    "checks.py",  # partition universe (one row per partition, not rows)
}


def _source_files():
    for root, _, names in os.walk(PKG):
        for n in names:
            if n.endswith(".py"):
                yield os.path.join(root, n)


def test_no_row_at_a_time_udf():
    bad = []
    for f in _source_files():
        src = open(f).read()
        # pandas_udf / mapInPandas / applyInPandas are the APPROVED
        # vectorized paths; bare udf( is the row-at-a-time trap
        for m in re.finditer(r"(?<![\w.])udf\(", src):
            ctx = src[max(0, m.start() - 20) : m.start()]
            if "pandas_" not in ctx:
                bad.append((f, m.start()))
        if "@udf" in src:
            bad.append((f, "@udf"))
    assert not bad, bad


def test_no_rdd_usage():
    bad = [
        f
        for f in _source_files()
        if re.search(r"\.rdd\b", open(f).read())
    ]
    assert not bad, bad


def test_collect_only_in_control_plane():
    bad = []
    for f in _source_files():
        if os.path.basename(f) in COLLECT_ALLOWLIST:
            continue
        src = open(f).read()
        if ".collect()" in src:
            bad.append(f)
    assert not bad, bad
