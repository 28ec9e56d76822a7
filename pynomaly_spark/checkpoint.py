"""Per-partition resumable verdict checkpoints with lineage.

The reference has no persistence; ``fit()`` state lives on the object
(SURVEY.md §1).  A 10^12-row validation job must survive preemption, so
the engine commits verdicts per partition:

Layout under ``ckpt_dir``::

    metrics/partition=<id>/part-*.parquet      (atomic: write tmp, rename)
    violations/partition=<id>/part-*.parquet
    manifest/<id>.json                         (commit record + lineage)

A partition is COMMITTED iff its manifest exists; manifests are written
last, after both parquet payloads, so a crash mid-write leaves at most an
uncommitted orphan directory that the next run overwrites.  Lineage in
each manifest: input snapshot id, check-suite hash, row count, wall time,
engine version — enough to audit which code/config produced a verdict.

``resume`` = anti-join the partition list against committed manifests
(driver-side set; partitions number in the thousands, not billions) and
run the suite only on the remainder.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import __version__
from .checks import CheckSuite, SuiteResult, run_suite

__all__ = ["CheckpointManager", "validate_resumable"]


def _safe(pid: str) -> str:
    return "".join(c if c.isalnum() or c in "=_-." else "_" for c in pid)


@dataclass
class CheckpointManager:
    ckpt_dir: str

    def _manifest_dir(self) -> str:
        return os.path.join(self.ckpt_dir, "manifest")

    def committed_partitions(self) -> List[str]:
        mdir = self._manifest_dir()
        if not os.path.isdir(mdir):
            return []
        out = []
        for f in os.listdir(mdir):
            if f.endswith(".json"):
                with open(os.path.join(mdir, f)) as fh:
                    out.append(json.load(fh)["partition_id"])
        return out

    def manifests(self) -> List[dict]:
        mdir = self._manifest_dir()
        if not os.path.isdir(mdir):
            return []
        res = []
        for f in sorted(os.listdir(mdir)):
            if f.endswith(".json"):
                with open(os.path.join(mdir, f)) as fh:
                    res.append(json.load(fh))
        return res

    def commit_partition(
        self,
        partition_id: str,
        metrics: DataFrame,
        violations: DataFrame,
        lineage: dict,
    ) -> dict:
        """Write one partition's verdicts + manifest (manifest LAST)."""
        pid = _safe(partition_id)
        t0 = time.time()
        mpath = os.path.join(self.ckpt_dir, "metrics", f"partition={pid}")
        vpath = os.path.join(self.ckpt_dir, "violations", f"partition={pid}")
        metrics.write.mode("overwrite").parquet(mpath)
        violations.write.mode("overwrite").parquet(vpath)
        record = {
            "partition_id": partition_id,
            "committed_at_unix": time.time(),
            "write_sec": round(time.time() - t0, 3),
            "engine_version": __version__,
            **lineage,
        }
        os.makedirs(self._manifest_dir(), exist_ok=True)
        tmp = os.path.join(self._manifest_dir(), f".{pid}.json.tmp")
        final = os.path.join(self._manifest_dir(), f"{pid}.json")
        with open(tmp, "w") as fh:
            json.dump(record, fh)
        os.replace(tmp, final)  # atomic commit point
        return record

    def read_metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.ckpt_dir, "metrics"))

    def read_violations(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.ckpt_dir, "violations"))


def validate_resumable(
    spark: SparkSession,
    df: DataFrame,
    suite: CheckSuite,
    ckpt_dir: str,
    commits: Optional[DataFrame] = None,
    sha_oracle: Optional[DataFrame] = None,
    input_snapshot_id: str = "unknown",
    partition_expr=None,
    stage_dir: Optional[str] = None,
) -> dict:
    """Run the suite, skipping partitions already committed in ``ckpt_dir``.

    Returns a summary dict: partitions committed this run / skipped /
    total rows validated.  Verdicts land in the checkpoint tree; read
    them back with :meth:`CheckpointManager.read_metrics`.
    """
    from .checks import default_partition_expr

    mgr = CheckpointManager(ckpt_dir)
    part = partition_expr if partition_expr is not None else default_partition_expr()
    done = set(mgr.committed_partitions())

    src = df.withColumn("partition_id", part)
    all_parts = [r[0] for r in src.select("partition_id").distinct().collect()]
    todo = [p for p in all_parts if p not in done]

    summary = {
        "total_partitions": len(all_parts),
        "skipped_committed": len(all_parts) - len(todo),
        "committed_now": 0,
        "rows_validated": 0,
    }
    if not todo:
        return summary

    remaining = src.where(F.col("partition_id").isin(todo)).drop("partition_id")
    res: SuiteResult = run_suite(
        remaining,
        suite,
        commits=commits,
        sha_oracle=sha_oracle,
        partition_expr=part,
        stage_dir=stage_dir,
    )
    n_rows = remaining.count()
    metrics = res.metrics.persist()
    violations = res.violations.persist()
    metrics.count(), violations.count()  # materialize once

    lineage = {
        "input_snapshot_id": input_snapshot_id,
        "suite_hash": suite.suite_hash(),
        "rows_validated_in_run": n_rows,
    }
    for pid in todo:
        mgr.commit_partition(
            pid,
            metrics.where(F.col("partition_id") == pid),
            violations.where(F.col("partition_id") == pid),
            lineage,
        )
        summary["committed_now"] += 1
    summary["rows_validated"] = n_rows
    metrics.unpersist()
    violations.unpersist()
    res.unpersist()
    return summary
