"""Resumable validation: commit manifests, skip committed partitions,
idempotent rerun."""

import json
import os

import pytest

from pynomaly_spark.checkpoint import CheckpointManager, validate_resumable
from pynomaly_spark.checks import CheckSuite, NullRate, Uniqueness
from pynomaly_spark.datagen import CodeTableSpec, generate_code_table


@pytest.fixture(scope="module")
def files_df(spark):
    files_pd, _, _ = generate_code_table(CodeTableSpec(n_rows=800))
    return spark.createDataFrame(files_pd.drop(columns=["content_sha"]))


def _suite():
    return CheckSuite(checks=[NullRate("content", 0.01), Uniqueness()])


def test_first_run_commits_all(spark, files_df, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    summary = validate_resumable(
        spark, files_df, _suite(), ckpt, input_snapshot_id="snap1"
    )
    assert summary["skipped_committed"] == 0
    assert summary["committed_now"] == summary["total_partitions"] > 0

    mgr = CheckpointManager(ckpt)
    manifests = mgr.manifests()
    assert len(manifests) == summary["total_partitions"]
    m = manifests[0]
    assert m["input_snapshot_id"] == "snap1"
    assert m["suite_hash"] == _suite().suite_hash()
    assert m["engine_version"]

    metrics = mgr.read_metrics(spark)
    assert metrics.count() > 0
    assert set(metrics.columns) >= {"check_name", "metric", "value", "passed"}


def test_rerun_skips_committed(spark, files_df, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    s1 = validate_resumable(spark, files_df, _suite(), ckpt)
    s2 = validate_resumable(spark, files_df, _suite(), ckpt)
    assert s2["skipped_committed"] == s1["total_partitions"]
    assert s2["committed_now"] == 0
    assert s2["rows_validated"] == 0


def test_partial_resume(spark, files_df, tmp_path):
    """Simulate a crash: delete one manifest, rerun -> only that partition
    is revalidated and recommitted."""
    ckpt = str(tmp_path / "ckpt3")
    validate_resumable(spark, files_df, _suite(), ckpt)
    mdir = os.path.join(ckpt, "manifest")
    victim = sorted(os.listdir(mdir))[0]
    with open(os.path.join(mdir, victim)) as fh:
        victim_pid = json.load(fh)["partition_id"]
    os.remove(os.path.join(mdir, victim))

    s = validate_resumable(spark, files_df, _suite(), ckpt)
    assert s["committed_now"] == 1
    mgr = CheckpointManager(ckpt)
    assert victim_pid in mgr.committed_partitions()
    # verdicts for the recommitted partition are present and readable
    metrics = mgr.read_metrics(spark).where(
        f"partition_id = '{victim_pid}'"
    )
    assert metrics.count() > 0


def test_manifest_names_collision_free(tmp_path):
    """Distinct partition ids that sanitize to the same safe string must
    commit distinct manifests (round-2 ADVICE: 'lang=a/b' vs 'lang=a:b'
    both sanitized to 'lang=a_b')."""
    mgr = CheckpointManager(str(tmp_path / "c"))
    mgr.commit_manifest("lang=a/b", {"x": 1})
    mgr.commit_manifest("lang=a:b", {"x": 2})
    committed = mgr.committed_partitions()
    assert sorted(committed) == ["lang=a/b", "lang=a:b"]
    mdir = os.path.join(str(tmp_path / "c"), "manifest")
    assert len([f for f in os.listdir(mdir) if f.endswith(".json")]) == 2


def test_orphan_payload_cleaned_on_resume(spark, files_df, tmp_path):
    """A crashed run's orphan payload dir (payload written, no manifest)
    must be dropped before the rerun writes, so stale rows can't leak
    into the committed result."""
    ckpt = str(tmp_path / "ckpt4")
    validate_resumable(spark, files_df, _suite(), ckpt)
    mdir = os.path.join(ckpt, "manifest")
    victim = sorted(os.listdir(mdir))[0]
    with open(os.path.join(mdir, victim)) as fh:
        victim_pid = json.load(fh)["partition_id"]
    os.remove(os.path.join(mdir, victim))
    # plant a stale marker row in the victim's metric-kind verdict dir
    mroot = os.path.join(ckpt, "verdicts", "kind=metric")
    from urllib.parse import unquote
    vdir = next(
        d for d in os.listdir(mroot)
        if d.startswith("partition_id=")
        and unquote(d[len("partition_id="):]) == victim_pid
    )
    stale = spark.createDataFrame(
        [("STALE_CHECK", "stale", 1.0, 0.0, False, None, None, None, None, None, None)],
        "check_name string, metric string, value double, threshold double,"
        " passed boolean, row_id long, repo string, path string,"
        " commit string, detail string, loop_score double",
    )
    stale.write.mode("append").parquet(os.path.join(mroot, vdir))
    s = validate_resumable(spark, files_df, _suite(), ckpt)
    assert s["committed_now"] == 1
    mgr = CheckpointManager(ckpt)
    names = [
        r[0]
        for r in mgr.read_metrics(spark)
        .where(f"partition_id = '{victim_pid}'")
        .select("check_name")
        .distinct()
        .collect()
    ]
    assert "STALE_CHECK" not in names and len(names) > 0
