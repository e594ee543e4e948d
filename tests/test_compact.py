"""Compaction: fragmentation detection, sort preservation, no-op path."""

from __future__ import annotations

from pyspark.sql import functions as F

from shaha_spark.pipeline.build import build, read_hashdb, read_sidecar
from shaha_spark.pipeline.compact import compact_hashdb, plan_compaction


def _fragmented_db(spark, tmp_path, words=200):
    wdf = spark.createDataFrame(
        [(f"word{i:04d}",) for i in range(words)], "word string"
    )
    out = str(tmp_path / "db")
    build(
        spark,
        wdf,
        ["sha256"],
        out,
        num_files=16,  # deliberately fragmented
    )
    return out


def test_compact_merges_files_and_preserves_content(spark, tmp_path):
    out = _fragmented_db(spark, tmp_path)
    before = read_hashdb(spark, out)
    before_rows = sorted(r["hash"] for r in before.select("hash").collect())
    meta_before = read_sidecar(spark, out)

    plan = plan_compaction(spark, out)
    assert plan["n_files"] == 16 and plan["needed"]

    result = compact_hashdb(spark, out)
    assert result["compacted"] and result["files_after"] == plan["target_files"] == 1

    after = read_hashdb(spark, out)
    after_rows = [r["hash"] for r in after.select("hash").collect()]
    assert sorted(after_rows) == before_rows
    # global hash sort preserved (the point-lookup/prefix-scan invariant)
    assert after_rows == sorted(after_rows)
    # logical sidecar metadata carried over
    meta_after = read_sidecar(spark, out)
    assert meta_after["total_records"] == meta_before["total_records"]
    assert meta_after["algorithms"] == meta_before["algorithms"]


def test_compact_noop_when_within_target(spark, tmp_path):
    out = _fragmented_db(spark, tmp_path)
    compact_hashdb(spark, out)
    second = compact_hashdb(spark, out)
    assert second["compacted"] is False  # already at target layout


def test_compacted_db_still_answers_queries(spark, tmp_path):
    from shaha_spark.query import query

    out = _fragmented_db(spark, tmp_path)
    import hashlib

    target = hashlib.sha256(b"word0042").hexdigest()
    assert query(spark, out, target).count() == 1
    compact_hashdb(spark, out)
    rows = query(spark, out, target).collect()
    assert len(rows) == 1 and rows[0]["preimage"] == "word0042"


def test_compact_cli_verb(spark, tmp_path):
    import json
    import subprocess
    import sys

    out = _fragmented_db(spark, tmp_path)
    env_cmd = [sys.executable, "-m", "shaha_spark", "compact", "-d", out,
               "--target-file-mb", "128"]
    proc = subprocess.run(
        env_cmd, capture_output=True, text=True, cwd="/root/repo", timeout=300
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout)
    assert result["compacted"] is True and result["files_after"] == 1


def test_compact_preserves_partitioned_layout(spark, tmp_path):
    from shaha_spark.io_util import list_files

    wdf = spark.createDataFrame(
        [(f"word{i:04d}",) for i in range(100)], "word string"
    )
    out = str(tmp_path / "pdb")
    build(
        spark, wdf, ["sha256", "md5"], out,
        num_files=8, partition_by_algorithm=True,
    )
    assert any("/algorithm=" in p for p, _ in list_files(spark, out))
    result = compact_hashdb(spark, out, force=True)
    assert result["compacted"]
    # still hive-partitioned after the rewrite
    files = list_files(spark, out)
    assert files and all("/algorithm=" in p for p, _ in files)
    back = read_hashdb(spark, out)
    assert back.count() == 200
    assert {r["algorithm"] for r in back.select("algorithm").distinct().collect()} == {"md5", "sha256"}
