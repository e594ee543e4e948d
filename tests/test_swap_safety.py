"""Crash-safety of the directory-swap and slice-swap protocols —
round-4 review regressions: a retried swap must heal (never destroy)
the history a previous failure preserved, recovery must survive torn
manifests, snapshots must never pin Spark-invisible staging files, and
append must not flatten a partitioned layout.
"""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from shaha_spark import io_util
from shaha_spark.pipeline import snapshot as snap
from shaha_spark.pipeline.build import build, read_hashdb
from shaha_spark.pipeline.compact import (
    MANIFEST_SUFFIX,
    compact_hashdb,
    recover_slices,
)


def _db(spark, tmp_path, words, num_files=3, name="db"):
    out = str(tmp_path / name)
    df = spark.createDataFrame(
        [(f"word{i:04d}",) for i in range(words)], "word string"
    )
    build(spark, df, ["sha256"], out, source_name="t", num_files=num_files)
    return out


def test_retried_swap_heals_instead_of_destroying_history(
    spark, tmp_path, monkeypatch
):
    """After a failed snapshot-log restore leaves the backup behind, a
    RETRY (with the filesystem healthy again) must recover the log and
    the referenced files — not delete the backup wholesale."""
    out = _db(spark, tmp_path, words=120, num_files=3)
    snap.snapshot_create(spark, out)
    n_v1 = snap.read_snapshot(spark, out, 1).count()

    real_rename = io_util.rename
    fail = {"on": True}

    def failing_rename(spark_, src, dst):
        if (
            fail["on"]
            and dst.rstrip("/").endswith(snap.SNAP_DIR)
            and "__old__" in src
        ):
            return False
        return real_rename(spark_, src, dst)

    monkeypatch.setattr(io_util, "rename", failing_rename)
    with pytest.raises(IOError, match="manual recovery"):
        compact_hashdb(spark, out, force=True)
    backup = out.rstrip("/") + ".__old__"
    assert io_util.exists(spark, backup + "/" + snap.SNAP_DIR)

    # filesystem recovers; the retry must heal, then compact cleanly
    fail["on"] = False
    report = compact_hashdb(spark, out, force=True)
    assert report["compacted"] is True
    assert not io_util.exists(spark, backup)
    # the snapshot survived the failed attempt + retry
    assert snap.read_snapshot(spark, out, 1).count() == n_v1
    assert read_hashdb(spark, out).count() == 120


def test_recover_slices_tolerates_torn_manifest(spark, tmp_path):
    out = _db(spark, tmp_path, words=50, num_files=2)
    # simulate a crash mid-manifest-write: stage + zero-byte manifest
    stage = out.rstrip("/") + "/_incoming-torn.zstd.parquet"
    io_util.write_text(spark, stage, "not a parquet, just a stage marker")
    io_util.write_text(spark, stage + MANIFEST_SUFFIX, "")
    rep = recover_slices(spark, out)
    assert rep["dropped_stages"] == 1
    assert not io_util.exists(spark, stage)
    assert not io_util.exists(spark, stage + MANIFEST_SUFFIX)
    # dataset unharmed, recovery callable again (idempotent)
    assert read_hashdb(spark, out).count() == 50
    assert recover_slices(spark, out) == {
        "rolled_forward": 0,
        "dropped_stages": 0,
    }


def test_recover_slices_tolerates_partial_json_manifest(spark, tmp_path):
    out = _db(spark, tmp_path, words=30, num_files=1)
    stage = out.rstrip("/") + "/_incoming-partial.zstd.parquet"
    io_util.write_text(spark, stage, "stage")
    io_util.write_text(spark, stage + MANIFEST_SUFFIX, '{"originals": ["x"')
    rep = recover_slices(spark, out)
    assert rep["dropped_stages"] == 1
    assert read_hashdb(spark, out).count() == 30


def test_live_files_excludes_staging_and_temp(spark, tmp_path):
    out = _db(spark, tmp_path, words=40, num_files=2)
    io_util.write_text(
        spark, out.rstrip("/") + "/_incoming-x.zstd.parquet", "staged"
    )
    io_util.write_text(
        spark, out.rstrip("/") + "/.__slice_dead__/part-0.parquet", "temp"
    )
    live = {p for p, _ in snap.live_files(spark, out)}
    assert not any("_incoming" in p or ".__slice" in p for p in live)
    # and snapshot_create therefore cannot pin them
    m = snap.snapshot_create(spark, out)
    assert not any(
        "_incoming" in f["rel"] or ".__slice" in f["rel"] for f in m["files"]
    )


def test_append_preserves_partitioned_layout(spark, tmp_path):
    out = str(tmp_path / "pdb")
    w1 = spark.createDataFrame([("alpha",), ("beta",)], "word string")
    build(
        spark, w1, ["md5", "sha256"], out,
        source_name="w1", partition_by_algorithm=True,
    )
    assert any(
        "/algorithm=" in p for p, _ in snap.live_files(spark, out)
    )
    # append WITHOUT re-passing the flag: layout must survive
    w2 = spark.createDataFrame([("gamma",)], "word string")
    build(spark, w2, ["md5", "sha256"], out, source_name="w2", append=True)
    assert any(
        "/algorithm=" in p for p, _ in snap.live_files(spark, out)
    ), "append flattened the algorithm-partitioned layout"
    got = {
        r.p
        for r in read_hashdb(spark, out)
        .selectExpr("decode(preimage,'utf-8') p")
        .distinct()
        .collect()
    }
    assert got == {"alpha", "beta", "gamma"}
