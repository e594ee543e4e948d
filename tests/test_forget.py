"""Targeted deletion (pipeline/forget.py): erase preimages by
rewriting only range-matching files; untouched files stay
byte-identical, the sidecar count tracks, queries stop answering, and
the operation is idempotent.
"""

from __future__ import annotations

import pytest

import hashlib

from pyspark.sql import functions as F

from shaha_spark.pipeline.build import build, read_hashdb, read_sidecar
from shaha_spark.pipeline.forget import (
    forget_digests,
    forget_preimages,
    plan_forget,
)
from shaha_spark import io_util


def _db(spark, tmp_path, words=300, num_files=8, algos=("sha256", "md5")):
    wdf = spark.createDataFrame(
        [(f"word{i:04d}",) for i in range(words)], "word string"
    )
    out = str(tmp_path / "db")
    build(spark, wdf, list(algos), out, num_files=num_files)
    return out


def _files(spark, path):
    return {p: sz for p, sz in io_util.list_files(spark, path)}


def test_forget_preimages_removes_all_algos_and_only_them(spark, tmp_path):
    out = _db(spark, tmp_path)
    meta0 = read_sidecar(spark, out)
    gone = ["word0007", "word0123"]
    report = forget_preimages(spark, out, gone)
    # 2 preimages x 2 algorithms
    assert report["rows_deleted"] == 4
    db = read_hashdb(spark, out)
    assert db.where(F.col("preimage").isin(gone)).count() == 0
    assert db.count() == meta0["total_records"] - 4
    assert read_sidecar(spark, out)["total_records"] == meta0["total_records"] - 4


def test_forget_rewrites_only_range_matching_files(spark, tmp_path):
    out = _db(spark, tmp_path)
    before = _files(spark, out)
    digest = hashlib.sha256(b"word0042").digest()
    plan = plan_forget(spark, out, [digest])
    # the global hash sort puts one digest in very few files
    assert 1 <= plan["candidate_files"] <= 2 < plan["total_files"]
    report = forget_digests(spark, out, [digest])
    assert report["rows_deleted"] == 1
    after = _files(spark, out)
    # every non-candidate file is still the same physical file
    cand = {c["file"] for c in plan["candidates"]}
    for p, sz in before.items():
        if p not in cand:
            assert after.get(p) == sz, f"untouched file changed: {p}"
    assert sum(1 for p in before if p not in after) == report["files_rewritten"] + report["files_dropped"]


def test_forget_is_idempotent_and_preserves_sort(spark, tmp_path):
    out = _db(spark, tmp_path)
    forget_preimages(spark, out, ["word0001"])
    second = forget_preimages(spark, out, ["word0001"])
    assert second["rows_deleted"] == 0
    # per-file hash sort (the lookup invariant) survives the rewrite
    for p in _files(spark, out):
        hashes = [r.hash for r in spark.read.parquet(p).select("hash").collect()]
        assert hashes == sorted(hashes)


def test_forgotten_word_no_longer_answers_queries(spark, tmp_path):
    from shaha_spark.query import query

    out = _db(spark, tmp_path)
    digest = hashlib.sha256(b"word0099").hexdigest()
    assert query(spark, out, digest).count() == 1
    forget_preimages(spark, out, ["word0099"], algorithms=["sha256"])
    assert query(spark, out, digest).count() == 0
    # md5 record of the same word survives an algorithm-scoped forget
    md5_digest = hashlib.md5(b"word0099").hexdigest()
    assert query(spark, out, md5_digest).count() == 1


def test_forget_whole_file_drops_it(spark, tmp_path):
    # tiny db in 1 file per algorithm partition; forgetting every word
    # must delete files outright rather than writing empty parquet
    wdf = spark.createDataFrame([("a",), ("b",)], "word string")
    out = str(tmp_path / "db2")
    build(spark, wdf, ["sha256"], out, num_files=1)
    report = forget_preimages(spark, out, ["a", "b"])
    assert report["rows_deleted"] == 2
    assert report["files_dropped"] >= 1
    assert read_hashdb(spark, out).count() == 0


@pytest.mark.slow  # heavy lifecycle tier -> `make test-slow` (VERDICT r12 #2)
def test_cli_forget_subcommand(spark, tmp_path):
    """One subprocess drives dry-run plan then the real erase."""
    import json as _json
    import subprocess
    import sys

    out = _db(spark, tmp_path, words=50, num_files=2, algos=("sha256",))
    env_cmd = [sys.executable, "-m", "shaha_spark", "forget", "-d", out]
    plan = subprocess.run(
        env_cmd + ["-w", "word0003", "--dry-run"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert plan.returncode == 0, plan.stderr[-2000:]
    parsed = _json.loads(plan.stdout[plan.stdout.index("{"):])
    assert parsed["n_digests"] == 1 and parsed["candidate_files"] >= 1

    run = subprocess.run(
        env_cmd + ["-w", "word0003"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert run.returncode == 0, run.stderr[-2000:]
    report = _json.loads(run.stdout[run.stdout.index("{"):])
    assert report["rows_deleted"] == 1
    db = read_hashdb(spark, out)
    assert db.where(F.col("preimage") == "word0003").count() == 0


def test_forget_then_compact_roundtrip(spark, tmp_path):
    """Maintenance ops compose: forget leaves shrunken files, slice
    compaction merges them, and lookups stay correct throughout."""
    from shaha_spark.pipeline.compact import compact_slices
    from shaha_spark.query import query

    out = _db(spark, tmp_path, words=200, num_files=8, algos=("sha256",))
    gone = [f"word{i:04d}" for i in range(0, 50)]
    rep = forget_preimages(spark, out, gone)
    assert rep["rows_deleted"] == 50
    compact_slices(spark, out, target_file_bytes=1 << 20)
    db = read_hashdb(spark, out)
    assert db.count() == 150
    assert db.where(F.col("preimage").isin(gone)).count() == 0
    h = hashlib.sha256(b"word0150").hexdigest()
    assert query(spark, out, h).select("preimage").head()[0] == "word0150"
    # sort invariant survives both rewrites
    for p in _files(spark, out):
        hashes = [r.hash for r in spark.read.parquet(p).select("hash").collect()]
        assert hashes == sorted(hashes)


def test_forget_decrements_live_count_only(spark, tmp_path):
    """ADVICE r3: rows scrubbed from retained history copies must not
    decrement the sidecar's live total_records. After snapshot +
    compaction, one erased live record also gets scrubbed from its
    retained copy — the sidecar must still drop by exactly 1 per
    algorithm, not 2+."""
    from shaha_spark.pipeline import snapshot as snap
    from shaha_spark.pipeline.build import read_sidecar
    from shaha_spark.pipeline.compact import compact_slices

    out = _db(spark, tmp_path, words=300, num_files=8, algos=("sha256",))
    snap.snapshot_create(spark, out)
    compact_slices(spark, out, target_file_bytes=1 << 30)
    before = read_sidecar(spark, out)["total_records"]
    report = forget_preimages(spark, out, ["word0077"])
    # history copies were scrubbed too, so raw deletions exceed live
    assert report["rows_deleted"] > report["live_rows_deleted"]
    assert report["live_rows_deleted"] == 1
    after = read_sidecar(spark, out)["total_records"]
    assert after == before - 1
    # and the sidecar now matches a physical count of the live data
    from shaha_spark.pipeline.build import read_hashdb

    assert read_hashdb(spark, out).count() == after


def test_preimage_digests_scan_fallback_without_sidecar(spark, tmp_path):
    """The digest expansion (shared by the real run AND the CLI
    dry-run) must fall back to scanning for the algorithm list when
    the sidecar is missing — a dry-run that reports a no-op while the
    real run would delete rows is the worst possible plan output."""
    import os

    from shaha_spark.pipeline.forget import preimage_digests

    out = _db(spark, tmp_path, words=20, num_files=2)
    for name in os.listdir(out):
        if name.startswith("_shaha_meta"):
            io_util.delete(spark, f"{out}/{name}")
    assert read_sidecar(spark, out) is None
    ds = preimage_digests(spark, out, ["word0003"])
    # both algorithms recovered from the scan: 2 digests for 1 word
    assert len(ds) == 2 and len({len(d) for d in ds}) == 2
