"""Build → query round-trips through real Parquet.

Modeled on the reference's integration tests: write→query round trip
incl. 4-byte prefix (ref tests/integration.rs:124-151), algorithm
filter (:154-190), limit incl. over-limit (:371-406), negative lookup
(:328-368), stats (:193-234), empty input (:409-419).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from shaha_spark.pipeline import build as _  # noqa: F401  (package init)
import sys
build_mod = sys.modules["shaha_spark.pipeline.build"]
from shaha_spark.pipeline.stats import info, scan_stats
from shaha_spark.query import prefix_predicate, prefix_successor, query

WORDS = ["password", "hello", "world", "hunter2", "correct horse battery staple"]


@pytest.fixture(scope="module")
def db_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hashdb") / "db")
    words = spark.createDataFrame([(w,) for w in WORDS + ["password", ""]], "word string")
    summary = build_mod.build(
        spark,
        words,
        ["sha256", "md5"],
        path,
        source_name="test-words",
        source_hash="deadbeef",
    )
    assert summary["total_records"] == len(WORDS) * 2  # dedup + empty filter
    return path


def test_round_trip_point_lookup(spark, db_path):
    digest = hashlib.sha256(b"password").hexdigest()
    rows = query(spark, db_path, digest).collect()
    assert len(rows) == 1
    assert rows[0].preimage == "password"
    assert rows[0].algorithm == "sha256"
    assert rows[0].sources == ["test-words"]


def test_round_trip_prefix_lookup(spark, db_path):
    digest = hashlib.sha256(b"password").hexdigest()
    rows = query(spark, db_path, digest[:8]).collect()  # 4-byte prefix
    assert {r.preimage for r in rows} == {"password"}


def test_empty_prefix_matches_all(spark, db_path):
    # ref tests/integration.rs:395-396
    assert query(spark, db_path, "").count() == len(WORDS) * 2


def test_algorithm_filter(spark, db_path):
    rows = query(spark, db_path, "", algorithm="md5").collect()
    assert len(rows) == len(WORDS)
    assert all(r.algorithm == "md5" and len(r.hash) == 16 for r in rows)


def test_limit(spark, db_path):
    assert len(query(spark, db_path, "", limit=3).collect()) == 3
    # over-limit returns all (ref integration.rs:371-406)
    assert len(query(spark, db_path, "", limit=10_000).collect()) == len(WORDS) * 2


def test_negative_lookup(spark, db_path):
    assert query(spark, db_path, "00" * 32).count() == 0


def test_bad_hex_raises(spark, db_path):
    with pytest.raises(ValueError):
        query(spark, db_path, "zz")


def test_sorted_by_hash(spark, db_path):
    hashes = [r.hash for r in build_mod.read_hashdb(spark, db_path).collect()]
    # file order == partition order == global sort order
    assert hashes == sorted(hashes)


def test_info_sidecar_and_fallback(spark, db_path):
    meta = info(spark, db_path)
    assert meta["from_metadata"] is True
    assert meta["total_records"] == len(WORDS) * 2
    assert meta["algorithms"] == ["md5", "sha256"]
    assert meta["sources"] == ["test-words"]
    scan = scan_stats(spark, db_path)
    assert scan["total_records"] == meta["total_records"]
    assert scan["algorithms"] == meta["algorithms"]
    assert scan["sources"] == meta["sources"]


def test_idempotence_gate(spark, db_path):
    words = spark.createDataFrame([("password",)], "word string")
    res = build_mod.build(
        spark, words, ["sha256"], db_path,
        source_name="test-words", source_hash="deadbeef", append=True,
    )
    assert res["skipped"] is True


def test_dry_run(spark):
    # ref build.rs:253-327 + integration.rs:668-707 ("Unique words: 2" from 3 lines)
    words = spark.createDataFrame([("a",), ("b",), ("a",)], "word string")
    res = build_mod.build(spark, words, ["sha256", "md5"], "/tmp/unused", dry_run=True)
    assert res == {
        "dry_run": True,
        "total_words": 3,
        "unique_words": 2,
        "duplicates": 1,
        "records_to_generate": 4,
    }


def test_prefix_successor():
    assert prefix_successor(b"\xab\x12") == b"\xab\x13"
    assert prefix_successor(b"\xab\xff") == b"\xac"
    assert prefix_successor(b"\xff\xff") is None


def test_prefix_range_pushdown(spark, db_path):
    # The physical scan must carry pushed filters on `hash` for both
    # the range and equality forms (P2/P10).
    df = build_mod.read_hashdb(spark, db_path).filter(prefix_predicate(b"\xab\xcd"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(hash), GreaterThanOrEqual(hash" in plan, plan


def test_half_byte_prefix_unsupported():
    # odd-length hex = half-byte prefix; not expressible (ref query.rs:69)
    from shaha_spark.schema import hex_to_bytes

    with pytest.raises(ValueError):
        hex_to_bytes("abc")


def test_empty_wordlist_build(spark, tmp_path):
    # ref integration.rs:472-481: empty batch -> no data; our dataset-level
    # equivalent: a valid empty database that queries and reports cleanly
    path = str(tmp_path / "empty_db")
    words = spark.createDataFrame([("",), ("",)], "word string")  # all filtered
    res = build_mod.build(spark, words, ["sha256"], path, source_name="none")
    assert res["total_records"] == 0
    assert query(spark, path, "").count() == 0
    assert info(spark, path)["total_records"] == 0
