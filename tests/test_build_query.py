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


def test_fused_dedup_rides_the_range_shuffle(spark):
    """sort_for_write(dedup=True) must add NO exchange beyond the range
    partition itself: RangePartitioning(hash) co-locates equal keys, so
    the (hash, algorithm) window dedup is partition-local. One exchange
    fewer than a separate dropDuplicates pass — the point of the fusion."""
    import re

    from shaha_spark.pipeline.build import hash_fanout, sort_for_write

    words = spark.createDataFrame(
        [(f"w{i}",) for i in range(50)], "word string"
    )
    rec = hash_fanout(words, ["sha256", "md5"])
    fused = sort_for_write(rec, num_files=4, dedup=True)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert exchanges == ["rangepartitioning"], exchanges
    # the rank filter plan-rewrites to WindowGroupLimit (no rank column
    # materialized per row)
    assert "WindowGroupLimit" in plan


def test_fused_dedup_equals_separate_dedup_and_is_collision_strict(spark):
    from pyspark.sql import functions as F

    from shaha_spark.pipeline.build import (
        dedup_records,
        hash_fanout,
        sort_for_write,
    )

    words = spark.createDataFrame(
        [(f"word{i % 40}",) for i in range(120)], "word string"
    ).dropDuplicates(["word"])
    rec = hash_fanout(words, ["sha256", "md5"])
    fused = sort_for_write(rec, num_files=3, dedup=True)
    separate = dedup_records(rec)
    key = lambda df: sorted(
        (bytes(r.hash).hex(), r.preimage, r.algorithm) for r in df.collect()
    )
    assert key(fused) == key(separate)

    # true first-wins on a genuine (hash, algorithm) collision: craft
    # two distinct preimages with an artificially identical digest by
    # unioning a duplicated record set
    dup = rec.union(rec.withColumn("preimage", F.concat(F.col("preimage"), F.lit("")) ))
    out = sort_for_write(dup, num_files=2, dedup=True)
    assert out.count() == rec.count()  # exactly one survivor per key


def test_build_result_unchanged_by_fusion(spark, tmp_path):
    """End-to-end build() parity: same rows, still globally hash-sorted."""
    import hashlib

    from pyspark.sql import functions as F

    from shaha_spark.pipeline.build import build, read_hashdb

    words = spark.createDataFrame(
        [(f"w{i:03d}",) for i in range(200)] + [("w000",)], "word string"
    )
    out = str(tmp_path / "fdb")
    res = build(spark, words, ["sha256", "md5"], out, num_files=4)
    assert res["total_records"] == 400  # dup word deduped, 200 x 2 algos
    df = read_hashdb(spark, out)
    got = {
        (bytes(r.hash).hex(), r.algorithm) for r in df.collect()
    }
    for i in range(200):
        w = f"w{i:03d}".encode()
        assert (hashlib.sha256(w).hexdigest(), "sha256") in got
        assert (hashlib.md5(w).hexdigest(), "md5") in got


def test_on_disk_density_guard(spark, tmp_path):
    """Adaptive bloom sizing (round 4): a small build must not carry
    megabyte fixed-size bloom filters. Regression guard for the
    61->32 B/record finding — a fixed 1M-ndv declaration would push
    this build past 300 B/record."""
    import glob
    import os

    from shaha_spark.pipeline.build import build

    words = spark.createDataFrame(
        [(f"w{i:04d}",) for i in range(5000)], "word string"
    )
    out = str(tmp_path / "dense")
    build(spark, words, ["sha256", "md5"], out, num_files=4)
    total = sum(
        os.path.getsize(f) for f in glob.glob(out + "/*.parquet")
    )
    bpr = total / 10_000
    assert bpr < 100, f"{bpr:.1f} B/record — bloom filters oversized again?"
