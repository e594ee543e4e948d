"""Schema validation on read + file-size stats (H15)."""

from __future__ import annotations

import pytest

from shaha_spark.io_util import human_bytes, tree_size
from shaha_spark.pipeline.build import build, read_hashdb
from shaha_spark.pipeline.stats import info


def test_human_bytes():
    assert human_bytes(512) == "512 B"
    assert human_bytes(45_320_000) == "43.22 MB"
    assert human_bytes(2_000_000_000_000) == "1.82 TB"


def test_info_reports_file_size(spark, tmp_path):
    path = str(tmp_path / "db")
    words = spark.createDataFrame([("a",), ("b",)], "word string")
    build(spark, words, ["md5"], path, source_name="w")
    meta = info(spark, path)
    assert meta["file_size_bytes"] > 0
    assert meta["file_size_bytes"] == tree_size(spark, path)


def test_read_validate_rejects_wrong_schema(spark, tmp_path):
    bad = str(tmp_path / "not_a_db")
    spark.createDataFrame([(1, "x")], "a long, b string").write.parquet(bad)
    with pytest.raises(ValueError, match="Invalid schema"):
        read_hashdb(spark, bad, validate=True)
    # and a correct database passes validation
    good = str(tmp_path / "db")
    words = spark.createDataFrame([("a",)], "word string")
    build(spark, words, ["md5"], good, source_name="w")
    assert read_hashdb(spark, good, validate=True).count() == 1
