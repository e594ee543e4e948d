"""The type-strict oracle guard itself: proves the DuckDB-HUGEINT vs
Spark-bigint class (VERDICT r3 `docs_packed` / `tpch_q12`) now fails
locally instead of passing through Python's ``Decimal(70) == 70``.
No SparkSession needed — schemas are constructed directly."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from _oracle_typecheck import (
    arrow_bucket,
    assert_types_compatible,
    spark_bucket,
)


def _duck_arrow(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).arrow()
    finally:
        con.close()


def test_hugeint_vs_bigint_fails():
    # DuckDB SUM(BIGINT) -> HUGEINT -> arrow decimal128(38,0)
    tbl = _duck_arrow("SELECT SUM(x) AS n FROM (VALUES (1::BIGINT), (69)) t(x)")
    assert str(tbl.schema.field("n").type).startswith("decimal128(38, 0)")
    spark_schema = T.StructType([T.StructField("n", T.LongType())])
    with pytest.raises(AssertionError, match="type-bucket mismatch"):
        assert_types_compatible("demo", spark_schema, tbl)


def test_cast_to_bigint_passes():
    tbl = _duck_arrow(
        "SELECT CAST(SUM(x) AS BIGINT) AS n FROM (VALUES (1::BIGINT), (69)) t(x)"
    )
    spark_schema = T.StructType([T.StructField("n", T.LongType())])
    assert_types_compatible("demo", spark_schema, tbl)


def test_documented_widenings():
    # int widths collapse; string==large_string; decimal keeps scale
    tbl = _duck_arrow(
        "SELECT 1::INTEGER AS i, 'x' AS s, 1.50::DECIMAL(10,2) AS d, "
        "2.0::DOUBLE AS f, DATE '2026-01-01' AS dt"
    )
    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("d", T.DecimalType(38, 2)),
            T.StructField("f", T.DoubleType()),
            T.StructField("dt", T.DateType()),
        ]
    )
    assert_types_compatible("widen", schema, tbl)


def test_decimal_scale_mismatch_fails():
    tbl = _duck_arrow("SELECT 1.5000::DECIMAL(10,4) AS d")
    schema = T.StructType([T.StructField("d", T.DecimalType(10, 2))])
    with pytest.raises(AssertionError, match="type-bucket mismatch"):
        assert_types_compatible("scale", schema, tbl)


def test_decimal_vs_double_fails():
    tbl = _duck_arrow("SELECT 1.50::DECIMAL(10,2) AS d")
    schema = T.StructType([T.StructField("d", T.DoubleType())])
    with pytest.raises(AssertionError, match="type-bucket mismatch"):
        assert_types_compatible("dvd", schema, tbl)


def test_array_buckets():
    tbl = _duck_arrow("SELECT [1, 2, 3] AS a")
    ok = T.StructType([T.StructField("a", T.ArrayType(T.LongType()))])
    assert_types_compatible("arr", ok, tbl)
    bad = T.StructType([T.StructField("a", T.ArrayType(T.DoubleType()))])
    with pytest.raises(AssertionError):
        assert_types_compatible("arr", bad, tbl)


def test_bucket_functions_cover_null():
    import pyarrow as pa

    assert arrow_bucket(pa.null()) == "null"
    assert spark_bucket(T.NullType()) == "null"
