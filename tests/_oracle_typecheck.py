"""Type-strict comparison helper for the local oracle harness.

The driver's correctness gate hashes values in a type-sensitive way:
DuckDB's ``SUM(BIGINT)`` window/aggregate returns HUGEINT (arrow
decimal128(38,0)) while Spark emits bigint — values identical, hash
red.  The local harness used to compare via Python ``==`` where
``Decimal(70) == 70`` is True, so the class was invisible locally
(VERDICT r3 item 2).  This module buckets arrow result types (the
oracle side) and Spark result types into canonical classes and
asserts they agree per column, modulo documented widenings:

* all signed/unsigned integer widths are one bucket (the driver's
  serialization treats int32 == int64);
* float32/float64 are one bucket;
* string == large_string, list == large_list;
* decimal keeps its SCALE in the bucket (70.00 vs 70.0000 hash
  differently) but drops precision (decimal128(18,2) == (38,2));
* decimal is NOT compatible with int or float — that is exactly the
  HUGEINT class this guard exists to catch.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T


def arrow_bucket(t: pa.DataType):
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return ("decimal", t.scale)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("array", arrow_bucket(t.value_type))
    if pa.types.is_struct(t):
        return (
            "struct",
            tuple(sorted((f.name, arrow_bucket(f.type)) for f in t)),
        )
    if pa.types.is_map(t):
        return ("map", arrow_bucket(t.key_type), arrow_bucket(t.item_type))
    if pa.types.is_null(t):
        return "null"
    return str(t)


def spark_bucket(t: T.DataType):
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(t, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(t, T.DecimalType):
        return ("decimal", t.scale)
    if isinstance(t, (T.StringType, T.VarcharType, T.CharType)):
        return "str"
    if isinstance(t, T.BinaryType):
        return "bytes"
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(t, T.ArrayType):
        return ("array", spark_bucket(t.elementType))
    if isinstance(t, T.StructType):
        return (
            "struct",
            tuple(sorted((f.name, spark_bucket(f.dataType)) for f in t.fields)),
        )
    if isinstance(t, T.MapType):
        return ("map", spark_bucket(t.keyType), spark_bucket(t.valueType))
    if isinstance(t, T.NullType):
        return "null"
    return str(t)


def assert_types_compatible(name: str, spark_schema, arrow_table: pa.Table):
    """Assert every shared column has the same type bucket on both
    sides.  ``spark_schema`` is a pyspark StructType; ``arrow_table``
    is the DuckDB result fetched via ``.arrow()``."""
    spark_by_name = {f.name: spark_bucket(f.dataType) for f in spark_schema.fields}
    bad = []
    for field in arrow_table.schema:
        sb = spark_by_name.get(field.name)
        if sb is None:
            continue  # column-name mismatch is reported separately
        ab = arrow_bucket(field.type)
        if sb == "null" or ab == "null":
            continue  # empty-result columns carry no type evidence
        if sb != ab:
            bad.append((field.name, f"spark={sb}", f"oracle={ab} ({field.type})"))
    assert not bad, (
        f"{name}: type-bucket mismatch (driver hash would differ even on "
        f"identical values): {bad} — cast the oracle SQL (e.g. "
        f"CAST(SUM(...) AS BIGINT) for DuckDB HUGEINT)"
    )
