"""Stdin source (S2, ref /root/reference/src/source/stdin.rs).

Driver reads stdin (inherently single-process), parallelizes into a
DataFrame. Content hash is None — stdin is not re-readable (ref
stdin.rs:36-38), so the idempotence gate never skips it.
For the unbounded-stream analogue, see shaha_spark.streaming.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql.types import StringType, StructField, StructType

_WORD_SCHEMA = StructType([StructField("word", StringType(), False)])


def stdin_source(spark: SparkSession, stream=None):
    from shaha_spark.sources import SourceResult

    stream = stream if stream is not None else sys.stdin
    lines = [(ln,) for ln in (raw.rstrip("\n").rstrip("\r") for raw in stream) if ln]
    words = spark.createDataFrame(lines, _WORD_SCHEMA)
    return SourceResult(words=words, name="stdin", content_hash=None)
