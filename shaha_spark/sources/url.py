"""URL source (S3, ref /root/reference/src/source/url.rs).

Blocking fetch at construction time, body cached driver-side, then
parallelized. Mirrors reference quirks: the body is accepted even on
non-2xx status (ref tests/integration.rs:521-539), and the source name
is the last path segment of the URL (falling back to the host).
"""

from __future__ import annotations

import urllib.request
from urllib.parse import urlparse

from pyspark.sql import SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from shaha_spark.functions.blake3_pure import blake3

_WORD_SCHEMA = StructType([StructField("word", StringType(), False)])


def url_name(url: str) -> str:
    parsed = urlparse(url)
    segments = [s for s in parsed.path.split("/") if s]
    return segments[-1] if segments else (parsed.netloc or "url")


def url_source(spark: SparkSession, url: str, timeout: float = 30.0):
    from shaha_spark.sources import SourceResult

    req = urllib.request.Request(url, headers={"User-Agent": "shaha-spark"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
    except urllib.error.HTTPError as err:
        # non-2xx body still accepted (ref tests/integration.rs:521-539)
        body = err.read()
    text = body.decode("utf-8", errors="replace")
    rows = [(ln,) for ln in text.splitlines() if ln]
    words = spark.createDataFrame(rows, _WORD_SCHEMA)
    return SourceResult(
        words=words, name=url_name(url), content_hash=blake3(body).hex()
    )
