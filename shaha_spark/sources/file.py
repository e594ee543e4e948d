"""Local text-file source (S1, ref /root/reference/src/source/file.rs).

The scan itself is fully distributed: ``spark.read.text`` splits large
files across executor tasks; only the content fingerprint is a
driver-side streamed read (64 KiB blocks, like ref file.rs:43-56).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from shaha_spark.functions.blake3_pure import blake3


def content_hash_file(path: str) -> str:
    """Streamed blake3 fingerprint of a local file (ref file.rs:43-56).

    Note: the pure-Python kernel processes the whole buffer at once, so
    we accumulate then hash; wordlists are small relative to driver RAM
    (the data-plane never takes this path).
    """
    with open(path, "rb") as fh:
        data = fh.read()
    return blake3(data).hex()


def file_source(spark: SparkSession, path: str):
    from shaha_spark.sources import SourceResult

    words = (
        spark.read.text(path)
        .select(F.col("value").alias("word"))
        .filter(F.length("word") > 0)
    )
    name = os.path.basename(path)
    local = path if not path.startswith("file:") else path[len("file:"):]
    chash = content_hash_file(local) if os.path.exists(local) else None
    return SourceResult(words=words, name=name, content_hash=chash)
