"""URL source (S3, ref /root/reference/src/source/url.rs).

Blocking fetch at construction time, STREAMED to a cache file in
bounded chunks, then parsed through the same distributed
``spark.read.text`` path as file sources — the download is never
materialized as a Python row list, so a multi-GB remote wordlist is
bounded by disk, not driver memory. Mirrors reference quirks: the body
is accepted even on non-2xx status (ref tests/integration.rs:521-539),
and the source name is the last path segment of the URL (falling back
to the host).

On a multi-node cluster, pass ``cache_dir`` on shared storage (NFS
mount) so executors can read the cached file — or pre-stage the list
onto HDFS/S3 and use the file source directly.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import urllib.request
from urllib.parse import urlparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from shaha_spark.sources.file import content_hash_file

_CHUNK = 1 << 20  # 1 MiB download chunks


def url_name(url: str) -> str:
    parsed = urlparse(url)
    segments = [s for s in parsed.path.split("/") if s]
    return segments[-1] if segments else (parsed.netloc or "url")


def _cache_file(url: str, cache_dir: str | None) -> str:
    root = cache_dir or os.path.join(tempfile.gettempdir(), "shaha_url_cache")
    os.makedirs(root, exist_ok=True)
    # keyed by URL so repeated builds overwrite the same slot; the file
    # must outlive this call — the returned DataFrame reads it lazily
    return os.path.join(root, hashlib.md5(url.encode()).hexdigest() + ".txt")


def url_source(
    spark: SparkSession,
    url: str,
    timeout: float = 30.0,
    cache_dir: str | None = None,
):
    from shaha_spark.sources import SourceResult

    req = urllib.request.Request(url, headers={"User-Agent": "shaha-spark"})
    path = _cache_file(url, cache_dir)

    def stream_to(fh, resp) -> None:
        while True:
            chunk = resp.read(_CHUNK)
            if not chunk:
                return
            fh.write(chunk)

    with open(path, "wb") as fh:
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                stream_to(fh, resp)
        except urllib.error.HTTPError as err:
            # non-2xx body still accepted (ref tests/integration.rs:521-539)
            stream_to(fh, err)

    words = (
        spark.read.text(path)
        .select(F.col("value").alias("word"))
        .filter(F.length("word") > 0)
    )
    return SourceResult(
        words=words, name=url_name(url), content_hash=content_hash_file(path)
    )
