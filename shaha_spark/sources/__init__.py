"""Wordlist sources — DataFrame-producing factories.

Mirrors the reference's ``Source`` trait + spec dispatcher (ref
/root/reference/src/source/mod.rs:15-43). Each factory returns a
one-column ``DataFrame[word: string]`` of non-empty lines plus a
driver-side blake3 content hash used by the idempotence ledger
(H10, ref src/source/file.rs:43-56).

Spec grammar (ref src/source/mod.rs:21-43):
    "-"            → stdin
    "http(s)://…"  → URL fetch
    "seclists:p"   → file under the SecLists cache clone
    "aspell:lang"  → aspell dictionary dump
    anything else  → local file path
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from shaha_spark.sources.aspell import aspell_source
from shaha_spark.sources.file import file_source
from shaha_spark.sources.seclists import seclists_source
from shaha_spark.sources.stdin import stdin_source
from shaha_spark.sources.url import url_source


@dataclass
class SourceResult:
    """A resolved source: its words DataFrame, display name, and
    content fingerprint (None when unhashable, e.g. stdin —
    ref src/source/stdin.rs:36-38)."""

    words: DataFrame
    name: str
    content_hash: str | None


def parse_source(spark: SparkSession, spec: str) -> SourceResult:
    """Spec dispatcher (S6, ref src/source/mod.rs:21-43)."""
    if spec == "-":
        return stdin_source(spark)
    if spec.startswith(("http://", "https://")):
        return url_source(spark, spec)
    if spec.startswith("seclists:"):
        return seclists_source(spark, spec.split(":", 1)[1])
    if spec.startswith("aspell:"):
        return aspell_source(spark, spec.split(":", 1)[1])
    return file_source(spark, spec)
