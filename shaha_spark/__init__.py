"""shaha_spark — a PySpark-native hash-database engine.

A from-scratch reimplementation of the capabilities of the shaha
reference (hash-database builder + reverse-lookup queries, see
/root/reference) as an idiomatic Spark DataFrame pipeline, extended
with large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing).

Layout:
    schema        -- the canonical hash-record schema (ref: src/storage/mod.rs:10-16)
    functions     -- hash expression registry + text/scalar helpers
    pipeline      -- build / append-merge / stats (ref: src/cli/build.rs)
    query         -- reverse-lookup query path (ref: src/storage/parquet.rs:476-570)
    sources       -- wordlist source factories (ref: src/source/)
    operators     -- training-data-pipeline operators (dedup/similarity/text/multimodal)
    streaming     -- Structured Streaming incremental build
"""

__version__ = "0.1.0"

from shaha_spark.schema import HASH_DB_SCHEMA  # noqa: F401
