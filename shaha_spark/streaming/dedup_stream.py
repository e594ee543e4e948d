"""Streaming deduplication for continuously-arriving documents.

The batch dedup operators (operators/dedup.py) assume a closed corpus;
a training-data INGEST pipeline sees an unbounded stream and must drop
duplicates with BOUNDED state. Two tiers:

  * ``stream_exact_dedup`` — content-digest dedup via
    ``dropDuplicatesWithinWatermark``: state holds one digest per
    document seen within the watermark horizon and is evicted as event
    time advances, so state size tracks the horizon's document rate,
    not stream history. (Plain dropDuplicates on a stream would grow
    state forever — the classic unbounded-state bug.)
  * ``stream_minhash_signatures`` — the per-document MinHash signature
    is a stateless projection + per-document aggregation, so the batch
    shape lifts directly onto a stream; emitted signatures feed an
    offline (micro-batch or nightly) LSH banding pass. LSH candidate
    PAIRING is deliberately not streamed: pairs need a self-join over
    the banded corpus, which Structured Streaming cannot express with
    bounded state — production systems window it (join the batch's
    signatures against the accumulated signature store in foreachBatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    horizon: str = "1 hour",
) -> DataFrame:
    """Exact near-line dedup: first document per content digest within
    the watermark horizon survives; re-arrivals inside the horizon are
    dropped; state for digests older than the horizon is evicted.

    Emits the surviving rows with their content digest attached.
    """
    return (
        docs.withColumn("content_md5", F.md5(F.col(text_col)))
        .withWatermark(ts_col, horizon)
        .dropDuplicatesWithinWatermark(["content_md5"])
    )


def stream_minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    horizon: str = "1 hour",
) -> DataFrame:
    """Per-document MinHash signatures on a stream.

    Same explode → codegen'd shingle hash → partial-min groupBy shape
    as the batch operator (operators/dedup.minhash_signatures), with the
    document id + event time as the (watermarked) group key so the
    aggregation state is evicted once a document's window passes.
    """
    from shaha_spark.functions.text import h28, shingles, tokens
    from shaha_spark.operators.constants import (
        MERSENNE_P,
        MINHASH_PERMS,
        MINHASH_SENTINEL,
        SHINGLE_N,
    )

    # Same two construction/per-task optimizations as the batch twin
    # (operators/dedup.minhash_signatures, optimization round 12):
    # tokens materialized before the shingle transform, and the k
    # permutation aggregates parsed from ONE SQL string each. Values
    # are bit-identical, so batch≡stream identity is preserved.
    sh = shingles(F.col("__toks"), SHINGLE_N)
    hashed = (
        docs.withWatermark(ts_col, horizon)
        .select(F.col(id_col), F.col(ts_col), tokens(F.col(text_col)).alias("__toks"))
        .select(F.col(id_col), F.col(ts_col), F.explode_outer(sh).alias("__shingle"))
        .select(F.col(id_col), F.col(ts_col), h28(F.col("__shingle")).alias("__h"))
    )
    aggs = [
        F.expr(
            f"coalesce(min((CAST({a} AS BIGINT) * __h + {b}) % "
            f"{MERSENNE_P}), CAST({MINHASH_SENTINEL} AS BIGINT))"
        ).alias(f"mh_{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS)
    ]
    return hashed.groupBy(id_col, ts_col).agg(*aggs)
