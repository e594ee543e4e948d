"""Streaming document curation: the stateless curation stages composed
on an unbounded stream.

Mixture sampling (hash-threshold membership) and multi-class redaction
are pure per-row projections/filters — no state, no watermark, no
output-mode constraints — so the SAME expressions the batch operators
compile run unchanged in a micro-batch plan, and a row admitted/
redacted by the stream is byte-identical to what the batch pipeline
would have produced (hash membership is partition- and batch-invariant
by construction). Stateful curation stages (corpus-level scoring,
near-dup removal) belong in foreachBatch against persisted state — see
streaming/build_stream.py and operators/dedup.incremental_minhash_dedup
for those shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from shaha_spark.operators.sampling import stratified_hash_sample
from shaha_spark.operators.textops import redact_exprs


def stream_curate(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    stratum_col: str = "lang",
    mix_rates: dict[str, float] | None = None,
    patterns: dict[str, str] | None = None,
    salt: str = "mix",
) -> DataFrame:
    """Admit documents per-stratum at target mixture rates, then scrub
    pattern classes — all columns pass through, plus ``redacted`` and
    per-class ``n_<class>`` counts. Works identically on batch and
    streaming DataFrames (stateless projections only).
    """
    out = docs
    if mix_rates is not None:
        out = stratified_hash_sample(out, stratum_col, mix_rates, key_col, salt=salt)
    redacted, counts = redact_exprs(text_col, patterns)
    return out.select("*", redacted.alias("redacted"), *counts)
