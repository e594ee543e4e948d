"""End-to-end batch corpus curation: the CCNet/RefinedWeb-style recipe
composed from the operator families, one call from raw documents to a
training-ready corpus.

Stage order (each stage optional, all deterministic):

  1. redaction        — multi-class pattern scrubbing (textops.redact_exprs)
  2. line dedup       — corpus-duplicate line removal (dedup.dedup_duplicate_lines)
  3. quality gate     — Gopher rule filter (textops.gopher_rules)
  4. exact dedup      — lowest-id survivor per content digest (dedup.exact_dedup)
  5. mixture          — temperature resampling per stratum (sampling.temperature_resample)

Scale shape: redaction is a zero-shuffle codegen'd projection; line
dedup and the quality gate are each one explode + doc-id-keyed
reassembly; exact dedup is one digest-keyed agg; the mixture stage is a
broadcast filter. No collect, no global sort, no Python in the data
path.

Stage-boundary materialization: every stage consumes its input TWICE —
once to derive the keep set (line frequencies, Gopher stats, digest
survivors, mixture rates) and once as the side being filtered. Spark
does not share common subplans across a join, so the naive lazy chain
re-derives everything below each stage on BOTH sides, compounding per
stage (measured: 24 parquet scans / 59 exchanges for the 5-stage chain
at sf0.01 — at 100 TB that is 24 corpus reads for one curation pass).
Each twice-consumed stage input is therefore cut with a LAZY
disk-backed ``persist``: nothing runs until the caller's first action
— genuinely nothing, unlike a lazy ``localCheckpoint``, which AQE
materializes at DataFrame-construction time (ROUND9 §7b discovery;
migrated r10) — and both consumers then share ONE computation of the
stage below, so the whole chain executes each stage exactly once
(4 scans total, one per materialized boundary). DISK_ONLY keeps the
corpus-scale stage outputs out of the executor memory tier — the same
local-storage residency the old checkpoint had, now visible to the
plan lint. This is the in-engine analog of what a production 100 TB
curation run does anyway: persist each stage's output to the lake
before deriving corpus-wide statistics from it. The cache entries
drop via ``spark.catalog.clearCache()`` or unpersist; in a long-lived
ingest session release them between pipeline runs (see
shaha_spark/caching.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

from shaha_spark.operators.dedup import dedup_duplicate_lines, exact_dedup
from shaha_spark.operators.sampling import temperature_resample
from shaha_spark.operators.textops import gopher_rules, redact_exprs


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    patterns: dict[str, str] | None = None,
    line_dedup: bool = True,
    min_line_docs: int = 2,
    line_sep: str = "\n",
    gopher: bool = True,
    exact: bool = True,
    mix_col: str | None = None,
    mix_alpha: float = 0.7,
    mix_budget: int | None = None,
    salt: str = "curate",
) -> DataFrame:
    """Run the curation chain; returns the surviving documents with the
    same columns as the input (``text_col`` rewritten by the redaction
    and line-dedup stages).

    Stages toggle independently: ``patterns=None`` skips redaction,
    ``mix_col=None`` skips the mixture stage. The result is lazy — one
    action executes the whole chain.
    """
    out = docs
    other_cols = [c for c in docs.columns if c != text_col]

    # lazy stage boundary: both consumers of the stage input (keep-set
    # derivation + the filtered side) share one computation — see the
    # module docstring for the measured cost of omitting this. Every
    # barrier is registered on the returned DataFrame so one
    # caching.release(result) drops the whole chain's cache entries
    # after the caller materializes.
    pinned: list[DataFrame] = []

    def barrier(df: DataFrame) -> DataFrame:
        p = df.persist(StorageLevel.DISK_ONLY)
        pinned.append(p)
        return p

    if patterns is not None:
        redacted, _counts = redact_exprs(text_col, patterns)
        out = out.select(*other_cols, redacted.alias(text_col))

    if line_dedup:
        out = barrier(out)
        cleaned = dedup_duplicate_lines(
            out,
            text_col=text_col,
            id_col=id_col,
            min_docs=min_line_docs,
            sep=line_sep,
        )
        out = cleaned.join(out.select(*other_cols), id_col)

    if gopher:
        out = barrier(out)
        keep_ids = (
            gopher_rules(out, text_col=text_col, id_col=id_col)
            .where(F.col("keep") == 1)
            .select(id_col)
        )
        out = out.join(keep_ids, id_col, "left_semi")

    if exact:
        out = barrier(out)
        survivors = exact_dedup(out, text_col=text_col, id_col=id_col).select(
            id_col
        )
        out = out.join(survivors, id_col, "left_semi")

    if mix_col is not None:
        out = barrier(out)
        out = temperature_resample(
            out, mix_col, id_col, alpha=mix_alpha, budget=mix_budget, salt=salt
        )

    from shaha_spark.caching import registers

    return registers(out.select(*docs.columns), *pinned)
