"""Corpus-level term statistics and eval-set decontamination.

Training-data-pipeline extensions (no reference counterpart — the
reference engine has no corpus analytics surface): term/document
frequencies for vocabulary curation, and n-gram-overlap
decontamination, the standard guard against benchmark leakage into a
training corpus.

Scale shapes:

* ``term_stats`` — explode → (doc, term) hash-agg → term hash-agg →
  join back on term. Both aggregations take map-side partials; the
  tf⨝df join shuffles on the term key (AQE broadcasts the df side
  when the vocabulary is small). The corpus-size scalar joins via a
  1-row broadcast, never a window over a single partition.
* ``word_ngrams`` — posexplode + per-doc window with ``lead``: the
  gram assembly is whole-stage-codegen'd, one shuffle on doc id, and
  the output carries distinct (doc, gram) pairs only.
* ``decontaminate`` — distinct eval grams semi-joined against train
  grams on the gram key: one shuffle each side, output bounded by the
  train corpus. At 100 TB you would hash grams to 64-bit before the
  join (xxhash64) to shrink shuffle width; the string key is kept here
  so the DuckDB oracle can join on the same value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tokens(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, term) pairs, empties dropped — whitespace tokenization."""
    return docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")


def term_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per (doc, term): term frequency, document frequency, corpus size,
    and a ratio-idf weight ``tf * (n_docs / df)``.

    The weight deliberately uses the raw inverse-frequency ratio rather
    than its logarithm: one IEEE division and one multiplication are
    bit-identical across engines, while ``ln`` is only
    faithfully-rounded (≤1 ulp) and may disagree between libm
    implementations — callers wanting log damping apply it to the
    returned integer columns.
    """
    tf = (
        tokens(docs, text_col, id_col)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df as a window over tf, NOT tf.groupBy(term) joined back: a
    # groupBy fork would make tf a diamond dependency and re-evaluate
    # the whole explode+aggregate subtree once per branch (two corpus
    # scans — the same trap the LSH pair generator had). The window
    # keeps one lineage: tf is computed once, reshuffled by term, and
    # each row picks up its term's doc count in place.
    df_w = F.count(F.lit(1)).over(Window.partitionBy("term"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.withColumn("df", df_w)
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            "n_docs",
            (
                F.col("tf").cast("double")
                * (F.col("n_docs").cast("double") / F.col("df").cast("double"))
            ).alias("weight"),
        )
    )


def word_ngrams(
    docs: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct (id, gram) word n-grams, space-joined.

    posexplode keeps token order through the per-doc window; ``lead``
    assembles each gram inside codegen, and rows whose window runs off
    the document end (fewer than n tokens remain) are dropped by the
    null check on the furthest lead.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    ).filter(F.col("w") != "")
    if n == 1:
        return toks.select(id_col, F.col("w").alias("gram")).distinct()
    w = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", i).over(w) for i in range(1, n)]
    # gram and the off-end check must be projected TOGETHER, before any
    # filter: a later re-projection would re-evaluate the lead windows
    # on the filtered frame and pair tokens across dropped rows
    assembled = toks.select(
        F.col(id_col),
        F.concat_ws(" ", *parts).alias("gram"),
        parts[-1].alias("_last"),
    )
    return (
        assembled.filter(F.col("_last").isNotNull())
        .select(id_col, "gram")
        .distinct()
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag training documents sharing any word n-gram with an eval set.

    Returns every train row's id with ``n_shared_grams`` (distinct
    grams also present anywhere in the eval set) and a ``contaminated``
    flag — the caller drops or audits flagged docs. Exact-match n-gram
    overlap is the standard first-line benchmark-decontamination check.
    """
    train_grams = word_ngrams(train, n, text_col, id_col)
    eval_grams = word_ngrams(eval_df, n, text_col, id_col).select("gram").distinct()
    shared = (
        train_grams.join(eval_grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
    return (
        train.select(id_col)
        .join(shared, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
            (F.coalesce("n_shared_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )
