"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All pure JVM expressions over the documents table; every operator has
an exact DuckDB-SQL twin (generated from operators/constants.py) for
the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shaha_spark.functions.text import h28, quality_components, tokens
from shaha_spark.operators.constants import (
    FINGERPRINT_K,
    LANG_STOPWORDS,
    MERSENNE_P,
)

#: BPE-ish word-piece pattern: runs of letters, runs of digits, or a
#: single non-space symbol — a crude stand-in for subword tokenizers.
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def token_count(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace token count + BPE-ish piece count per document."""
    toks = tokens(F.col(text_col))
    pieces = F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN))
    return df.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        pieces.cast("bigint").alias("n_pieces"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality components + a combined score in [0, 1].

    score = 0.4·min(n_tokens/100, 1) + 0.3·min(mean_token_len/8, 1)
          + 0.3·min(stopword_ratio/0.2, 1)
    (arbitrary but fixed weights; the value is the *plumbing* — each
    component is a codegen'd expression, no UDF).
    """
    comps = quality_components(F.col(text_col))
    score = (
        F.lit(0.4) * F.least(comps["n_tokens"].cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.3) * F.least(comps["mean_token_len"] / 8.0, F.lit(1.0))
        + F.lit(0.3) * F.least(comps["stopword_ratio"] / 0.2, F.lit(1.0))
    )
    return df.select(
        F.col(id_col),
        comps["n_chars"].alias("n_chars"),
        comps["n_tokens"].alias("n_tokens"),
        comps["mean_token_len"].alias("mean_token_len"),
        comps["stopword_ratio"].alias("stopword_ratio"),
        score.alias("quality"),
    )


def lang_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-overlap language ID: count tokens belonging to each
    language's stopword set; argmax wins, lexicographic tiebreak,
    'und' (undetermined) when no stopword hits at all."""
    toks = tokens(F.col(text_col))
    scores = []
    for lang in sorted(LANG_STOPWORDS):
        stop_arr = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
        scores.append(
            F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).alias(
                f"score_{lang}"
            )
        )
    scored = df.select(F.col(id_col), *scores)
    langs = sorted(LANG_STOPWORDS)
    best = F.lit("und")
    best_score = F.lit(0)
    # forward lexicographic order + strict '>' ⇒ ties keep the earlier name
    for lang in langs:
        best = F.when(F.col(f"score_{lang}") > best_score, F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, F.col(f"score_{lang}"))
    return scored.select(
        id_col,
        *[F.col(f"score_{lang}").cast("bigint").alias(f"score_{lang}") for lang in langs],
        best.alias("lang_pred"),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-sensitive document fingerprint (rolling-hash style).

    fp = Σ_pos [ ((pos+1)·K mod p) · h28(token_pos) mod p ]  mod p

    Position-weighted so permuted documents differ, commutative in the
    summation so it parallelizes (each term reduced mod p keeps every
    partial in int64). Documents with no tokens get fp = 0.
    """
    toks = tokens(F.col(text_col))
    indexed = F.zip_with(
        toks,
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1))),
        lambda t, i: (i.cast("long") * FINGERPRINT_K % MERSENNE_P) * h28(t) % MERSENNE_P,
    )
    fp = F.when(F.size(toks) > 0, F.aggregate(
        indexed, F.lit(0).cast("long"), lambda acc, v: (acc + v) % MERSENNE_P
    )).otherwise(F.lit(0).cast("long"))
    return df.select(F.col(id_col), fp.alias("fingerprint"))
