"""Positional inverted index + exact phrase search over a document
corpus — the retrieval half of a corpus-curation stack (the reference
engine is lookup-only; ref src/query.rs:30-74 is the single-key
analogue of the postings lookup).

Scale shape: postings are one posexplode away from the text (map-side,
no shuffle); every downstream operation — document frequency, phrase
matching — is keyed by term or (doc, position), so the work
distributes on exactly the columns a 1000-executor cluster would
partition by. Phrase search never scans text: it joins the postings of
the phrase's terms position-by-position, which at 100 TB touches only
the index rows of the phrase terms (predicate pushdown on ``term``
reaches the parquet scan when the postings are stored term-sorted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import re

from shaha_spark.functions.text import tokens
from shaha_spark.operators.constants import TOKEN_SPLIT_RE
from shaha_spark.util import ensure_parallelism


def _phrase_terms(phrase: str) -> list[str]:
    """Tokenize a query phrase with the SAME whitespace class documents
    are indexed with (TOKEN_SPLIT_RE) — splitting on a literal space
    would turn a tab/newline-containing phrase into terms that can
    never match any posting, silently returning zero matches."""
    return [t for t in re.split(TOKEN_SPLIT_RE, phrase) if t]


def postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional postings: one row per token occurrence
    ``(term, doc_id, pos)`` with 0-based positions."""
    return ensure_parallelism(docs).select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
    ).select("term", id_col, "pos")


def postings_stats(
    docs: DataFrame,
    top: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-term index statistics: document frequency and total
    occurrences, top-``top`` by (df desc, term asc). One hash
    aggregation over the postings; the order-by feeds a limit, so it
    plans as TakeOrderedAndProject (no global sort materialization)."""
    p = postings(docs, text_col, id_col)
    return (
        p.groupBy("term")
        .agg(
            F.countDistinct(id_col).alias("doc_freq"),
            F.count(F.lit(1)).alias("total_occurrences"),
        )
        .orderBy(F.col("doc_freq").desc(), F.col("term").asc())
        .limit(top)
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase matching via the positional index: a document
    matches at position p iff term_i of the phrase occurs at p + i for
    every i. Returns ``(doc_id, n_matches)`` for matching documents.

    The k-way position join is keyed on (doc_id, aligned position) —
    an equi-join per phrase term, each reading only that term's
    postings. No text rescan, no cross join; duplicate-heavy phrase
    terms stay safe because every join key includes the position.
    """
    terms = _phrase_terms(phrase)
    if not terms:
        raise ValueError("empty phrase")
    p = postings(docs, text_col, id_col)

    # Anchor the join chain at the RAREST phrase term: a stopword-heavy
    # phrase ("the fast ...") would otherwise flood the first join with
    # the stopword's postings. The per-term counts are a k-row
    # aggregate (k = phrase length) — a model-sized driver read, the
    # same budget as broadcasting a centroid table. Join order does not
    # change the result (inner equi-joins commute); it changes the size
    # of the largest intermediate from max(term df) to min(term df).
    counts = dict(
        p.where(F.col("term").isin(terms))
        .groupBy("term")
        .count()
        .collect()
    )
    order = sorted(
        range(len(terms)), key=lambda i: (counts.get(terms[i], 0), i)
    )

    def aligned(i: int):
        return p.where(F.col("term") == terms[i]).select(
            F.col(id_col),
            (F.col("pos") - F.lit(i)).alias("start"),
        )

    acc = aligned(order[0])
    for i in order[1:]:
        acc = acc.join(aligned(i), [id_col, "start"])
    return (
        acc.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


# ------------------------------------------------------- DuckDB twins

def _postings_cte(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    return f"""p AS (
  SELECT term, {id_col}, pos FROM (
    SELECT {id_col}, unnest(l) AS term,
           unnest(range(0, len(l))) AS pos
    FROM (SELECT {id_col},
                 list_filter(regexp_split_to_array({text_col}, '[ \\t\\n\\r]+'), x -> x <> '') AS l
          FROM {table})
  )
)"""


def postings_stats_sql(
    table: str,
    top: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    return f"""WITH {_postings_cte(table, text_col, id_col)}
SELECT term,
  CAST(count(DISTINCT {id_col}) AS BIGINT) AS doc_freq,
  CAST(count(*) AS BIGINT) AS total_occurrences
FROM p GROUP BY term
ORDER BY doc_freq DESC, term ASC LIMIT {top}"""


def phrase_search_sql(
    table: str,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    terms = _phrase_terms(phrase)
    joins = []
    for i, t in enumerate(terms):
        esc = t.replace("'", "''")
        joins.append(
            f"(SELECT {id_col}, pos - {i} AS start FROM p WHERE term = '{esc}') t{i}"
        )
    frm = joins[0]
    for i in range(1, len(terms)):
        frm += f" JOIN {joins[i]} USING ({id_col}, start)"
    return f"""WITH {_postings_cte(table, text_col, id_col)}
SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_matches
FROM {frm} GROUP BY {id_col}"""
