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


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 lexical retrieval: top-``k`` documents for a bag of query
    terms (Robertson/Sparck Jones; the Lucene-style idf
    ``ln((N - n + 0.5)/(n + 0.5) + 1)``, non-negative by construction).

    Scale shape: ONE hash aggregation over the token stream computes
    each document's length and its per-query-term frequencies
    simultaneously (the query is a handful of terms, so the tf columns
    pivot into the same map-side-combining agg — no second scan, no
    join against a corpus-sized length table). Everything joined
    afterwards is model-sized and broadcast: the |query_terms|-row
    document-frequency table and the 1-row corpus stats. The final
    top-k is sort+limit (TakeOrderedAndProject) and the rank window
    runs over k rows.

    Cross-engine determinism (:func:`bm25_topk_sql` replays this
    exactly): constants ``k1+1``, ``k1(1-b)``, ``k1·b`` are folded in
    PYTHON once and embedded verbatim in both plans;
    ``dl/avgdl`` is computed as exact-integer ``dl·N`` divided by the
    exact-integer token total (one IEEE division); the idf's ``ln`` is
    rounded to 9 decimals (libm last-ULP differences cannot straddle at
    1e-9 — the established rounded-ln recipe); each per-term score is
    quantized to DECIMAL(18,6) BEFORE the per-document sum, so the sum
    is exact and order-independent, and ties in the top-k order break
    on ``id_col``.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")
    from pyspark.sql import Window

    c_num = float(k1 + 1.0)
    c_add = float(k1 * (1.0 - b))
    c_mul = float(k1 * b)

    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), TOKEN_SPLIT_RE)).alias("term"),
    ).filter(F.col("term") != "")
    # one pass: dl + per-query-term tf via conditional aggregation
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"__tf_{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    stacked = per_doc.select(
        F.col(id_col),
        F.col("dl"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("term"),
                        F.col(f"__tf_{i}").alias("tf"),
                    )
                    for i, t in enumerate(query_terms)
                ]
            )
        ).alias("e"),
    ).select(id_col, "dl", F.col("e.term").alias("term"), F.col("e.tf").alias("tf"))
    matched = stacked.filter(F.col("tf") > 0)
    df_t = matched.groupBy("term").agg(F.count(F.lit(1)).alias("n_t"))
    stats = (
        docs.agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(toks.agg(F.count(F.lit(1)).alias("n_toks")))
    )
    idf = F.round(
        F.log(
            (
                (F.col("n_docs") - F.col("n_t")).cast("double") + F.lit(0.5)
            )
            / (F.col("n_t").cast("double") + F.lit(0.5))
            + F.lit(1.0)
        ),
        9,
    )
    dn = (F.col("dl") * F.col("n_docs")).cast("double") / F.col("n_toks").cast(
        "double"
    )
    denom = (F.col("tf").cast("double") + F.lit(c_add)) + (F.lit(c_mul) * dn)
    num = F.col("tf").cast("double") * F.lit(c_num)
    comp = F.round(idf * (num / denom), 6).cast("decimal(18,6)")
    scored = (
        matched.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), comp.alias("comp"))
        .groupBy(id_col)
        .agg(F.sum("comp").alias("__score_dec"))
    )
    w = Window.orderBy(F.col("__score_dec").desc(), F.col(id_col).asc())
    return (
        scored.orderBy(F.col("__score_dec").desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            F.col(id_col),
            F.col("__score_dec").cast("double").alias("score"),
            F.row_number().over(w).alias("rank"),
        )
    )


def bm25_topk_sql(
    table: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bm25_topk` — identical constants, op
    order, rounded-ln recipe, and DECIMAL(18,6) pre-sum quantization."""
    c_num = float(k1 + 1.0)
    c_add = float(k1 * (1.0 - b))
    c_mul = float(k1 * b)
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return f"""WITH toks AS (
  SELECT {id_col},
         unnest(list_filter(regexp_split_to_array({text_col}, '[ \\t\\n\\r]+'), x -> x <> '')) AS term
  FROM {table}
),
dl AS (SELECT {id_col}, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM {table}) AS n_docs,
         (SELECT count(*) FROM toks) AS n_toks
),
tf AS (
  SELECT {id_col}, term, count(*) AS tf FROM toks
  WHERE term IN ({in_list}) GROUP BY 1, 2
),
df AS (SELECT term, count(*) AS n_t FROM tf GROUP BY 1),
scored AS (
  SELECT tf.{id_col},
    CAST(round(
      round(ln((CAST(s.n_docs - df.n_t AS DOUBLE) + 0.5)
               / (CAST(df.n_t AS DOUBLE) + 0.5) + 1.0), 9)
      * ((CAST(tf.tf AS DOUBLE) * {c_num!r})
         / ((CAST(tf.tf AS DOUBLE) + {c_add!r})
            + ({c_mul!r} * (CAST(dl.dl * s.n_docs AS DOUBLE)
                            / CAST(s.n_toks AS DOUBLE))))),
      6) AS DECIMAL(18,6)) AS comp
  FROM tf JOIN dl USING ({id_col}) CROSS JOIN stats s JOIN df USING (term)
),
agg AS (SELECT {id_col}, SUM(comp) AS score_dec FROM scored GROUP BY 1)
SELECT {id_col}, CAST(score_dec AS DOUBLE) AS score,
       CAST(row_number() OVER (ORDER BY score_dec DESC, {id_col} ASC) AS INT) AS rank
FROM agg ORDER BY score_dec DESC, {id_col} ASC LIMIT {k}"""
