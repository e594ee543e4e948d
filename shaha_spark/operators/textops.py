"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All pure JVM expressions over the documents table; every operator has
an exact DuckDB-SQL twin (generated from operators/constants.py) for
the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shaha_spark.functions.text import h28, tokens
from shaha_spark.operators.constants import (
    FINGERPRINT_K,
    LANG_STOPWORDS,
    MERSENNE_P,
    QUALITY_STOPWORDS,
)
from shaha_spark.util import ensure_parallelism

#: Per-task input appetite for the regex-heavy per-token scorers here:
#: measured optimum ~0.5 MB/task (optimization round 13 — quality_score
#: over the 3.5 MB sf0.1 corpus: 0.70 s at 8 tasks vs 0.95 single-task
#: vs 1.07 at 32 on local[32]); these operators run several regexes per
#: token, so their per-byte CPU is ~8x the shingle/hash operators'
#: 4 MiB default in shaha_spark.util.
_TEXT_CHUNK_BYTES = 512 * 1024

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
    (arbitrary but fixed weights; the value is the *plumbing*).

    Explode + partial-agg shape (same as minhash_signatures): per-token
    work (length, stopword membership) runs inside whole-stage codegen —
    higher-order-function lambdas would evaluate interpreted per token —
    and the groupBy combines map-side, so the shuffle carries three
    longs per document. n_chars rides along as a grouping key (it is
    functionally dependent on the document), avoiding a join.
    Ratios are single IEEE divisions of exact integer operands — bit
    reproducible across engines unrounded (rounding would actually HURT
    parity at half-ulp boundaries).
    """
    stop_arr = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    base = ensure_parallelism(df, chunk_bytes=_TEXT_CHUNK_BYTES).select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
        F.explode_outer(tokens(F.col(text_col))).alias("__tok"),
    )
    agg = base.groupBy(id_col, "n_chars").agg(
        F.count("__tok").alias("n_tokens"),  # count() skips the null of tokenless docs
        F.coalesce(F.sum(F.length("__tok")), F.lit(0)).alias("__sum_len"),
        F.coalesce(
            F.sum(F.when(F.array_contains(stop_arr, F.col("__tok")), 1).otherwise(0)),
            F.lit(0),
        ).alias("__n_stop"),
    )
    n_tok = F.col("n_tokens")
    mean_tok_len = F.when(
        n_tok > 0, F.col("__sum_len").cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tok > 0, F.col("__n_stop").cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(n_tok.cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.3) * F.least(mean_tok_len / 8.0, F.lit(1.0))
        + F.lit(0.3) * F.least(stop_ratio / 0.2, F.lit(1.0))
    )
    return agg.select(
        F.col(id_col),
        F.col("n_chars"),
        n_tok.cast("bigint").alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality"),
    )


def lang_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-overlap language ID: count tokens belonging to each
    language's stopword set; argmax wins, lexicographic tiebreak,
    'und' (undetermined) when no stopword hits at all.

    Explode + partial-agg shape: one pass over exploded tokens computes
    all per-language membership flags in codegen; the groupBy combines
    map-side (shuffle = one long per language per document)."""
    langs = sorted(LANG_STOPWORDS)
    base = ensure_parallelism(df, chunk_bytes=_TEXT_CHUNK_BYTES).select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("__tok")
    )
    aggs = []
    for lang in langs:
        stop_arr = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
        aggs.append(
            F.coalesce(
                F.sum(
                    F.when(F.array_contains(stop_arr, F.col("__tok")), 1).otherwise(0)
                ),
                F.lit(0),
            ).alias(f"score_{lang}")
        )
    scored = base.groupBy(id_col).agg(*aggs)
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


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_tokens: int = 90,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021, §A.1.1):
    token-count bounds, mean-token-length bounds, symbol-token ratio,
    alphabetic-token ratio, and a minimum stopword-hit count. Returns
    every document with its metrics, one 0/1 flag per rule, and the
    conjunctive ``keep`` decision — the caller filters or audits.

    One explode + map-side-combining hash-agg computes every metric in
    a single pass (same shape as :func:`quality_score`); all per-token
    predicates are character-class-only regexes with identical
    semantics in Java regex and DuckDB's RE2, so the oracle replays the
    flags bit-for-bit. Ratios are single IEEE divisions of exact
    integer operands compared against shared literals — no rounding, no
    drift.
    """
    stop_arr = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    base = ensure_parallelism(df, chunk_bytes=_TEXT_CHUNK_BYTES).select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("__tok")
    )
    agg = base.groupBy(id_col).agg(
        F.count("__tok").alias("n_tokens"),
        F.coalesce(F.sum(F.length("__tok")), F.lit(0)).alias("__sum_len"),
        F.coalesce(
            F.sum(F.when(F.col("__tok").rlike("[a-zA-Z]"), 1).otherwise(0)), F.lit(0)
        ).alias("__n_alpha"),
        F.coalesce(
            F.sum(F.when(F.col("__tok").rlike("[^a-zA-Z0-9]"), 1).otherwise(0)),
            F.lit(0),
        ).alias("__n_sym"),
        F.coalesce(
            F.sum(F.when(F.array_contains(stop_arr, F.col("__tok")), 1).otherwise(0)),
            F.lit(0),
        ).alias("__n_stop"),
    )
    n_tok = F.col("n_tokens")
    mean_len = F.when(
        n_tok > 0, F.col("__sum_len").cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    sym_ratio = F.when(
        n_tok > 0, F.col("__n_sym").cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        n_tok > 0, F.col("__n_alpha").cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    with_metrics = agg.select(
        F.col(id_col),
        n_tok.cast("bigint").alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        sym_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        F.col("__n_stop").cast("bigint").alias("n_stopwords"),
    )
    p_count = (
        (F.col("n_tokens") >= min_tokens) & (F.col("n_tokens") <= max_tokens)
    ).cast("int")
    p_mean = (
        (F.col("mean_token_len") >= min_mean_len)
        & (F.col("mean_token_len") <= max_mean_len)
    ).cast("int")
    p_sym = (F.col("symbol_ratio") <= max_symbol_ratio).cast("int")
    p_alpha = (F.col("alpha_ratio") >= min_alpha_ratio).cast("int")
    p_stop = (F.col("n_stopwords") >= min_stop_hits).cast("int")
    return with_metrics.select(
        "*",
        p_count.alias("pass_count"),
        p_mean.alias("pass_mean_len"),
        p_sym.alias("pass_symbols"),
        p_alpha.alias("pass_alpha"),
        p_stop.alias("pass_stopwords"),
        (p_count * p_mean * p_sym * p_alpha * p_stop).alias("keep"),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-sensitive document fingerprint (rolling-hash style).

    fp = Σ_pos [ ((pos+1)·K mod p) · h28(token_pos) mod p ]  mod p

    Position-weighted so permuted documents differ, commutative in the
    summation so it parallelizes. Documents with no tokens get fp = 0.

    posexplode + partial-agg shape (the pattern proven for MinHash): the
    per-token md5 inside h28 runs once per token in whole-stage codegen
    — the previous zip_with/aggregate lambdas evaluated it interpreted —
    and the groupBy sum combines map-side, so the shuffle carries one
    long per document. Each term is < 2^31, so the int64 running sum is
    safe below ~2^32 tokens per document; the final mod p happens once.
    """
    pos_tok = ensure_parallelism(df, chunk_bytes=_TEXT_CHUNK_BYTES).select(
        F.col(id_col), F.posexplode_outer(tokens(F.col(text_col))).alias("__pos", "__tok")
    )
    term = (
        (F.col("__pos") + 1).cast("long") * FINGERPRINT_K % MERSENNE_P
    ) * h28(F.col("__tok")) % MERSENNE_P
    terms = pos_tok.select(
        F.col(id_col), F.coalesce(term, F.lit(0).cast("long")).alias("__term")
    )
    return terms.groupBy(id_col).agg(
        (F.sum("__term") % MERSENNE_P).cast("long").alias("fingerprint")
    )


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy over characters (bits/char) — the
    cheap gibberish/binary-junk screen of web-corpus curation: natural
    prose sits ~3.5-4.5 bits, base64/hex blobs and key-mash junk score
    far higher, single-char spam near zero. Returns
    ``[id_col, n_chars, n_distinct_chars, entropy]``; empty documents
    get entropy 0.

    Determinism recipe (the unigram-LM pattern): each distinct
    (doc, char) contributes ``round(p·ln(p)/ln(2), 8)`` evaluated once,
    summed as DECIMAL — order-free exact addition, so the score is
    bit-stable across engines and partitionings.

    Scale shape: one character explode (codegen'd split) + one
    (doc, char) hash-agg with map-side combine + a per-doc count window
    over the ≤|alphabet| distinct-char rows (single lineage, no
    diamond) + one doc hash-agg. The shuffle after the first agg
    carries at most alphabet-size rows per document.
    """
    from pyspark.sql import Window as W

    chars = ensure_parallelism(df, chunk_bytes=_TEXT_CHUNK_BYTES).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("__ch")
    ).filter(F.col("__ch") != "")
    counts = chars.groupBy(id_col, "__ch").agg(F.count(F.lit(1)).alias("__c"))
    n = F.sum("__c").over(W.partitionBy(id_col))
    p = F.col("__c").cast("double") / F.col("__n").cast("double")
    term = (
        F.round(p * F.log(p) / F.log(F.lit(2.0)), 8)
        .cast("decimal(20,8)")
    )
    per_doc = (
        counts.withColumn("__n", n)
        .select(F.col(id_col), F.col("__n"), term.alias("__t"))
        .groupBy(id_col)
        .agg(
            F.first("__n").alias("n_chars"),
            F.count(F.lit(1)).alias("n_distinct_chars"),
            # + 0.0 canonicalizes the -0.0 a uniform document produces
            (-F.sum("__t").cast("double") + F.lit(0.0)).alias("entropy"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_chars"), F.lit(0)).cast("bigint").alias("n_chars"),
            F.coalesce(F.col("n_distinct_chars"), F.lit(0))
            .cast("bigint")
            .alias("n_distinct_chars"),
            F.coalesce(F.col("entropy"), F.lit(0.0)).alias("entropy"),
        )
    )


def normalize_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    out_col: str = "norm_text",
) -> DataFrame:
    """Canonical text cleanup for dedup keys and tokenizer input:
    lowercase, strip everything outside [a-z0-9 ], collapse whitespace
    runs, trim. The regex subset is deliberately dialect-portable
    (character classes only — identical semantics in Java regex, RE2,
    and DuckDB), so normalized text is a stable cross-engine join key.
    """
    cleaned = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", "")
    collapsed = F.trim(F.regexp_replace(cleaned, " +", " "))
    return df.select(F.col(id_col), collapsed.alias(out_col))


#: default PII-style pattern classes, ordered. Deliberately restricted
#: to a regex subset (character classes, +, {m,n}, literal @ and dots)
#: with identical semantics in Java regex and RE2-family engines, so
#: redacted text stays a stable cross-engine value. Order matters:
#: classes apply sequentially, and earlier rewrites consume their text
#: (an email's digits are gone before the number pass runs).
REDACT_PATTERNS: dict[str, str] = {
    "email": "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+[a-zA-Z]",
    "phone": "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    "number": "[0-9]+",
}


def redact_exprs(col: str, patterns: dict[str, str] | None = None):
    """(redacted Column, [per-class count Columns]) for ``patterns``
    applied in dict order — the shared expression core of
    :func:`redact_patterns` and the streaming curation stage (both
    sides stay a single codegen'd projection)."""
    if patterns is None:
        patterns = REDACT_PATTERNS
    cur = F.col(col)
    counts = []
    for name, pat in patterns.items():
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, f"<{name}>")
    return cur, counts


def redact_patterns(
    df: DataFrame,
    col: str,
    patterns: dict[str, str] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Multi-class scrubbing pass: each pattern class rewrites to its
    own ``<name>`` token, applied in dict order in ONE projection —
    chained regexp_replace stays a single codegen'd expression, no
    second scan per class. Per-class match counts ride along (counted
    on the class's input text, i.e. after earlier classes consumed
    theirs) so a pipeline can audit scrubbing volume per class.
    """
    redacted, counts = redact_exprs(col, patterns)
    return df.select(F.col(id_col), redacted.alias("redacted"), *counts)


def redact_numbers(
    df: DataFrame,
    col: str,
    token: str = "<num>",
    id_col: str = "doc_id",
) -> DataFrame:
    """Redact digit runs from a text column — the plumbing for PII-style
    scrubbing passes (numbers, then emails/phones by swapping the
    pattern).

    The pattern is character-class-only (``[0-9]+``), chosen for
    identical semantics across Java regex, RE2, and DuckDB so redacted
    text remains a stable cross-engine value. Pure JVM expressions in
    codegen: one regexp_replace for the rewrite plus a length
    difference for the redacted-character count — no second scan, no
    Python in the data path."""
    red = F.regexp_replace(F.col(col), "[0-9]+", token)
    n_digits = (
        F.length(F.col(col)) - F.length(F.regexp_replace(F.col(col), "[0-9]", ""))
    ).cast("long")
    return df.select(
        F.col(id_col),
        red.alias("redacted"),
        n_digits.alias("n_digits"),
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 3,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    hash every ``k``-token shingle, slide a window of ``w`` consecutive
    shingle hashes, keep the minimum of each window, distinct the
    survivors. The guarantee: any shared run of ``k + w - 1`` tokens
    between two documents shares at least one fingerprint — the
    position-robust middle ground between exact hashing (too brittle)
    and MinHash (no locality).

    Scale: per-document work only — the min window partitions by
    ``id_col`` (never a global window), and the distinct is one hash
    aggregation over (doc, fingerprint). Documents shorter than
    ``k + w - 1`` tokens degrade gracefully: a single window over
    whatever shingles exist (standard winnowing behavior).

    The shingle hash is the engine's cross-engine-stable h28 (md5
    prefix), so the DuckDB twin produces byte-identical fingerprints.
    """
    from pyspark.sql import Window

    from shaha_spark.functions.text import h28, shingles, tokens
    from shaha_spark.util import ensure_parallelism

    # tokens materialized before the shingle transform (see
    # dedup.minhash_signatures): split once per doc, not per element_at
    grams = ensure_parallelism(df, chunk_bytes=_TEXT_CHUNK_BYTES).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col),
        F.posexplode(shingles(F.col("__toks"), k)).alias("pos", "gram"),
    ).select(id_col, "pos", h28(F.col("gram")).alias("h"))
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    n = Window.partitionBy(id_col)
    return (
        grams.select(
            F.col(id_col),
            F.col("pos"),
            F.min("h").over(win).alias("fingerprint"),
            F.count(F.lit(1)).over(n).alias("__n"),
        )
        .where(F.col("pos") <= F.greatest(F.col("__n") - w, F.lit(0)))
        .select(id_col, "fingerprint")
        .distinct()
    )


def winnow_fingerprints_sql(
    table: str,
    k: int = 3,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle twin of :func:`winnow_fingerprints` (same shingle
    construction as the minhash oracles, same h28)."""
    from shaha_spark.operators.sampling import h28_sql

    gram_expr = " || ' ' || ".join(f"l[i+{j}]" for j in range(k))
    return f"""WITH toks AS (
  SELECT {id_col}, list_filter(regexp_split_to_array({text_col}, '[ \\t\\n\\r]+'), x -> x <> '') AS l
  FROM {table}
),
grams AS (
  SELECT {id_col}, pos,
    {h28_sql('gram')} AS h
  FROM (
    SELECT {id_col}, unnest(range(1, len(g) + 1)) AS pos, unnest(g) AS gram
    FROM (
      SELECT {id_col},
        CASE WHEN len(l) >= {k}
          THEN list_transform(range(1, len(l) - {k} + 2), i -> {gram_expr})
          ELSE CAST([] AS VARCHAR[]) END AS g
      FROM toks
    )
  )
),
winmin AS (
  SELECT {id_col}, pos,
    min(h) OVER (PARTITION BY {id_col} ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fingerprint,
    count(*) OVER (PARTITION BY {id_col}) AS n
  FROM grams
)
SELECT DISTINCT {id_col}, fingerprint
FROM winmin WHERE pos - 1 <= greatest(n - {w}, 0)"""


# ------------------------------------------------ Luhn PAN detection

#: maximal digit runs of 13-19 digits allowing single space/dash
#: separators — the PAN candidate shape (regex shared with the twin)
PAN_RUN_RE = "[0-9](?:[ -]?[0-9]){12,18}"


def _luhn_valid(digits):
    """Column: Luhn checksum of a pure-digit string — integer-exact
    fold, no UDF. Reversed positions; every even 1-based reversed
    position doubles (minus 9 past 9); sum ≡ 0 (mod 10)."""
    rev = F.reverse(digits)
    terms = F.transform(
        F.sequence(F.lit(1), F.length(rev)),
        lambda i: F.when(
            i % 2 == 0,
            F.when(
                rev.substr(i, F.lit(1)).cast("int") * 2 > 9,
                rev.substr(i, F.lit(1)).cast("int") * 2 - 9,
            ).otherwise(rev.substr(i, F.lit(1)).cast("int") * 2),
        ).otherwise(rev.substr(i, F.lit(1)).cast("int")),
    )
    return (
        F.aggregate(terms, F.lit(0), lambda acc, x: acc + x) % 10 == 0
    )


def luhn_scan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Checksum-verified payment-card (PAN) detection per document —
    the precision upgrade over pure-regex PII screens
    (:func:`redact_patterns`): a 16-digit phone-with-country-code or
    order number matches a digit-run regex but almost never the Luhn
    checksum (10% of random runs pass), so routing only
    checksum-valid runs to redaction/quarantine cuts the false-
    positive flood that makes regex-only PAN rules unusable at
    corpus scale.

    Per doc: ``n_digit_runs`` (maximal 13–19-digit candidate runs,
    space/dash separators allowed), ``n_luhn_valid`` (runs whose
    separator-stripped digits pass Luhn), ``has_pan``. Runs count as
    OCCURRENCES (each maximal run once, the standard screen — a
    19-digit run is one candidate, not its sub-windows).

    Scale shape: extract + checksum are a single codegen'd projection
    (regexp_extract_all → transform/aggregate integer fold — no UDF,
    no shuffle before the per-doc count), then ONE hash-agg on the
    doc id; docs with no candidates rejoin as zeros via the spine
    left join. Determinism: pure integer arithmetic — bit-identical
    across engines and partitionings by construction.
    """
    runs = df.select(
        F.col(id_col),
        F.explode(
            # group 0 = the whole match (the regex's only group is
            # non-capturing; Spark defaults to group 1, DuckDB to 0)
            F.regexp_extract_all(F.col(text_col), F.lit(PAN_RUN_RE), 0)
        ).alias("__run"),
    ).select(
        F.col(id_col),
        F.regexp_replace(F.col("__run"), "[ -]", "").alias("__digits"),
    )
    per_doc = runs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_digit_runs"),
        F.sum(
            F.when(_luhn_valid(F.col("__digits")), 1).otherwise(0)
        ).alias("n_luhn_valid"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_digit_runs", F.lit(0))
            .cast("bigint")
            .alias("n_digit_runs"),
            F.coalesce("n_luhn_valid", F.lit(0))
            .cast("bigint")
            .alias("n_luhn_valid"),
            (F.coalesce("n_luhn_valid", F.lit(0)) > 0).alias("has_pan"),
        )
    )


def luhn_scan_sql(
    select_stmt: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle twin of :func:`luhn_scan` — same candidate regex,
    same reversed-position integer fold, same spine left join.
    ``select_stmt`` must expose ``{id_col}`` and ``{text_col}``."""
    digit = "CAST(substr(reverse(digits), i, 1) AS INTEGER)"
    term = (
        f"CASE WHEN i % 2 = 0 THEN "
        f"(CASE WHEN {digit} * 2 > 9 THEN {digit} * 2 - 9 "
        f"ELSE {digit} * 2 END) ELSE {digit} END"
    )
    return f"""WITH pan_src AS ({select_stmt}),
pan_runs AS (
  SELECT {id_col},
         regexp_replace(unnest(
           regexp_extract_all({text_col}, '{PAN_RUN_RE}')
         ), '[ -]', '', 'g') AS digits
  FROM pan_src
),
pan_per_doc AS (
  SELECT {id_col},
         CAST(count(*) AS BIGINT) AS n_digit_runs,
         CAST(sum(CASE WHEN list_sum(
             list_transform(range(1, len(digits) + 1), i -> {term})
           ) % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_luhn_valid
  FROM pan_runs GROUP BY 1
)
SELECT s.{id_col},
  coalesce(p.n_digit_runs, 0) AS n_digit_runs,
  coalesce(p.n_luhn_valid, 0) AS n_luhn_valid,
  coalesce(p.n_luhn_valid, 0) > 0 AS has_pan
FROM pan_src s LEFT JOIN pan_per_doc p USING ({id_col})"""


#: license-signal patterns, MOST RESTRICTIVE FIRST — the first match
#: wins, so "CC BY-NC" never misreads as "CC BY". Shared verbatim by
#: both engines (inline (?i); Java regex and DuckDB's RE2 agree on
#: every construct used). (name, pattern, is_open) — is_open marks
#: licenses a permissive-only training corpus keeps.
LICENSE_PATTERNS = (
    ("cc-by-nc", r"(?i)\bcc[- ]by[- ]nc\b|attribution[- ]noncommercial", False),
    ("cc-by-sa", r"(?i)\bcc[- ]by[- ]sa\b|attribution[- ]sharealike", True),
    ("cc-by", r"(?i)\bcc[- ]by\b|creative commons attribution", True),
    ("public-domain", r"(?i)public domain|\bcc0\b", True),
    ("all-rights-reserved", r"(?i)all rights reserved", False),
)


def license_scan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document license-signal detection — the licence-filtering
    pass permissive-only corpora run before training (the code-corpus
    canon: keep CC-BY/CC-BY-SA/public-domain, drop NC and
    all-rights-reserved; same statement-mining idea as the BigCode
    licence filters, reduced to the in-text declaration signals).

    One row per input doc: ``license`` (first matching entry of
    :data:`LICENSE_PATTERNS`, most restrictive first, or ``none``) and
    ``open_license`` (keep-for-training flag; ``none`` counts as NOT
    open — unknown provenance is the conservative default).

    This is a SIGNAL, not counsel: in-text statements miss
    side-channel licence metadata and misfire on documents QUOTING a
    licence; production pipelines join it with crawl-header/metadata
    signals before dropping anything.

    Scale shape: one codegen'd CASE-over-rlike projection on the scan
    — no UDF, no shuffle, no second pass; filters compose downstream
    (``.where(F.col("open_license"))``).
    """
    lic = F.lit("none")
    for name, pat, _open in reversed(LICENSE_PATTERNS):
        lic = F.when(F.col(text_col).rlike(pat), F.lit(name)).otherwise(lic)
    open_names = [n for n, _p, is_open in LICENSE_PATTERNS if is_open]
    return df.select(
        F.col(id_col),
        lic.alias("license"),
        lic.isin(*open_names).alias("open_license"),
    )


def license_scan_sql(
    select_stmt: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB oracle twin of :func:`license_scan` — the same pattern
    list in the same first-match-wins order."""
    whens = "\n".join(
        f"    WHEN regexp_matches({text_col}, '{pat}') THEN '{name}'"
        for name, pat, _open in LICENSE_PATTERNS
    )
    open_list = ", ".join(
        f"'{n}'" for n, _p, is_open in LICENSE_PATTERNS if is_open
    )
    return f"""WITH ls_docs AS ({select_stmt}),
ls AS (
  SELECT {id_col},
    CASE
{whens}
    ELSE 'none' END AS license
  FROM ls_docs
)
SELECT {id_col}, license, license IN ({open_list}) AS open_license
FROM ls"""


def quality_signal_bundle(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    url_col: str | None = None,
    blocked_domains: tuple[str, ...] = (),
    blocked_patterns: tuple[str, ...] = (),
    suffixes: tuple[str, ...] | None = None,
) -> DataFrame:
    """One wide quality-signal row per document — the RedPajama-v2
    artifact shape (Together 2023: ship the corpus WITH its quality
    annotations so downstream consumers filter by their own
    thresholds, instead of baking one filtering policy into the data).
    Joins the verified signal family on ``id_col``:

      * :func:`quality_score` — n_chars, n_tokens, mean_token_len,
        stopword_ratio, quality;
      * :func:`lang_id` — ``lang_pred``;
      * :func:`gopher_rules` — ``symbol_ratio``, ``alpha_ratio``,
        conjunctive decision as ``gopher_keep``;
      * :func:`license_scan` — ``license``, ``open_license``;
      * (when ``url_col`` given) ``url_policy_scan`` —
        ``registered_domain``, ``block_reason``, ``url_blocked``.

    Scale shape: each signal is its own verified single-pass
    explode/projection; the bundle is four (five with URLs) hash joins
    on the id, each side one row per document — with AQE these
    co-partition after the first shuffle. A fused single-pass variant
    would save the joins but fork every operator's logic; the bundle
    deliberately COMPOSES the verified implementations so its values
    are the per-signal entries' values by construction.

    Reference parity: none (extension layer, training-data canon).
    """
    q = quality_score(docs, text_col, id_col)
    lang = lang_id(docs, text_col, id_col).select(id_col, "lang_pred")
    gopher = gopher_rules(docs, text_col, id_col).select(
        id_col,
        "symbol_ratio",
        "alpha_ratio",
        F.col("keep").alias("gopher_keep"),
    )
    lic = license_scan(docs, text_col, id_col)
    out = q.join(lang, id_col).join(gopher, id_col).join(lic, id_col)
    if url_col is None:
        return out
    from .dedup import url_policy_scan

    policy = url_policy_scan(
        docs.select(id_col, url_col),
        url_col,
        id_col=id_col,
        blocked_domains=blocked_domains,
        blocked_patterns=blocked_patterns,
        suffixes=suffixes,
    ).select(
        id_col,
        "registered_domain",
        "block_reason",
        F.col("blocked").alias("url_blocked"),
    )
    return out.join(policy, id_col)


# ------------------------------------------- encoding / char classes

#: character-class count patterns, shared VERBATIM by both engines —
#: ASCII-only classes and \xNN escapes, constructs on which Java regex
#: (Spark) and RE2 (DuckDB) agree exactly. Keys are output columns.
CHARCLASS_PATTERNS = (
    ("n_alpha", r"[A-Za-z]"),
    ("n_digit", r"[0-9]"),
    ("n_upper", r"[A-Z]"),
    ("n_ws", r"[ \t\n\r]"),
    ("n_punct", r"[!-/:-@\[-`{-~]"),
    ("n_ctrl", r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"),
)

#: classic UTF-8-decoded-as-Latin-1/Windows-1252 artifacts ("mojibake"):
#: a multi-byte UTF-8 sequence read under a single-byte codec renders as
#: these literal strings (curly quotes/dashes -> "â€¦"-family, accented
#: Latin letters -> "Ã"-family, NBSP/guillemets -> "Â"-family). Literal
#: alternation only — no regex metacharacters — so both engines count
#: identically.
MOJIBAKE_SIGNS = (
    "â€™", "â€œ", "â€“", "â€”", "â€¦",
    "Ã©", "Ã¨", "Ã¤", "Ã¶", "Ã¼", "Ã±", "Ã§",
    "Â»", "Â«", "Â ",
)

#: U+FFFD REPLACEMENT CHARACTER — a decoder already gave up here.
REPLACEMENT_CHAR = "�"


def charclass_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document character-class + encoding-artifact scan — the
    text-cleanliness signal family of the C4/CCNet canon (strip pages
    whose bytes survived a codec mix-up: replacement characters,
    control bytes, mojibake signatures, or an implausibly low letter
    fraction).

    One row per input doc: the :data:`CHARCLASS_PATTERNS` counts,
    ``n_ufffd`` (U+FFFD replacement characters), ``n_mojibake``
    (:data:`MOJIBAKE_SIGNS` occurrences), the four class fractions
    (``alpha_frac``/``digit_frac``/``upper_frac``/``ws_frac`` — single
    IEEE divisions of exact integer operands, bit-reproducible across
    engines), and ``suspect`` — true when any artifact count is
    nonzero or fewer than half the characters are letters (empty docs
    are suspect: no evidence of clean text). This is a SIGNAL row, not
    a filtering policy — thresholds belong to the consumer
    (RedPajama-v2 shape, same framing as :func:`quality_signal_bundle`).

    Scale shape: ONE codegen'd projection over the scan — per-pattern
    ``regexp_count`` runs JVM-side, no UDF, no shuffle, no second
    pass. At 100 TB this is scan-bound by construction.

    Reference parity: none (extension layer, training-data canon).
    """
    n_chars = F.length(F.col(text_col)).cast("bigint")
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint").alias(name)
        for name, pat in CHARCLASS_PATTERNS
    ]
    moj_pat = "|".join(MOJIBAKE_SIGNS)
    counts.append(
        F.regexp_count(F.col(text_col), F.lit(REPLACEMENT_CHAR))
        .cast("bigint")
        .alias("n_ufffd")
    )
    counts.append(
        F.regexp_count(F.col(text_col), F.lit(moj_pat))
        .cast("bigint")
        .alias("n_mojibake")
    )
    base = df.select(F.col(id_col), n_chars.alias("n_chars"), *counts)

    def frac(num: str):
        return F.when(
            F.col("n_chars") > 0,
            F.col(num).cast("double") / F.col("n_chars").cast("double"),
        ).otherwise(F.lit(0.0))

    return base.select(
        id_col,
        "n_chars",
        *[name for name, _ in CHARCLASS_PATTERNS],
        "n_ufffd",
        "n_mojibake",
        frac("n_alpha").alias("alpha_frac"),
        frac("n_digit").alias("digit_frac"),
        frac("n_upper").alias("upper_frac"),
        frac("n_ws").alias("ws_frac"),
        (
            (F.col("n_ctrl") > 0)
            | (F.col("n_ufffd") > 0)
            | (F.col("n_mojibake") > 0)
            | (frac("n_alpha") < 0.5)
        ).alias("suspect"),
    )


def charclass_scan_sql(
    select_stmt: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB oracle twin of :func:`charclass_scan` — the same pattern
    table rendered verbatim; occurrence counts via
    ``len(regexp_extract_all(...))`` (non-overlapping matches, the same
    counting rule as Spark's ``regexp_count``)."""
    moj_pat = "|".join(MOJIBAKE_SIGNS)
    cnt = [
        f"CAST(len(regexp_extract_all({text_col}, '{pat}')) AS BIGINT) AS {name}"
        for name, pat in CHARCLASS_PATTERNS
    ]
    cnt.append(
        f"CAST(len(regexp_extract_all({text_col}, '{REPLACEMENT_CHAR}')) AS BIGINT) AS n_ufffd"
    )
    cnt.append(
        f"CAST(len(regexp_extract_all({text_col}, '{moj_pat}')) AS BIGINT) AS n_mojibake"
    )
    counts_sql = ",\n    ".join(cnt)

    def frac(num: str) -> str:
        return (
            f"CASE WHEN n_chars > 0 THEN CAST({num} AS DOUBLE) / "
            f"CAST(n_chars AS DOUBLE) ELSE 0.0 END"
        )

    names = ", ".join(name for name, _ in CHARCLASS_PATTERNS)
    return f"""WITH cc_src AS ({select_stmt}),
cc AS (
  SELECT {id_col},
    CAST(length({text_col}) AS BIGINT) AS n_chars,
    {counts_sql}
  FROM cc_src
)
SELECT {id_col}, n_chars, {names}, n_ufffd, n_mojibake,
  {frac('n_alpha')} AS alpha_frac,
  {frac('n_digit')} AS digit_frac,
  {frac('n_upper')} AS upper_frac,
  {frac('n_ws')} AS ws_frac,
  (n_ctrl > 0 OR n_ufffd > 0 OR n_mojibake > 0
   OR {frac('n_alpha')} < 0.5) AS suspect
FROM cc"""
