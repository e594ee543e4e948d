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
* ``word_ngrams`` — staged token array + explode of the gram start
  positions + ``element_at`` assembly, all whole-stage-codegen'd and
  SHUFFLE-FREE (optimization r12: the previous posexplode + per-doc
  ``lead`` window shuffled and sorted the whole token stream by doc id
  just to pair adjacent tokens); the output carries distinct
  (doc, gram) pairs only.
* ``decontaminate`` — distinct eval grams semi-joined against train
  grams on the gram key: one shuffle each side, output bounded by the
  train corpus. At 100 TB you would hash grams to 64-bit before the
  join (xxhash64) to shrink shuffle width; the string key is kept here
  so the DuckDB oracle can join on the same value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark import StorageLevel

from shaha_spark.operators.constants import TOKEN_SPLIT_RE
from shaha_spark.operators.profile import split_cast_double


def tokens(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, term) pairs, empties dropped — whitespace tokenization."""
    return docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), TOKEN_SPLIT_RE)).alias("term"),
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


def _tok_arr(text_col):
    """Non-empty token array of one document — ALWAYS stage this as a
    projected column before element_at access (an inlined copy is
    re-split once per element access — measured 20× slower; the r12
    re-tokenization trap). ``array_remove`` rather than the ``F.filter``
    higher-order function: HOF lambdas are interpreted (never
    whole-stage-codegen'd) and measured 20-35% slower end-to-end on the
    n-gram family."""
    return F.array_remove(F.split(text_col, TOKEN_SPLIT_RE), "")


def _gram_starts(a, n: int):
    """1-based start positions of the n-grams of token array ``a`` —
    empty when the document has fewer than n tokens (a bare
    ``sequence(1, size-n+1)`` would count DOWN when size < n)."""
    return F.when(
        F.size(a) >= n, F.sequence(F.lit(1), F.size(a) - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))


def _ngram_stream(
    docs: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """Every n-gram occurrence as ``(id, w1..wn)`` — assembled by
    ``element_at`` lookups over the staged token array, NO shuffle (the
    lead-window alternative shuffles and sorts the whole token stream
    by doc id just to pair adjacent tokens). The explode generates only
    the int start positions; the token array rides alongside within the
    same codegen stage, so no per-gram array copy and every expression
    (sequence, explode, element_at) stays in whole-stage codegen — an
    earlier ``transform``/``slice`` HOF draft of this assembly was
    interpreted and measured SLOWER than the window it replaced."""
    staged = docs.select(F.col(id_col), _tok_arr(F.col(text_col)).alias("__toks"))
    a = F.col("__toks")
    idx = staged.select(
        F.col(id_col), a, F.explode(_gram_starts(a, n)).alias("__i")
    )
    i = F.col("__i")
    return idx.select(
        F.col(id_col),
        *[F.element_at(a, i + F.lit(j)).alias(f"w{j + 1}") for j in range(n)],
    )


def word_ngrams(
    docs: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct (id, gram) word n-grams, space-joined.

    Grams assemble by ``element_at`` lookups over the staged token
    array — NO shuffle (optimization r12: the previous posexplode +
    per-doc ``lead`` window form shuffled and sorted the entire token
    stream by doc id just to pair adjacent tokens; the token order the
    window reconstructed is already explicit in the array). Documents
    with fewer than n tokens yield no grams, exactly as the off-end
    null check did.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n == 1:
        toks = docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), TOKEN_SPLIT_RE)).alias("w"),
        ).filter(F.col("w") != "")
        return toks.select(id_col, F.col("w").alias("gram")).distinct()
    stream = _ngram_stream(docs, n, text_col, id_col)
    return stream.select(
        F.col(id_col),
        F.concat_ws(" ", *[f"w{j + 1}" for j in range(n)]).alias("gram"),
    ).distinct()


def top_vocab(
    docs: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k vocabulary by corpus occurrence count.

    Deterministic: ties at the cut break on the term itself
    (count desc, term asc). One explode + hash-agg with map-side
    partials, then a global top-k — TakeOrderedAndProject, so only k
    rows per partition survive to the driver-side merge, never the
    full vocabulary."""
    return (
        tokens(docs, text_col, id_col)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("term"))
        .limit(k)
    )


def oov_rate(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a vocab table.

    The vocab (``term`` column) broadcasts — it is a curated top-k,
    small by construction — so the token stream is scanned once with a
    map-side membership probe and one hash-agg by document; no shuffle
    of the token stream itself beyond the final per-doc aggregation.
    The rate is one IEEE division of two exact counts."""
    # distinct() before the probe: a vocab table with duplicate terms
    # would otherwise MULTIPLY matched token rows through the join and
    # deflate the rate (n_tokens counts join-output rows)
    marked = tokens(docs, text_col, id_col).join(
        F.broadcast(vocab.select("term").distinct().withColumn("__known", F.lit(1))),
        "term",
        "left",
    )
    per_doc = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("__known").isNull(), 1).otherwise(0)).alias("n_oov"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.when(F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.coalesce("n_oov", F.lit(0)).cast("double")
                / F.coalesce("n_tokens", F.lit(0)).cast("double")
            )
            .alias("oov_rate"),
        )
    )


def ngram_repetition(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document repeated word-n-gram ratio (a Gopher-style quality
    rule: heavily self-repetitive documents are low-value training
    text).

    Counts every n-gram occurrence (unlike :func:`word_ngrams`, which
    deduplicates) and reports how many occurrences are repeats of a
    gram already seen in the same document. Same shuffle-free gram
    assembly as word_ngrams (codegen'd element_at lookups over the
    staged token array — optimization r12, no token-stream exchange),
    then one hash-agg; count(distinct) expands inside the same
    aggregation, no second scan. The ratio is one IEEE division of
    exact counts."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n == 1:
        assembled = docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), TOKEN_SPLIT_RE)).alias("gram"),
        ).filter(F.col("gram") != "")
    else:
        assembled = _ngram_stream(docs, n, text_col, id_col).select(
            F.col(id_col),
            F.concat_ws(" ", *[f"w{j + 1}" for j in range(n)]).alias("gram"),
        )
    per_doc = assembled.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count_distinct(F.col("gram")).alias("n_unique_grams"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_unique_grams", F.lit(0)).alias("n_unique_grams"),
            F.when(F.coalesce("n_grams", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                (F.coalesce("n_grams", F.lit(0)) - F.coalesce("n_unique_grams", F.lit(0))).cast("double")
                / F.coalesce("n_grams", F.lit(0)).cast("double")
            )
            .alias("dup_gram_ratio"),
        )
    )


def tf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document pairs with high sparse cosine similarity over
    integer-quantized tf-idf vectors, via an inverted token index.

    Weights are ``tf * (n_docs DIV df)`` — the idf ratio floored to an
    integer so every dot product and norm is an exact BIGINT sum;
    cosine then costs exactly three IEEE ops (two correctly-rounded
    sqrts, one multiply, one divide) on exact operands, making the
    result bit-deterministic across engines and partitionings. (With
    true log-idf the float sums would be order-dependent.)

    Scale shape — single lineage, one corpus scan: tf hash-agg → df
    and per-doc norm attached as windows (no groupBy forks, the
    term_stats lesson) → group by term into postings → explode both
    sides of each posting — the same bucket-join construction as the
    LSH pair generator, so the corpus is never self-joined. The
    postings list for a term of document frequency f yields f(f-1)/2
    pair rows (in-array later-neighbor enumeration, no explode-both-
    sides): ``max_df`` caps that fanout by dropping stop-terms (the
    standard prefix-filtering relaxation for sparse similarity); at
    100 TB you set it so the largest posting fits an executor
    (quadratic-bucket math identical to LSH — see SCALE.md)."""
    tf = (
        tokens(docs, text_col, id_col)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    weighted = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(n))
        .withColumn("wt", F.col("tf") * F.expr("n_docs DIV df"))
        .withColumn(
            "nrm", F.sum(F.col("wt") * F.col("wt")).over(Window.partitionBy(id_col))
        )
    )
    if max_df is not None:
        weighted = weighted.filter(F.col("df") <= max_df)
    # array_sort on the (id, wt, nrm) structs orders each posting list
    # by id (ids are unique), so pairs enumerate as "each element with
    # its later neighbors" — f(f-1)/2 rows per posting instead of the
    # f² explode-both-sides-then-filter, halving shuffle and CPU on
    # the hottest term (this operator's stated bottleneck)
    postings = weighted.groupBy("term").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(id_col).alias("id"), "wt", "nrm"))
        ).alias("ps")
    )
    arr = F.col("ps")
    pair_expr = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.size(arr)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        postings.select(F.explode(pair_expr).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
        )
        .agg(
            F.sum(F.col("a.wt") * F.col("b.wt")).alias("dot"),
            F.max("a.nrm").alias("nrm_a"),
            F.max("b.nrm").alias("nrm_b"),
        )
    )
    cosine = F.col("dot").cast("double") / (
        F.sqrt(F.col("nrm_a").cast("double")) * F.sqrt(F.col("nrm_b").cast("double"))
    )
    return (
        pairs.withColumn("cosine", cosine)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
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


def exact_substring_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    min_len: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Flag training documents sharing any EXACT character substring of
    length ≥ ``min_len`` with an eval set — the stronger sibling of the
    word-n-gram check (:func:`decontaminate`): it catches verbatim
    benchmark passages that word tokenization splits differently
    (punctuation, casing inside tokens, number formatting), the
    contamination class the suffix-array method of Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499 §4) targets. A shared substring of length
    ≥ min_len exists iff a shared ALIGNED window of EXACTLY min_len
    exists, so stride-1 fixed-length shingles give the suffix-array
    answer with no suffix array: pure relational algebra.

    Returns every train row's id with ``n_shared_spans`` (distinct
    min_len-char windows of the train doc also appearing anywhere in
    the eval set — 0 for docs shorter than min_len) and a
    ``contaminated`` flag.

    Scale shape (100 TB train, benchmark-sized eval — the production
    asymmetry): the EVAL side collapses to its distinct shingle set
    and is broadcast (``broadcast_eval``), so the train side — the
    data-proportional one — is a single scan + codegen'd substring
    explode with NO shuffle for the join; only the per-doc count
    aggregation shuffles, and that carries one row per MATCHED
    (doc, window), a contamination-sized table, plus the train-id
    spine. Train-side shingles are deduped per doc before the join
    (distinct on (id, window)), bounding the count at windows-per-doc.
    Set ``broadcast_eval=False`` when the eval set is itself huge —
    the join degrades to a hash-shuffle on the window string. For
    1000× longer documents, the Lee et al. stride trick (stride
    min_len//2 on one side, candidate verification after) cuts the
    shingle volume ~2×; at stride 1 this is already linear in corpus
    characters, the same budget as tokenization.

    Reference parity: none (no decontamination surface in the
    reference) — extension layer, training-data canon.
    """
    if min_len < 2:
        raise ValueError(f"min_len must be >= 2, got {min_len}")
    L = min_len

    def shingles(df: DataFrame) -> DataFrame:
        long_enough = df.where(F.length(text_col) >= L)
        return long_enough.select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(1), F.length(text_col) - F.lit(L - 1))
            ).alias("__g"),
            F.col(text_col),
        ).select(
            F.col(id_col),
            F.col(text_col).substr(F.col("__g"), F.lit(L)).alias("__win"),
        )

    train_wins = shingles(train).distinct()
    eval_wins = shingles(eval_df).select("__win").distinct()
    if broadcast_eval:
        eval_wins = F.broadcast(eval_wins)
    shared = (
        train_wins.join(eval_wins, "__win")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_spans"))
    )
    return (
        train.select(id_col)
        .join(shared, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shared_spans", F.lit(0)).alias("n_shared_spans"),
            (F.coalesce("n_shared_spans", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def exact_substring_decontaminate_screened(
    train: DataFrame,
    eval_df: DataFrame,
    min_len: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Scale-path form of :func:`exact_substring_decontaminate` —
    IDENTICAL output (test- and oracle-pinned), with the train side's
    window volume cut ``W``-fold by an aligned-stride screen before an
    exact verification pass.

    The pigeonhole that licenses it (W = (min_len+1)//2, so
    min_len ≥ 2W-1): any shared substring of length ≥ min_len spans
    ≥ W consecutive start positions of W-length windows in the TRAIN
    occurrence, and any W consecutive integers contain one ≡ 0
    (mod W) — so the train occurrence always contains a W-ALIGNED
    W-window, which the eval side's stride-1 W-window set also
    contains. Hence screening train docs by "shares an aligned
    W-window with eval" has NO false negatives; docs that fail the
    screen are exactly-0-span by construction and rejoin via the left
    join. Docs that pass (a contamination-sized set) are re-checked
    with the stride-1 min_len windows of the base operator, which
    removes the screen's false positives (shared length in
    [W, min_len)).

    Why this is the 100 TB shape: the base operator explodes ~|chars|
    train windows; the screen explodes ~|chars|/W (aligned starts
    only), and the expensive stride-1 pass runs ONLY over screened
    docs — at real contamination rates (<<1%) the full-width explode
    touches a sliver of the corpus. Both phases broadcast the
    benchmark-sized eval window sets, so the train side still never
    shuffles for a join.
    """
    if min_len < 3:
        raise ValueError(f"min_len must be >= 3, got {min_len}")
    w = (min_len + 1) // 2

    def aligned_train_windows(df: DataFrame) -> DataFrame:
        # starts 1, W+1, 2W+1, ... (1-based): global alignment within
        # the document — the pigeonhole argument is per train DOC
        long_enough = df.where(F.length(text_col) >= w)
        return long_enough.select(
            F.col(id_col),
            F.explode(
                F.sequence(
                    F.lit(1), F.length(text_col) - F.lit(w - 1), F.lit(w)
                )
            ).alias("__g"),
            F.col(text_col),
        ).select(
            F.col(id_col),
            F.col(text_col).substr(F.col("__g"), F.lit(w)).alias("__win"),
        )

    def stride1_windows(df: DataFrame, length: int) -> DataFrame:
        long_enough = df.where(F.length(text_col) >= length)
        return long_enough.select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(1), F.length(text_col) - F.lit(length - 1))
            ).alias("__g"),
            F.col(text_col),
        ).select(
            F.col(id_col),
            F.col(text_col).substr(F.col("__g"), F.lit(length)).alias("__win"),
        )

    eval_w = stride1_windows(eval_df, w).select("__win").distinct()
    if broadcast_eval:
        eval_w = F.broadcast(eval_w)
    candidates = (
        aligned_train_windows(train)
        .join(eval_w, "__win")
        .select(id_col)
        .distinct()
    )
    # exact pass over candidate docs only — the base operator's
    # stride-1 min_len windows, so screen false-positives drop out
    cand_train = train.join(candidates, id_col, "left_semi")
    eval_full = stride1_windows(eval_df, min_len).select("__win").distinct()
    if broadcast_eval:
        eval_full = F.broadcast(eval_full)
    shared = (
        stride1_windows(cand_train, min_len)
        .distinct()
        .join(eval_full, "__win")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_spans"))
    )
    return (
        train.select(id_col)
        .join(shared, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shared_spans", F.lit(0)).alias("n_shared_spans"),
            (F.coalesce("n_shared_spans", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def exact_substring_decontaminate_sql(
    train_select: str,
    eval_select: str,
    min_len: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle twin of :func:`exact_substring_decontaminate` —
    the same stride-1 fixed-length windows (docs shorter than min_len
    contribute none; every emitted window is EXACTLY min_len chars, so
    no short-tail false matches), the same per-side distinct, the same
    left-join count. ``train_select``/``eval_select`` are full SELECT
    statements exposing ``{id_col}`` and ``{text_col}``."""
    L = min_len
    return f"""WITH sd_train AS ({train_select}),
sd_eval AS ({eval_select}),
sd_tw AS (
  SELECT DISTINCT {id_col}, substr({text_col}, g, {L}) AS win
  FROM (SELECT {id_col}, {text_col},
               unnest(range(1, len({text_col}) - {L} + 2)) AS g
        FROM sd_train WHERE len({text_col}) >= {L})
),
sd_ew AS (
  SELECT DISTINCT substr({text_col}, g, {L}) AS win
  FROM (SELECT {text_col},
               unnest(range(1, len({text_col}) - {L} + 2)) AS g
        FROM sd_eval WHERE len({text_col}) >= {L})
),
sd_shared AS (
  SELECT sd_tw.{id_col}, count(*) AS n_shared_spans
  FROM sd_tw JOIN sd_ew USING (win) GROUP BY 1
)
SELECT t.{id_col},
  coalesce(s.n_shared_spans, 0) AS n_shared_spans,
  coalesce(s.n_shared_spans, 0) > 0 AS contaminated
FROM sd_train t LEFT JOIN sd_shared s USING ({id_col})"""


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    min_len: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-eval-document contamination PROVENANCE — the audit artifact
    reviewers ask for when a decontamination pass is reported: not just
    "these train docs are contaminated" (that is
    :func:`exact_substring_decontaminate`) but WHICH eval document each
    one hits and how hard. One row per contaminated
    (eval doc, train doc) pair:

      ``eval_{id_col}``, ``train_{id_col}``,
      ``n_shared_windows`` — distinct ``min_len``-char windows the two
      documents share (window identity is the exact character string,
      the same stride-1 shingling as the flag operator, so the flag's
      ``contaminated`` set is exactly the distinct train ids here).

    Scale shape (100 TB train / benchmark-sized eval): the eval side
    now carries its ids (per-doc-distinct windows, still
    benchmark-sized) and broadcasts, so the data-proportional train
    scan joins shuffle-free exactly as in the flag operator; the only
    shuffled rows are MATCHED (eval, train, window) triples — a
    contamination-sized table. Pair rows are deduped per window on
    each side first, so a window repeated inside one document counts
    once. ``broadcast_eval=False`` degrades to a hash-shuffle join on
    the window string for huge eval sets.

    Reference parity: none (extension layer, training-data canon —
    the reporting half of Lee et al. 2021's decontamination).
    """
    if min_len < 2:
        raise ValueError(f"min_len must be >= 2, got {min_len}")
    L = min_len

    def shingles(df: DataFrame, out_id: str) -> DataFrame:
        long_enough = df.where(F.length(text_col) >= L)
        return long_enough.select(
            F.col(id_col).alias(out_id),
            F.explode(
                F.sequence(F.lit(1), F.length(text_col) - F.lit(L - 1))
            ).alias("__g"),
            F.col(text_col),
        ).select(
            out_id,
            F.col(text_col).substr(F.col("__g"), F.lit(L)).alias("__win"),
        ).distinct()

    train_wins = shingles(train, "train_" + id_col)
    eval_wins = shingles(eval_df, "eval_" + id_col)
    if broadcast_eval:
        eval_wins = F.broadcast(eval_wins)
    return (
        train_wins.join(eval_wins, "__win")
        .groupBy("eval_" + id_col, "train_" + id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_windows"))
    )


def contamination_report_sql(
    train_select: str,
    eval_select: str,
    min_len: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle twin of :func:`contamination_report` — the same
    per-side (id, window) distinct and pair-count."""
    L = min_len
    return f"""WITH cr_train AS ({train_select}),
cr_eval AS ({eval_select}),
cr_tw AS (
  SELECT DISTINCT {id_col} AS train_{id_col}, substr({text_col}, g, {L}) AS win
  FROM (SELECT {id_col}, {text_col},
               unnest(range(1, len({text_col}) - {L} + 2)) AS g
        FROM cr_train WHERE len({text_col}) >= {L})
),
cr_ew AS (
  SELECT DISTINCT {id_col} AS eval_{id_col}, substr({text_col}, g, {L}) AS win
  FROM (SELECT {id_col}, {text_col},
               unnest(range(1, len({text_col}) - {L} + 2)) AS g
        FROM cr_eval WHERE len({text_col}) >= {L})
)
SELECT e.eval_{id_col}, t.train_{id_col}, count(*) AS n_shared_windows
FROM cr_tw t JOIN cr_ew e USING (win)
GROUP BY 1, 2"""


def cross_split_contamination(
    docs: DataFrame,
    split_col: str = "split",
    train_split: str = "train",
    min_len: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
    report: DataFrame | None = None,
) -> DataFrame:
    """Train↔held-out contamination audit ACROSS a split assignment —
    the end-to-end invariant the split + decontamination operators
    exist to enable (VERDICT r11 #6a): after cluster_split (or any
    split) and exact-substring decontamination, every non-train split
    must share ZERO ≥ ``min_len``-char windows with train. One row per
    NON-train split (zeros present, never missing — the clean state is
    a reportable row, not an absent one):

      ``{split_col}``, ``n_pairs`` (contaminated (held-out doc, train
      doc) pairs), ``n_shared_windows`` (their distinct shared-window
      total), ``n_eval_docs_hit``, ``n_train_docs_hit``.

    Window semantics are :func:`contamination_report` verbatim
    (stride-1 min_len-char shingles, per-side per-doc distinct), so
    ``n_pairs == 0`` for every split ⇔ the decontamination flag
    operator would flag nothing — the composition is exact, not
    approximate.

    Scale shape: one contamination_report pass (train side scans once,
    held-out windows broadcast under the production train≫eval
    asymmetry; ``broadcast_eval=False`` for huge held-out splits),
    then a split-cardinality aggregation over the MATCHED pairs only.

    ``report`` (optimization r12): a caller that ALREADY holds this
    split's :func:`contamination_report` output (the cross-split audit
    computes it for the flag set too) passes it here to skip the
    report's window-extraction pass — the aggregation below is then
    the only work. Must be the report of exactly ``docs``'s
    train/held-out partition under the same ``min_len``.

    Reference parity: none (extension layer, training-data canon).
    """
    eid, tid = "eval_" + id_col, "train_" + id_col
    train = docs.where(F.col(split_col) == train_split)
    held_out = docs.where(F.col(split_col) != train_split)
    rep = report if report is not None else contamination_report(
        train, held_out, min_len, text_col, id_col, broadcast_eval
    )
    per_split = (
        rep.join(
            held_out.select(F.col(id_col).alias(eid), split_col), eid
        )
        .groupBy(split_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("n_shared_windows").cast("bigint").alias("n_shared_windows"),
            F.countDistinct(eid).cast("bigint").alias("n_eval_docs_hit"),
            F.countDistinct(tid).cast("bigint").alias("n_train_docs_hit"),
        )
    )
    splits = held_out.select(split_col).distinct()
    zero = F.lit(0).cast("bigint")
    return splits.join(per_split, split_col, "left").select(
        split_col,
        F.coalesce("n_pairs", zero).alias("n_pairs"),
        F.coalesce("n_shared_windows", zero).alias("n_shared_windows"),
        F.coalesce("n_eval_docs_hit", zero).alias("n_eval_docs_hit"),
        F.coalesce("n_train_docs_hit", zero).alias("n_train_docs_hit"),
    )


def cross_split_contamination_sql(
    docs_select: str,
    split_col: str = "split",
    train_split: str = "train",
    min_len: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    cte_prefix: str = "xs",
) -> str:
    """DuckDB oracle twin of :func:`cross_split_contamination` —
    ``docs_select`` must yield (id, text, split). ``cte_prefix``
    namespaces the CTEs so two invocations (pre/post phases) can be
    UNION'd in one statement."""
    L = min_len
    p = cte_prefix
    ts = train_split.replace("'", "''")
    return f"""WITH {p}_docs AS ({docs_select}),
{p}_tw AS (
  SELECT DISTINCT {id_col} AS train_{id_col}, substr({text_col}, g, {L}) AS win
  FROM (SELECT {id_col}, {text_col},
               unnest(range(1, len({text_col}) - {L} + 2)) AS g
        FROM {p}_docs
        WHERE {split_col} = '{ts}' AND len({text_col}) >= {L})
),
{p}_ew AS (
  SELECT DISTINCT {id_col} AS eval_{id_col}, {split_col},
         substr({text_col}, g, {L}) AS win
  FROM (SELECT {id_col}, {text_col}, {split_col},
               unnest(range(1, len({text_col}) - {L} + 2)) AS g
        FROM {p}_docs
        WHERE {split_col} <> '{ts}' AND len({text_col}) >= {L})
),
{p}_pairs AS (
  SELECT e.{split_col}, e.eval_{id_col}, t.train_{id_col}, count(*) AS nw
  FROM {p}_tw t JOIN {p}_ew e USING (win)
  GROUP BY 1, 2, 3
),
{p}_agg AS (
  SELECT {split_col},
    CAST(count(*) AS BIGINT) AS n_pairs,
    CAST(sum(nw) AS BIGINT) AS n_shared_windows,
    CAST(count(DISTINCT eval_{id_col}) AS BIGINT) AS n_eval_docs_hit,
    CAST(count(DISTINCT train_{id_col}) AS BIGINT) AS n_train_docs_hit
  FROM {p}_pairs GROUP BY 1
),
{p}_splits AS (
  SELECT DISTINCT {split_col} FROM {p}_docs WHERE {split_col} <> '{ts}'
)
SELECT s.{split_col},
  coalesce(a.n_pairs, 0) AS n_pairs,
  coalesce(a.n_shared_windows, 0) AS n_shared_windows,
  coalesce(a.n_eval_docs_hit, 0) AS n_eval_docs_hit,
  coalesce(a.n_train_docs_hit, 0) AS n_train_docs_hit
FROM {p}_splits s LEFT JOIN {p}_agg a USING ({split_col})"""


def top_keywords(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` ratio-idf-weighted terms per document (deterministic
    tiebreak: weight desc, term asc) — per-doc keyword extraction for
    corpus browsing/labeling. One row_number window over the
    :func:`term_stats` output; partitions are document-vocabulary-sized
    (bounded by document length), so the window never sees more than
    one document's terms.
    """
    from pyspark.sql import Window as W

    ts = term_stats(docs, text_col, id_col)
    w = W.partitionBy(id_col).orderBy(F.col("weight").desc(), F.col("term").asc())
    return (
        ts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "weight", "rank")
    )


def dup_gram_stats(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document corpus-duplicate n-gram fraction: of each document's
    distinct word n-grams, how many appear in at least one OTHER
    document. High fractions flag boilerplate/mirrored text that exact
    whole-document dedup misses — the n-gram-level complement to
    MinHash (span-level duplication, not whole-doc similarity).

    Scale shape: gram document-frequency is a count window over the
    distinct (doc, gram) pairs — a single lineage (the same
    no-diamond rule as :func:`term_stats`), one shuffle on the gram
    key, then one hash-agg back on the doc id. At 100 TB hash grams to
    64-bit first (xxhash64) to shrink the shuffle; the string key is
    kept so the DuckDB oracle joins on the same value.
    """
    from pyspark.sql import Window as W

    grams = word_ngrams(docs, n, text_col, id_col)
    gdf = F.count(F.lit(1)).over(W.partitionBy("gram"))
    per = grams.withColumn("__gdf", gdf)
    agg = per.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.when(F.col("__gdf") >= 2, 1).otherwise(0)).alias("n_dup_grams"),
    )
    return agg.select(
        F.col(id_col),
        F.col("n_grams"),
        F.col("n_dup_grams").cast("bigint").alias("n_dup_grams"),
        (
            F.col("n_dup_grams").cast("double") / F.col("n_grams").cast("double")
        ).alias("dup_fraction"),
    )


def remove_dup_gram_spans(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_freq: int = 2,
) -> DataFrame:
    """Exact-substring span REMOVAL at n-gram granularity: rewrite each
    document's text with every token that participates in a
    corpus-duplicate n-gram deleted, keeping the rest in order.
    :func:`dup_gram_stats` only *scores* span-level duplication; this is
    the surgical complement (the "remove duplicated substrings" step of
    suffix-array training-data dedup, approximated at whole-token n-gram
    granularity so it stays a pure relational plan).

    A gram is duplicate when it occurs in >= ``min_doc_freq`` distinct
    documents. Every token position covered by any occurrence of a
    duplicate gram is dropped; documents with no surviving tokens come
    back with empty ``clean_text`` (never silently vanish).

    Scale shape: token positions are densified by one per-doc window
    (single shuffle on the doc id, shared by the gram-assembly leads);
    gram doc-frequency is a count window over distinct (doc, gram) —
    same single-lineage recipe as :func:`dup_gram_stats`; coverage is a
    bounded explode (n rows per duplicate-gram occurrence) followed by
    an anti-join on (doc, idx); reassembly is one hash-agg with an
    in-memory ``array_sort`` bounded by document length. No collect, no
    global sort, no cross join. At 100 TB hash grams to 64-bit before
    the duplicate-gram join to shrink the shuffle.

    ``toks`` is lazily persisted on disk (r10: persist(DISK_ONLY)
    replaced the lazy localCheckpoint, which AQE materialized at
    construction time):
    four branches consume it (gram assembly → doc-frequency AND
    coverage, the anti-join probe, the per-doc totals), and column
    pruning differentiates their subtrees enough that exchange reuse
    cannot merge them — unmaterialized, the corpus would be scanned
    and re-exploded once per branch (measured: 5 scans). The
    checkpoint trades one token-table materialization (~tokens bytes,
    spillable) for four corpus re-scans plus their windows.
    """
    from pyspark.sql import Window as W

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = (
        docs.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), TOKEN_SPLIT_RE)).alias("pos", "w"),
        )
        .filter(F.col("w") != "")
        .select(
            F.col(id_col),
            (F.row_number().over(W.partitionBy(id_col).orderBy("pos")) - 1).alias(
                "idx"
            ),
            "w",
        )
        .persist(StorageLevel.DISK_ONLY)
    )
    wnd = W.partitionBy(id_col).orderBy("idx")
    parts = [F.col("w")] + [F.lead("w", i).over(wnd) for i in range(1, n)]
    occ = (
        toks.select(
            F.col(id_col),
            F.col("idx"),
            F.concat_ws(" ", *parts).alias("gram"),
            parts[-1].alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .drop("_last")
    )
    docgrams = occ.select(id_col, "gram").distinct()
    dup_grams = (
        docgrams.withColumn(
            "__df", F.count(F.lit(1)).over(W.partitionBy("gram"))
        )
        .filter(F.col("__df") >= min_doc_freq)
        .select("gram")
        .distinct()
    )
    covered = (
        occ.join(dup_grams, "gram")
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.col("idx"), F.col("idx") + F.lit(n - 1))).alias(
                "idx"
            ),
        )
        .distinct()
    )
    kept = toks.join(covered, [id_col, "idx"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "w"))),
                lambda s: s["w"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    totals = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"))
    from shaha_spark.caching import registers

    return registers(
        docs.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
            (
                F.coalesce(F.col("n_tokens"), F.lit(0))
                - F.coalesce(F.col("__n_kept"), F.lit(0))
            ).cast("bigint").alias("n_removed"),
        ),
        toks,
    )


def bigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document average bigram conditional log-likelihood under the
    corpus's own bigram LM — the next step up from
    :func:`unigram_logprob` as a cheap fluency score (sensitive to word
    ORDER, which the unigram score cannot see).

    lp(w1 w2) = ln( c(w1,w2) / c(w1,·) ) where c(w1,·) counts w1 as a
    bigram start, so the conditional distribution sums to exactly 1 and
    no smoothing is needed when scoring the corpus against itself.

    Same determinism recipe as the unigram scorer: ``ln`` is evaluated
    once per distinct BIGRAM, rounded to 8 decimals, and per-document
    totals are decimal-exact sums of the rounded values; the final
    average is one correctly-rounded division. The start-count is a sum
    window over the bigram counts (single lineage, no diamond); the LM
    table is bigram-vocabulary-sized and broadcast for the score join.
    Bigrams assemble shuffle-free by array slicing (optimization r12 —
    the lead-window form shuffled and sorted the whole token stream).
    """
    from pyspark.sql import Window as W

    pairs = _ngram_stream(docs, 2, text_col, id_col)
    c2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = F.sum("c2").over(W.partitionBy("w1"))
    lp = c2.withColumn("__c1", c1).select(
        "w1",
        "w2",
        F.round(
            F.log(F.col("c2").cast("double") / F.col("__c1").cast("double")), 8
        )
        .cast("decimal(20,8)")
        .alias("lp"),
    )
    return (
        pairs.join(F.broadcast(lp), ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (split_cast_double(F.sum("lp"), 8) / F.count(F.lit(1))).alias("avg_logprob"),
        )
    )


def trigram_backoff_logprob(
    docs: DataFrame,
    lm_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.4,
) -> DataFrame:
    """Per-document average trigram log-score under a Stupid-Backoff LM
    (Brants et al. 2007) trained on ``lm_docs`` — the CCNet-style
    LM-quality filter, completing the unigram → bigram → trigram
    scoring ladder. Because the LM corpus is separate (hash-split it
    from the scored corpus), backoff genuinely fires on unseen
    trigrams:

        S(w3|w1,w2) = c3/c2(w1,w2)                 if c3 > 0
                    = lam · c2(w2,w3)/c1(w2)        elif c2(w2,w3) > 0
                    = lam² · (c1(w3)+1)/(N+V)       otherwise
                      (add-one floor so words never seen in the LM
                       score finitely instead of -inf)

    Determinism: ``ln S`` is evaluated once per DISTINCT scored trigram
    key (vocabulary-sized, not corpus-sized), rounded to 8 decimals,
    and per-document totals are decimal-exact sums — the unigram/bigram
    scorer recipe, so partitioning cannot perturb scores.

    Scale shape: LM counts are three hash-aggs over the LM corpus
    (map-side partials); the scored corpus contributes its distinct
    trigram keys to three LEFT joins against those count tables (all
    keyed on grams — AQE broadcasts the smaller sides), and one final
    join back to the occurrence stream + doc hash-agg. Documents with
    fewer than 3 tokens return ``n_trigrams = 0`` and NULL score.
    """
    def _toks(df):
        return df.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), TOKEN_SPLIT_RE)).alias("w"),
        ).filter(F.col("w") != "")

    def _tris(df):
        # shuffle-free array-slice assembly (optimization r12) — the
        # lead-window form shuffled+sorted the whole token stream
        return _ngram_stream(df, 3, text_col, id_col)

    # The LM count tables are each consumed by several joins below, and
    # Spark re-derives the whole lm_toks subtree (scan + explode [+
    # window]) for every consumer — measured 9 parquet scans / 22
    # exchanges for this one operator before the lazy-checkpoint
    # barriers. The count tables are VOCABULARY-sized, so materializing
    # them once is cheap at any corpus scale; `occ` is corpus-sized,
    # where the barrier trades one extra scan+window recomputation for
    # local-storage residency of the trigram stream — the right trade
    # on a warm cluster, and the first action still triggers everything
    # lazily.
    lm_toks = _toks(lm_docs)
    c1 = lm_toks.groupBy(F.col("w").alias("u1")).agg(
        F.count(F.lit(1)).alias("c1")
    ).persist()
    lm_bi = (
        _ngram_stream(lm_docs, 2, text_col, id_col)
        .select(F.col("w1").alias("b1"), F.col("w2").alias("b2"))
        .groupBy("b1", "b2")
        .agg(F.count(F.lit(1)).alias("c2"))
    ).persist()
    lm_tri = (
        _tris(lm_docs)
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c3"))
    ).persist()
    totals = c1.agg(
        F.sum("c1").alias("__N"), F.count(F.lit(1)).alias("__V")
    )

    occ = _tris(docs).persist(StorageLevel.DISK_ONLY)
    keys = occ.select("w1", "w2", "w3").distinct()
    scored_keys = (
        keys.join(lm_tri, ["w1", "w2", "w3"], "left")
        .join(
            lm_bi.select(
                F.col("b1").alias("w1"), F.col("b2").alias("w2"),
                F.col("c2").alias("__c2_ctx"),
            ),
            ["w1", "w2"],
            "left",
        )
        .join(
            lm_bi.select(
                F.col("b1").alias("w2"), F.col("b2").alias("w3"),
                F.col("c2").alias("__c2_bo"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(c1.select(F.col("u1").alias("w2"), F.col("c1").alias("__c1_w2")),
              ["w2"], "left")
        .join(c1.select(F.col("u1").alias("w3"), F.col("c1").alias("__c1_w3")),
              ["w3"], "left")
        .crossJoin(F.broadcast(totals))
    )
    s = (
        F.when(
            F.col("c3").isNotNull(),
            F.col("c3").cast("double") / F.col("__c2_ctx").cast("double"),
        )
        .when(
            F.col("__c2_bo").isNotNull(),
            F.lit(lam)
            * F.col("__c2_bo").cast("double")
            / F.col("__c1_w2").cast("double"),
        )
        .otherwise(
            # lam*lam as an expression, not a Python constant, so the
            # double matches an oracle writing `lam * lam` literally
            F.lit(lam) * F.lit(lam)
            * (F.coalesce(F.col("__c1_w3"), F.lit(0)).cast("double") + F.lit(1.0))
            / (F.col("__N").cast("double") + F.col("__V").cast("double"))
        )
    )
    lp = scored_keys.select(
        "w1", "w2", "w3",
        F.round(F.log(s), 8).cast("decimal(20,8)").alias("__lp"),
    )
    per_doc = (
        occ.join(lp, ["w1", "w2", "w3"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            (split_cast_double(F.sum("__lp"), 8) / F.count(F.lit(1))).alias(
                "avg_logprob"
            ),
        )
    )
    from shaha_spark.caching import registers

    return registers(
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_trigrams"), F.lit(0))
            .cast("bigint")
            .alias("n_trigrams"),
            F.col("avg_logprob"),
        ),
        c1,
        lm_bi,
        lm_tri,
        occ,
    )


def bpe_pair_counts(
    docs: DataFrame,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Adjacent character-pair frequencies over the corpus vocabulary —
    the count table behind one BPE merge step (tokenizer training
    support). Returns the top ``k`` pairs with a total deterministic
    order (count desc, pair asc), so the result is a stable SET.

    Scale shape: pair counting runs over the DISTINCT vocabulary
    weighted by term frequency, not over every token occurrence — at
    100 TB the vocabulary is millions of rows while the corpus is
    trillions of tokens, so the explode fans out of the small side.
    The per-term pair enumeration (sequence + substring) is pure
    whole-stage codegen; the final top-k is a TakeOrderedAndProject,
    never a global sort.
    """
    vocab = (
        tokens(docs, text_col, id_col)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = (
        vocab.filter(F.length("term") >= 2)
        .select(
            "freq",
            F.col("term"),
            F.explode(F.sequence(F.lit(1), F.length("term") - 1)).alias("i"),
        )
        .select(
            F.substring(F.col("term"), F.col("i"), F.lit(2)).alias("pair"), "freq"
        )
    )
    agg = pairs.groupBy("pair").agg(F.sum("freq").alias("cnt"))
    return agg.orderBy(F.col("cnt").desc(), F.col("pair")).limit(k)


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document average unigram log-likelihood under the corpus's
    own unigram LM — the classic cheap fluency/quality score (a
    monotone transform of unigram perplexity).

    Determinism recipe: the only transcendental step, ``ln(tf/total)``,
    is evaluated once per VOCABULARY term (not per token) and rounded
    to 8 decimals — libm implementations agree far beyond that — then
    per-document totals are decimal-exact sums of those rounded values,
    so engine/partitioning cannot reorder anything inexact. The final
    average is one correctly-rounded division.

    Scale: one token explode + hash-agg for the LM (map-side partials),
    the per-term table is vocabulary-sized (broadcastable), and the
    score pass is a broadcast join + one hash-agg on the doc id.
    """
    toks = tokens(docs, text_col, id_col)
    # lazy persist: the vocabulary-sized LM feeds BOTH the total
    # count and the per-term log table — without the boundary each
    # consumer re-derives the token explode from the fact scan
    lm = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    total = lm.agg(F.sum("tf").alias("total"))
    lp = lm.crossJoin(F.broadcast(total)).select(
        "term",
        F.round(
            F.log(F.col("tf").cast("double") / F.col("total").cast("double")), 8
        )
        .cast("decimal(20,8)")
        .alias("lp"),
    )
    from shaha_spark.caching import registers

    return registers(
        toks.join(F.broadcast(lp), "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (split_cast_double(F.sum("lp"), 8) / F.count(F.lit(1))).alias("avg_logprob"),
        ),
        lm,
    )


# ---------------------------------------------------------- BPE training

def _merge_pair_expr(sym_col, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of adjacent
    ``(left, right)`` symbols — one fold (``F.aggregate``) in
    whole-stage codegen, the exact merge rule of the original BPE
    algorithm (Sennrich et al. 2016): scan symbols once; whenever the
    accumulator's last symbol is ``left`` and the incoming one is
    ``right``, replace the pair with their concatenation. A freshly
    merged token can never re-merge as ``left`` within the same pass
    (``left + right != left`` for non-empty ``right``)."""
    merged = left + right
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _adjacent_pairs(syms_col):
    """struct(l, r) array of adjacent symbol pairs; [] for singleton
    symbol lists (``sequence(1, 0)`` would DESCEND, not be empty)."""
    return F.when(
        F.size(syms_col) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms_col) - 1),
            lambda i: F.struct(
                F.element_at(syms_col, i).alias("l"),
                F.element_at(syms_col, i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def bpe_train(
    docs: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> list[tuple[int, str, str, str, int]]:
    """Train ``num_merges`` BPE merges over the corpus vocabulary —
    the full iterative loop behind :func:`bpe_pair_counts` (which is
    one step's count table). Returns the learned merge list
    ``[(step, left, right, merged, pair_count), ...]`` in merge order;
    stops early when no pair reaches ``min_count``.

    Ties on the pair count break lexicographically on (left, right) so
    the merge sequence is deterministic across engines and runs.

    Execution model (the k-means pattern): the driver loop is
    ITERATION control only — each step is one distributed pair-count
    over the frequency-weighted vocabulary (explode of the SMALL
    distinct-term side, map-side-combining hash-agg, top-1 via
    TakeOrderedAndProject) plus one codegen'd fold applying the merge;
    the symbol table is localCheckpoint'ed per step so the plan stays
    one-iteration deep. The only driver transfer is the single winning
    pair per step.

    Cost bound: ``2 * num_merges`` sequential Spark jobs, each
    O(|vocab| · avg_term_len) distributed work — the symbol table is
    VOCAB-sized (distinct terms), never corpus-sized, so per-round
    cost is flat in data volume once the vocabulary saturates. The
    round-trip latency (~0.1-0.3 s/round locally) is what scales
    badly: production-scale merge lists (32k, GPT-2-sized) would cost
    tens of thousands of sequential jobs. For that regime use
    :func:`bpe_train_local`, which is bit-identical (same counts, same
    tie-break, same greedy merge) and pays ONE distributed job total;
    this function refuses ``num_merges > 512`` to keep the
    wrong-shape-at-scale path unmistakable.
    """
    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0, got {num_merges}")
    if num_merges > 512:
        raise ValueError(
            f"num_merges={num_merges}: the per-merge-round Spark-job "
            "shape is wrong past a few hundred merges (2 sequential "
            "jobs per merge). Use bpe_train_local — bit-identical "
            "output, one distributed job."
        )
    vocab = (
        tokens(docs, text_col, id_col)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    syms = vocab.select(
        "freq", F.split("term", "").alias("syms")
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, num_merges + 1):
        top = (
            syms.select("freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_count:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((step, l, r, l + r, cnt))
        syms = syms.withColumn(
            "syms", _merge_pair_expr(F.col("syms"), l, r)
        ).localCheckpoint(eager=True)
    return merges


def bpe_train_local(
    docs: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    max_vocab: int = 5_000_000,
) -> list[tuple[int, str, str, str, int]]:
    """Bit-identical twin of :func:`bpe_train` with the production
    cost shape: ONE distributed job (the frequency-weighted vocabulary
    aggregation — the only corpus-sized work BPE training contains),
    then every merge round runs driver-side over the collected vocab.

    Why this is the 100 TB shape: the vocabulary is MODEL-sized — a
    trillion-token corpus holds a few million distinct terms, and the
    collect is bounded by ``max_vocab`` rows (a loud ValueError past
    it, ~100 MB at the default) — while the merge loop is pure
    CPU on that small table. Trading 2·num_merges sequential Spark
    jobs (latency-bound, see :func:`bpe_train`) for one collect makes
    32k-merge training minutes instead of hours, with byte-identical
    output: same frequency weighting, same (count desc, left, right)
    tie-break, same greedy left-to-right non-overlapping merge rule as
    ``_merge_pair_expr``. Real BPE trainers (e.g. the published
    sentencepiece / GPT-2 implementations) use exactly this split.
    """
    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0, got {num_merges}")
    vocab_df = (
        tokens(docs, text_col, id_col)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    rows = vocab_df.limit(max_vocab + 1).collect()
    if len(rows) > max_vocab:
        raise ValueError(
            f"vocabulary exceeds max_vocab={max_vocab}; raise the bound "
            "explicitly if the driver can hold it"
        )
    syms: list[list[str]] = [list(r.term) for r in rows]
    freqs: list[int] = [r.freq for r in rows]
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, num_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for s, f in zip(syms, freqs):
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        # max count, ties broken lexicographically ascending on (l, r)
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merged = l + r
        merges.append((step, l, r, merged, cnt))
        for s in syms:
            # greedy left-to-right non-overlapping, the exact
            # _merge_pair_expr fold
            out: list[str] = []
            for x in s:
                if out and out[-1] == l and x == r:
                    out[-1] = merged
                else:
                    out.append(x)
            s[:] = out
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a learned BPE merge list: apply each
    merge in training order to every word. Returns
    ``[id_col, term, pieces array<string>]`` — one row per token
    OCCURRENCE, each carrying its BPE pieces.

    Scale trick: merges are applied to the DISTINCT vocabulary (each
    word encoded exactly once, however many times it occurs — at 100 TB
    the vocabulary is millions of rows against trillions of token
    occurrences), then joined back to the token stream on the term.
    The merge chain is pure codegen folds; the symbol table is
    checkpointed every 10 merges so plan depth stays bounded for long
    merge lists.
    """
    toks = tokens(docs, text_col, id_col)
    enc = toks.select("term").distinct().select(
        "term", F.split("term", "").alias("pieces")
    )
    # accept either bare (left, right) pairs or bpe_train's
    # (step, left, right, merged, count) rows
    pairs = [(m[1], m[2]) if len(m) == 5 else (m[0], m[1]) for m in merges]
    for i, (l, r) in enumerate(pairs):
        enc = enc.withColumn("pieces", _merge_pair_expr(F.col("pieces"), l, r))
        if (i + 1) % 10 == 0:
            enc = enc.localCheckpoint(eager=True)
    return toks.join(enc, "term").select(id_col, "term", "pieces")


def bpe_fertility(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars_per_piece: float = 1.5,
) -> DataFrame:
    """Per-document tokenizer-fertility / compression-ratio quality
    signal over the BPE encoding (VERDICT r11 #6b — the
    Gopher/RefinedWeb canon's compression filter: text a subword
    tokenizer cannot compress — near one piece per character — is
    disproportionately gibberish, boilerplate, or the wrong script
    for the vocabulary). One row per document:

      ``n_tokens`` — whitespace-token occurrences;
      ``n_pieces`` — total BPE pieces over all occurrences;
      ``n_chars`` — total characters across tokens (piece-length sum —
      the decode invariant makes the two identical);
      ``fertility`` — pieces per token (round 9; NULL when no tokens);
      ``chars_per_piece`` — the compression ratio (round 9; NULL when
      no tokens);
      ``low_compression`` — chars_per_piece < ``min_chars_per_piece``
      (NULL when undefined), the drop/route flag.

    Built ON :func:`bpe_encode` (same merge application, same
    vocabulary-side encode-then-join shape — the corpus-sized side
    never re-encodes), aggregated with exact integer sums; the two
    ratios are single IEEE divisions of exact longs rounded to 9, so
    both engines agree bit-for-bit. Documents with no tokens keep a
    row (zeros + NULL ratios) via the spine left join.

    Reference parity: none (extension layer, training-data canon).
    """
    enc = bpe_encode(docs, merges, text_col, id_col)
    per = enc.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.size("pieces")).cast("bigint").alias("n_pieces"),
        F.sum(F.length("term")).cast("bigint").alias("n_chars"),
    )
    zero = F.lit(0).cast("bigint")
    fert = F.when(
        F.col("n_tokens") > 0,
        F.round(F.col("n_pieces").cast("double") / F.col("n_tokens"), 9),
    )
    cpp = F.when(
        F.col("n_pieces") > 0,
        F.round(F.col("n_chars").cast("double") / F.col("n_pieces"), 9),
    )
    return (
        docs.select(id_col)
        .join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", zero).alias("n_tokens"),
            F.coalesce("n_pieces", zero).alias("n_pieces"),
            F.coalesce("n_chars", zero).alias("n_chars"),
            fert.alias("fertility"),
            cpp.alias("chars_per_piece"),
            (cpp < F.lit(float(min_chars_per_piece))).alias(
                "low_compression"
            ),
        )
    )


def ppl_pacing_buckets(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 3,
) -> DataFrame:
    """CCNet-style quality pacing: per language, rank documents by
    their average unigram log-likelihood (a monotone transform of
    perplexity) and split into equal-count buckets — bucket 1 is the
    "head" (most fluent), the last bucket the "tail". The bucket
    label is the standard input to head/middle/tail mixture weighting
    during pre-training corpus construction.

    Determinism: the ordering statistic comes from
    :func:`unigram_logprob` (decimal-exact sums of per-VOCAB-term
    rounded logs, one final correctly-rounded division), so both
    engines compute bit-identical doubles; the ``(score desc, id)``
    key makes the NTILE order total.

    Scale: the LM pass is :func:`unigram_logprob`'s (explode +
    hash-agg + broadcast join); bucketing is one per-language ordered
    window — languages parallelize, and within a language NTILE is a
    sort, the unavoidable cost of exact equal-count buckets. For a
    cluster-wide single-language corpus, swap NTILE for fixed score
    thresholds from a previous run (one codegen'd filter, no sort).

    Documents with NO tokens (empty/whitespace-only text) are
    DELIBERATELY absent from the output: perplexity of an empty
    document is undefined, so the inner join against the LM scores
    drops it rather than inventing a bucket. A curation chain that
    must retain such documents should route them through an explicit
    empty-doc branch BEFORE pacing (they carry no LM signal either
    way).
    """
    from pyspark.sql import Window

    lp = unigram_logprob(docs, text_col, id_col)
    joined = docs.select(F.col(id_col), F.col(lang_col)).join(lp, id_col)
    w = Window.partitionBy(lang_col).orderBy(
        F.col("avg_logprob").desc(), F.col(id_col).asc()
    )
    return joined.select(
        F.col(id_col),
        F.col(lang_col),
        F.col("avg_logprob"),
        F.ntile(buckets).over(w).alias("bucket"),
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed keyword
    query — the classic lexical retrieval scorer, complementing the
    tf-idf cosine (tf_cosine_pairs) and the LM scorers.

    score(d) = Σ_{t ∈ Q ∩ d} idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))
    with idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)  (the standard
    non-negative Robertson idf).

    Determinism recipe (same as unigram_logprob): the only
    transcendental, ln, is evaluated once per QUERY TERM and rounded to
    8 decimals; every per-(doc, term) contribution is a chain of
    correctly-rounded double ops with identical shape in any engine,
    rounded to 8 and summed as exact decimals. Corpus stats (N, avgdl)
    ride in-plan via tiny crossJoin broadcasts — one lineage, no
    collected constants.

    Scale: one token explode feeding (a) per-doc lengths and (b) the
    per-query-term tf table, which is filtered to |Q| terms BEFORE its
    aggregation (predicate on the explode output — candidate rows only);
    the df/idf table is |Q| rows, broadcast. One hash-agg on doc_id.

    EVERY document appears in the output: documents matching no query
    term score (n_matched=0, bm25=0.0) via a left join back to the
    doc-id spine — a downstream coverage join or rank fusion must see
    them, not lose them. avgdl deliberately averages over documents
    with ≥1 token (a 0-length doc has no tf rows, so its score is 0
    under any avgdl and including it would only dilute the mean).
    """
    toks = tokens(docs, text_col, id_col)
    qlit = F.array(*[F.lit(t) for t in query_terms])
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n"))
    # dl and tf are each consumed twice below (avgdl + contrib;
    # dfreq + contrib) and Spark re-derives the token explode per
    # consumer — the lazy persists make each aggregate compute once.
    # dl is narrow (id, count) and tf is bounded by |docs|·|Q|; the raw
    # token stream itself stays UNmaterialized, so tokenization runs
    # exactly twice (once per barriered aggregate) — cheaper than
    # holding corpus-scale token rows in block storage.
    dl = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__dl")
    ).persist(StorageLevel.DISK_ONLY)
    avgdl = dl.agg(
        F.sum("__dl").cast("double").alias("__tot"),
        F.count(F.lit(1)).cast("double").alias("__nd"),
    ).select((F.col("__tot") / F.col("__nd")).alias("__avgdl"))
    qtoks = toks.filter(F.array_contains(qlit, F.col("term")))
    tf = qtoks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("__tf")
    ).persist(StorageLevel.DISK_ONLY)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.round(
            F.log(
                (F.col("__n").cast("double") - F.col("__df") + F.lit(0.5))
                / (F.col("__df").cast("double") + F.lit(0.5))
                + F.lit(1.0)
            ),
            8,
        )
        .cast("decimal(20,8)")
        .alias("__idf"),
    )
    contrib = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(avgdl))
        .select(
            F.col(id_col),
            F.round(
                F.col("__idf").cast("double")
                * (F.col("__tf").cast("double") * F.lit(k1 + 1.0))
                / (
                    F.col("__tf").cast("double")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b)
                        * (F.col("__dl").cast("double") / F.col("__avgdl"))
                    )
                ),
                8,
            )
            .cast("decimal(20,8)")
            .alias("__c"),
        )
    )
    scored = contrib.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched"),
        F.sum("__c").cast("double").alias("bm25"),
    )
    from shaha_spark.caching import registers

    return registers(
        docs.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_matched"), F.lit(0).cast("bigint")).alias(
                "n_matched"
            ),
            F.coalesce(F.col("bm25"), F.lit(0.0)).alias("bm25"),
        ),
        dl,
        tf,
    )


# ------------------------------------------------- vocabulary growth


def vocab_growth(
    df: DataFrame,
    n_buckets: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Heaps-law vocabulary-growth curve: cumulative distinct types vs
    cumulative tokens over a deterministic random ordering of the
    corpus (Heaps 1978; the sub-linear type growth V ≈ K·nᵝ is the
    classic corpus-health profile — a near-LINEAR curve means unbounded
    novel vocabulary, i.e. noise/IDs/mojibake, and a too-flat curve
    means heavy template duplication).

    The "ordering" is document-level and hash-derived: each doc lands
    in bucket ``h28(id ∥ salt) % n_buckets`` (the sampling family's
    cross-engine membership hash — reproducible everywhere, stable
    under repartitioning), and the curve reports checkpoints after
    buckets ``0..b``. Random-order growth curves are the standard
    formulation; a crawl-order curve would need a timestamp column the
    corpus does not carry. One row per bucket: per-bucket ``n_tokens``
    and ``n_new_types`` (types whose FIRST bucket this is), cumulative
    ``cum_tokens``/``cum_types``, and ``ttr`` (cumulative type/token
    ratio — a single IEEE division of exact integers).

    Scale shape: explode → two hash-aggs (per-bucket token counts;
    per-type min-bucket, both map-side combined) → a B-row join and a
    B-row cumulative window — the distributed prefix-sum shape shared
    with the bucketed quantile family. Nothing data-sized crosses a
    single partition: the window input is exactly ``n_buckets`` rows.

    Reference parity: none (extension layer, training-data canon).
    """
    from shaha_spark.functions.text import h28
    from shaha_spark.util import ensure_parallelism

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    bucket = (
        h28(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
        % F.lit(n_buckets)
    ).alias("bucket")
    toks = (
        ensure_parallelism(df)
        .select(bucket, F.explode(F.split(F.col(text_col), TOKEN_SPLIT_RE)).alias("term"))
        .filter(F.col("term") != "")
    )
    per_bucket = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    first_bucket = toks.groupBy("term").agg(F.min("bucket").alias("bucket"))
    new_types = first_bucket.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_new_types")
    )
    spine = df.sparkSession.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket")
    )
    joined = (
        spine.join(per_bucket, "bucket", "left")
        .join(new_types, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_new_types", F.lit(0)).cast("long").alias("n_new_types"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    out = joined.select(
        "bucket",
        "n_tokens",
        "n_new_types",
        F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
        F.sum("n_new_types").over(w).cast("long").alias("cum_types"),
    )
    return out.select(
        "*",
        F.when(
            F.col("cum_tokens") > 0,
            F.col("cum_types").cast("double") / F.col("cum_tokens").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("ttr"),
    )


def vocab_growth_sql(
    select_stmt: str,
    n_buckets: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
) -> str:
    """DuckDB oracle twin of :func:`vocab_growth` — same membership
    hash (sampling.h28_sql), same whitespace tokenization, same B-row
    prefix sums."""
    from shaha_spark.operators.sampling import h28_sql

    keyed = f"concat(CAST({id_col} AS VARCHAR), '{salt}')"
    bucket = f"{h28_sql(keyed)} % {n_buckets}"
    return f"""WITH vg_src AS ({select_stmt}),
vg_tok AS (
  SELECT bucket, term FROM (
    SELECT {bucket} AS bucket,
           unnest(regexp_split_to_array({text_col}, '[ \\t\\n\\r]+')) AS term
    FROM vg_src
  ) WHERE term <> ''
),
vg_bt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens FROM vg_tok GROUP BY 1),
vg_ft AS (SELECT term, min(bucket) AS bucket FROM vg_tok GROUP BY 1),
vg_nt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_new_types FROM vg_ft GROUP BY 1),
vg_spine AS (SELECT CAST(unnest(range({n_buckets})) AS BIGINT) AS bucket),
vg_j AS (
  SELECT s.bucket,
    CAST(coalesce(bt.n_tokens, 0) AS BIGINT) AS n_tokens,
    CAST(coalesce(nt.n_new_types, 0) AS BIGINT) AS n_new_types
  FROM vg_spine s
  LEFT JOIN vg_bt bt USING (bucket)
  LEFT JOIN vg_nt nt USING (bucket)
),
vg_c AS (
  SELECT bucket, n_tokens, n_new_types,
    CAST(sum(n_tokens) OVER (ORDER BY bucket
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
    CAST(sum(n_new_types) OVER (ORDER BY bucket
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_types
  FROM vg_j
)
SELECT bucket, n_tokens, n_new_types, cum_tokens, cum_types,
  CASE WHEN cum_tokens > 0
    THEN CAST(cum_types AS DOUBLE) / CAST(cum_tokens AS DOUBLE)
    ELSE 0.0 END AS ttr
FROM vg_c"""


# --------------------------------------------------- Zipf slope


def zipf_slope(
    df: DataFrame,
    top_k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Zipf rank-frequency fit over the corpus's top-``top_k`` terms:
    least-squares slope of ln(count) against ln(rank) (Zipf 1949; a
    natural-language corpus sits near slope −1 — the dual of the
    :func:`vocab_growth` Heaps curve. A too-shallow slope means a
    flat, template/ID-heavy frequency profile; too-steep means a few
    boilerplate tokens dominate).

    One row: ``corpus`` (constant key), ``n`` (terms fitted),
    ``slope``, ``intercept``, ``r2`` — the moments and guards of
    :func:`~shaha_spark.operators.regression.ols_fit`, with the
    transcendental step following the LM family's determinism recipe
    (``round(ln(x), 8)`` before the exact-decimal moments).

    Scale shape: explode → one map-side-combined term hash-agg →
    TakeOrdered top-k (never a global sort) → a k-row rank window
    (policy-sized; GLOBAL_WINDOW_OK) → one scalar moment agg.

    Reference parity: none (extension layer, training-data canon).
    """
    from shaha_spark.operators.regression import ols_fit

    if top_k < 2:
        raise ValueError(f"top_k must be >= 2, got {top_k}")
    counts = (
        tokens(df, text_col, id_col)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(top_k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    ranked = top.select(
        F.lit("all").alias("corpus"),
        F.round(F.log(F.row_number().over(w).cast("double")), 8).alias("__lx"),
        F.round(F.log(F.col("cnt").cast("double")), 8).alias("__ly"),
    )
    return ols_fit(ranked, "corpus", "__lx", "__ly", precision="decimal(18,8)")


def zipf_slope_sql(
    select_stmt: str,
    top_k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle twin of :func:`zipf_slope` — same tokenization,
    top-k order, rounded-ln projection, and exact-decimal moments."""
    from shaha_spark.operators.regression import ols_fit_sql

    inner = f"""(WITH zs_src AS ({select_stmt}),
zs_tok AS (
  SELECT term FROM (
    SELECT unnest(regexp_split_to_array({text_col}, '[ \\t\\n\\r]+')) AS term
    FROM zs_src
  ) WHERE term <> ''
),
zs_cnt AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM zs_tok GROUP BY 1),
zs_top AS (SELECT term, cnt FROM zs_cnt ORDER BY cnt DESC, term ASC LIMIT {top_k})
SELECT 'all' AS corpus,
  round(ln(CAST(row_number() OVER (ORDER BY cnt DESC, term ASC) AS DOUBLE)), 8) AS lx,
  round(ln(CAST(cnt AS DOUBLE)), 8) AS ly
FROM zs_top) zs_ranked"""
    return ols_fit_sql(
        inner, "corpus", "lx", "ly", precision="DECIMAL(18,8)"
    )
