"""Deduplication operators for large-scale training-data pipelines.

Five families, all declarative DataFrame plans (no Python in the data
path) designed for the 100 TB regime:

  exact            hash-groupBy on a content digest — one shuffle, map-side
                   partial agg
  minhash + LSH    shingle → k permutation-min signatures → band buckets →
                   candidate pairs from bucket join (never O(n²))
  simhash          32-bit sign-aggregated fingerprint, hamming-style
                   near-dup by bucket
  n-gram jaccard   exact verification on candidate pairs only
  embedding cosine near-dup over an embedding column

All hashing derives from md5 (cross-engine stable) and the constants in
operators/constants.py, so every step is reproducible in ANSI SQL for
the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

from shaha_spark.functions.text import h28, h32, perm_hash, shingles, tokens
from shaha_spark.util import ensure_parallelism
from shaha_spark.operators.constants import (
    LSH_BANDS,
    LSH_ROWS_PER_BAND,
    MERSENNE_P,
    MINHASH_PERMS,
    MINHASH_SENTINEL,
    SHINGLE_N,
    SIMHASH_BITS,
)



# ---------------------------------------------------------------- exact

def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: keep the lowest id per content digest.

    One hash-shuffle on the digest; with AQE the reducer count adapts to
    the distinct-key cardinality. Returns [id, digest] of survivors.
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_md5"))
        .groupBy("content_md5")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "content_md5")
    )


# -------------------------------------------------------------- minhash

def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = SHINGLE_N,
) -> DataFrame:
    """Per-document MinHash signature: k columns mh_0..mh_{k-1}.

    Shape chosen for scale AND codegen: shingles are exploded so the
    md5-derived shingle hash is computed ONCE per shingle inside
    whole-stage codegen (higher-order-function lambdas are interpreted
    and would re-hash per permutation), then the k permutation-mins are
    a single groupBy with map-side partial aggregation — the only
    shuffle carries k longs per document. Documents with no shingle get
    p (= max sentinel) in every slot via explode_outer + coalesce.

    Two measured per-cost details (optimization round 12):
      * the token array is materialized as a column BEFORE the shingle
        transform — ``shingles(tokens(text))`` inlines the tokenizer
        into every ``element_at`` of the (interpreted) transform
        lambda, re-splitting the text O(shingles) times per document;
        with the projection it is split once (sf0.1: pairs pipeline
        1.05 s → 0.73 s, bit-identical output).
      * the k permutation aggregates are built as ONE SQL string each
        (``F.expr``) instead of ~12 chained Column calls — per-Column
        py4j round trips made plan CONSTRUCTION a driver-side cost of
        the same order as the query itself (guide §7.3: avoid
        generating gigantic expression trees in loops). The parsed
        expression tree is identical.
    """
    toked = ensure_parallelism(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    sh = shingles(F.col("__toks"), shingle_n)
    hashed = toked.select(
        F.col(id_col), F.explode_outer(sh).alias("__shingle")
    ).select(F.col(id_col), h28(F.col("__shingle")).alias("__h"))
    aggs = [
        F.expr(
            f"coalesce(min((CAST({a} AS BIGINT) * __h + {b}) % "
            f"{MERSENNE_P}), CAST({MINHASH_SENTINEL} AS BIGINT))"
        ).alias(f"mh_{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def lsh_bands(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Banding: signature → (band_idx, band_key) rows.

    band_key concatenates the band's minhashes; docs sharing a band key
    are near-dup candidates. Output is LSH_BANDS rows per doc.
    """
    # The banded struct array is rendered as ONE SQL string (a single
    # parser call) instead of ~80 chained Column calls — plan
    # construction was ~150 ms of py4j chatter (optimization round 12,
    # guide §7.3). named_struct parses to the same CreateNamedStruct
    # tree F.struct(...alias...) built; values and schema identical.
    parts = []
    for band in range(LSH_BANDS):
        lo = band * LSH_ROWS_PER_BAND
        keys = ", ".join(
            f"cast(mh_{i} as string)"
            for i in range(lo, lo + LSH_ROWS_PER_BAND)
        )
        parts.append(
            f"named_struct('band_idx', {band}, "
            f"'band_key', concat_ws('-', {keys}))"
        )
    return signatures.select(
        F.col(id_col),
        F.explode(F.expr(f"array({', '.join(parts)})")).alias("band"),
    ).select(id_col, F.col("band.band_idx").alias("band_idx"), F.col("band.band_key").alias("band_key"))


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Candidate pairs: group band rows into buckets, explode each
    bucket's id list into its pairs.

    Single-scan shape: the signature subtree (corpus scan → shingle
    explode → minhash agg → banding) feeds ONE aggregation — a
    bands-self-join would instead evaluate that whole subtree once per
    join side, i.e. scan and re-hash the corpus twice. The bucket
    aggregation carries an array buffer, so Spark plans it sort-based —
    deliberate: a sort-merge self-join would sort the same band rows
    anyway, twice, after shuffling twice the volume.

    Shingle-less documents are excluded BEFORE banding: they all carry
    the identical all-sentinel signature, which at scale would collapse
    into one quadratic mega-bucket — and a document with no shingles has
    no MinHash evidence of similarity to anything anyway. Bucket-size
    blowup from truly identical documents affects self-join and bucket
    explode alike (it is the candidate set itself, not plan overhead);
    run exact_dedup first.

    Returns distinct [id_a < id_b] pairs.
    """
    signatures = signatures.where(F.col("mh_0") != MINHASH_SENTINEL)
    buckets = (
        lsh_bands(signatures, id_col)
        .groupBy("band_idx", "band_key")
        # collect order varies with partitioning, which is fine: the
        # output is a distinct pair SET, invariant to bucket order
        .agg(F.collect_list(F.col(id_col)).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    return (
        buckets.select(F.explode("ids").alias("id_a"), F.col("ids"))
        .select("id_a", F.explode("ids").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def minhash_similarity(
    signatures: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Estimated Jaccard = fraction of matching signature slots, joined
    onto candidate pairs. Two broadcast-eligible joins against the
    (narrow) signature table."""
    k = len(MINHASH_PERMS)
    sig_a = signatures.select(
        F.col(id_col).alias("id_a"), *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(k)]
    )
    sig_b = signatures.select(
        F.col(id_col).alias("id_b"), *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(k)]
    )
    matches = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0) for i in range(k)
    )
    return (
        pairs.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .select(
            "id_a",
            "id_b",
            (matches.cast("double") / F.lit(k)).alias("est_jaccard"),
        )
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
) -> DataFrame:
    """End-to-end MinHash near-dup removal: docs whose estimated Jaccard
    with a LOWER-id doc ≥ threshold are dropped (greedy lowest-id-wins;
    not full connected components — transitive chains keep their
    lowest member per direct edge, the standard large-scale shortcut).

    Returns surviving [id_col] rows.
    """
    sigs = minhash_signatures(df, text_col, id_col).cache()
    pairs = lsh_candidate_pairs(sigs, id_col)
    sims = minhash_similarity(sigs, pairs, id_col)
    losers = sims.where(F.col("est_jaccard") >= threshold).select(
        F.col("id_b").alias(id_col)
    ).distinct()
    # The loser set is tiny (near-dup ids only); materialize it eagerly
    # so the signature cache can be released here instead of leaking
    # storage memory for the session's lifetime in long-running drivers.
    losers = losers.localCheckpoint(eager=True)
    sigs.unpersist()
    return df.select(id_col).join(losers, id_col, "left_anti")


def incremental_minhash_dedup(
    new_docs: DataFrame,
    existing_sigs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
) -> DataFrame:
    """Dedup an incoming batch against an already-ingested corpus — the
    shape production dedup actually runs: signatures for historical
    documents are computed once at ingest and PERSISTED
    (``existing_sigs``, schema = :func:`minhash_signatures` output);
    only the new batch is shingled and hashed here.

    A new document is dropped when its estimated Jaccard is ≥
    ``threshold`` against (a) any existing document sharing an LSH band
    bucket — existing corpus always wins — or (b) a lower-id new
    document (the same greedy shortcut as :func:`minhash_dedup`).
    Id spaces of the two sides must be disjoint.

    Scale shape: new-vs-existing candidates come from an ordinary
    equi-join on (band_idx, band_key) — the corpus side is scanned
    once, and when the batch is small relative to the corpus (the
    normal regime) AQE broadcasts the batch's bands so the persisted
    signature store is never shuffled. Returns surviving new-doc ids.
    """
    sentinel = MINHASH_SENTINEL
    new_sigs = minhash_signatures(new_docs, text_col, id_col).cache()
    new_b = lsh_bands(
        new_sigs.where(F.col("mh_0") != sentinel), id_col
    ).withColumnRenamed(id_col, "id_b")
    old_b = lsh_bands(
        existing_sigs.where(F.col("mh_0") != sentinel), id_col
    ).withColumnRenamed(id_col, "id_a")
    cross_pairs = (
        old_b.join(new_b, ["band_idx", "band_key"])
        .select("id_a", "id_b")
        .distinct()
    )
    all_pairs = cross_pairs.unionByName(
        lsh_candidate_pairs(new_sigs, id_col)
    ).distinct()
    all_sigs = existing_sigs.unionByName(new_sigs)
    sims = minhash_similarity(all_sigs, all_pairs, id_col)
    losers = (
        sims.where(F.col("est_jaccard") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .localCheckpoint(eager=True)
    )
    new_sigs.unpersist()
    return new_docs.select(id_col).join(losers, id_col, "left_anti")


# -------------------------------------------------------------- simhash

def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """SimHash fingerprint: per bit j, sum ±1 over token hashes' bit j;
    fingerprint bit j is 1 iff the sum is positive.

    Same explode + partial-agg shape as MinHash: the token hash is
    codegen'd once per token, the 32 per-bit ±1 sums combine map-side,
    and the shuffle carries 32 longs per document. Tokenless documents
    survive via explode_outer (null hash → sums 0 → fingerprint 0,
    matching the reference-free semantics of 'no content').

    The 32 per-bit aggregates and the 32-term fingerprint recombination
    are built as SQL strings (``F.expr``) — the Column-by-Column form
    cost ~6,000 py4j round trips (~1.2 s of the 1.7 s sf0.1 wall time)
    just to CONSTRUCT the plan (optimization round 12; guide §7.3).
    The parsed trees, and therefore the results, are identical.
    """
    toks = tokens(F.col(text_col))
    hashed = ensure_parallelism(df).select(
        F.col(id_col), F.explode_outer(toks).alias("__tok")
    ).select(F.col(id_col), h32(F.col("__tok")).alias("__h"))
    per_bit = [
        F.expr(
            f"sum(CASE WHEN __h IS NULL THEN 0 WHEN "
            f"(shiftright(__h, {j}) & 1) = 1 THEN 1 ELSE -1 END)"
        ).alias(f"__s_{j}")
        for j in range(bits)
    ]
    sums = hashed.groupBy(id_col).agg(*per_bit)
    fp = " + ".join(
        f"CASE WHEN __s_{j} > 0 THEN CAST({1 << j} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END"
        for j in range(bits)
    )
    return sums.select(F.col(id_col), F.expr(fp).alias("simhash"))


def simhash_near_dup_pairs(
    fingerprints: DataFrame, id_col: str = "doc_id", max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ max_hamming.

    Scale path: block on (max_hamming+1) bit-slices — two fingerprints
    within the distance bound must agree exactly on at least one slice
    (pigeonhole), so the self-join runs on slice buckets, never n².
    """
    n_blocks = max_hamming + 1
    width = bits // n_blocks
    blocks = []
    for blk in range(n_blocks):
        mask = ((1 << width) - 1) << (blk * width)
        if blk == n_blocks - 1:  # last block absorbs remainder bits
            mask = ((1 << (bits - blk * width)) - 1) << (blk * width)
        blocks.append(
            F.struct(
                F.lit(blk).alias("block_idx"),
                F.col("simhash").bitwiseAND(F.lit(mask)).alias("block_key"),
            )
        )
    sliced = fingerprints.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*blocks)).alias("b")
    ).select(id_col, "simhash", F.col("b.block_idx").alias("block_idx"), F.col("b.block_key").alias("block_key"))

    # Same single-scan bucket-explode shape as lsh_candidate_pairs: the
    # fingerprint subtree feeds one aggregation instead of both sides of
    # a self-join (which would token-hash the corpus twice).
    member = F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("fp"))
    buckets = (
        sliced.groupBy("block_idx", "block_key")
        .agg(F.collect_list(member).alias("ms"))  # pair set: order-invariant
        .where(F.size("ms") >= 2)
    )
    exploded = buckets.select(
        F.explode("ms").alias("a"), F.col("ms")
    ).select("a", F.explode("ms").alias("b"))
    xor = F.col("a.fp").bitwiseXOR(F.col("b.fp"))
    return (
        exploded.where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(xor).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ------------------------------------------------------ n-gram jaccard

def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = SHINGLE_N,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs.

    Single-scan shape: instead of joining a [id, shingle_set] projection
    onto both pair sides (which evaluates the shingle subtree once per
    side), the pair list is unpivoted to (id_a, id_b, member_id, side)
    rows and joined ONCE against the exploded shingles of the member
    documents only (semi-join pre-filter, so non-candidate documents are
    never shingled). Counting per (pair, shingle) then per pair gives
    |A∩B|, |A|, |B| with set semantics — duplicate shingles collapse in
    the first aggregation.

    Intended as the verification stage after LSH candidate generation —
    feeding it n² pairs is a caller bug.

    ``pairs`` (typically the whole LSH subtree: corpus scan → signature
    agg → banding → bucket explode) is consumed FIVE times below (two
    unpivot branches, the member semi-join, the shingle-side join, the
    jaccard-0 restore join); Spark re-derives it per consumer, so
    without a boundary this operator re-ran candidate generation five
    times (measured 27 exchanges at sf0.01). The pair list is
    candidate-sized — materializing it lazily is cheap at any corpus
    scale.
    """
    pairs = pairs.persist(StorageLevel.DISK_ONLY)
    stack = pairs.select(
        "id_a", "id_b", F.col("id_a").alias(id_col), F.lit(1).alias("is_a")
    ).unionAll(
        pairs.select(
            "id_a", "id_b", F.col("id_b").alias(id_col), F.lit(0).alias("is_a")
        )
    )
    members = stack.select(id_col).distinct()
    # tokens materialized as a column before the shingle transform —
    # inlining the tokenizer re-splits the text per lambda element_at
    # (see minhash_signatures)
    shingle_rows = (
        ensure_parallelism(df.join(members, id_col, "left_semi"))
        .select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
        .select(
            F.col(id_col),
            F.explode(shingles(F.col("__toks"), shingle_n)).alias("sh"),
        )
    )
    per_shingle = (
        shingle_rows.join(stack, id_col)
        .groupBy("id_a", "id_b", "sh")
        .agg(
            F.max("is_a").alias("has_a"),
            F.max(1 - F.col("is_a")).alias("has_b"),
        )
    )
    counted = per_shingle.groupBy("id_a", "id_b").agg(
        F.sum(F.col("has_a") * F.col("has_b")).alias("inter"),
        F.sum("has_a").alias("la"),
        F.sum("has_b").alias("lb"),
    )
    union = F.col("la") + F.col("lb") - F.col("inter")
    scored = counted.select(
        "id_a",
        "id_b",
        F.when(union > 0, F.col("inter").cast("double") / union)
        .otherwise(F.lit(0.0))
        .alias("jaccard"),
    )
    # pairs whose documents have no shingles produce no counted rows;
    # restore them as jaccard 0.0 (the pre-restructure semantics)
    from shaha_spark.caching import registers

    return registers(
        pairs.join(scored, ["id_a", "id_b"], "left").select(
            "id_a", "id_b", F.coalesce("jaccard", F.lit(0.0)).alias("jaccard")
        ),
        pairs,
    )


# ------------------------------------------------- embedding near-dup

def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_col: str | None = "label",
    threshold: float = 0.98,
) -> DataFrame:
    """Cosine near-duplicate pairs over an embedding column.

    ``bucket_col`` blocks the self-join (an upstream coarse cluster id —
    here the dataset label; in production an LSH/IVF assignment). With a
    block the join is bucket-local; without (None) it degrades to the
    O(n²) cross join — only for small n.
    """
    from shaha_spark.operators.similarity import cosine_sim_hoisted, dot, norm2

    # squared norm hoisted to the (single) pre-join projection: computed
    # once per row, not once per joined pair — bit-identical ops
    norm = df.select(
        F.col(id_col),
        F.col(vec_col),
        norm2(F.col(vec_col)).alias("__n2"),
        *([F.col(bucket_col)] if bucket_col else []),
    )
    a = norm.alias("a")
    b = norm.alias("b")
    on = [F.col(f"a.{bucket_col}") == F.col(f"b.{bucket_col}")] if bucket_col else []
    joined = a.join(b, on=on if on else None, how="inner") if on else a.crossJoin(b)
    sim = cosine_sim_hoisted(
        dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")),
        F.col("a.__n2"),
        F.col("b.__n2"),
    )
    return (
        joined.where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(sim, 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# ------------------------------------------------- edit-distance pairs

def levenshtein_pairs(
    df: DataFrame,
    col: str = "word",
    max_dist: int = 2,
) -> DataFrame:
    """Distinct-value pairs within a Levenshtein edit distance bound —
    the typo/variant-merging pass of wordlist and vocabulary cleaning.

    Blocking: edit distance ≤ d implies length difference ≤ d, so the
    right side fans each value out to its d-neighborhood of lengths
    (bounded 2d+1 fanout) and the join is a plain equi-join on length —
    never an O(n²) cross join. Each unordered pair meets under both
    orientations, so ``a < b`` keeps exactly one. The left side is the
    deduplicated vocabulary (a dimension, not the corpus); Spark's
    built-in ``levenshtein`` evaluates JVM-side in codegen. At 100 TB
    the vocabulary is still orders of magnitude smaller than the
    corpus; for very large vocabularies you add a same-prefix or
    deletion-neighborhood block on top of the length band.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    vals = df.select(F.col(col).alias("v")).distinct()
    left = vals.select(F.col("v").alias("v_a"), F.length("v").alias("__len"))
    right = vals.select(
        F.col("v").alias("v_b"),
        F.explode(
            F.sequence(
                F.greatest(F.length("v") - max_dist, F.lit(0)),
                F.length("v") + max_dist,
            )
        ).alias("__len"),
    )
    return (
        left.join(right, "__len")
        .filter(F.col("v_a") < F.col("v_b"))
        .withColumn("dist", F.levenshtein("v_a", "v_b"))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("v_a").alias("word_a"),
            F.col("v_b").alias("word_b"),
            "dist",
        )
    )


# ------------------------------------------------- candidate-quality eval

def minhash_eval(
    df: DataFrame,
    jaccard_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = SHINGLE_N,
) -> DataFrame:
    """Precision/recall of the LSH candidate generator against exact
    shingle-Jaccard ground truth — the QA gate you run (on a sample)
    before trusting a banding configuration at full scale.

    Ground truth without an O(n²) join: a pair with Jaccard > 0 must
    share at least one shingle, so true pairs are generated from an
    inverted shingle index — group distinct (doc, shingle) rows by
    shingle and explode each posting into its pairs (the same bucket
    construction as the LSH join itself), then count shared shingles
    per pair. |A| and |B| ride along as a window over the doc
    partition (single lineage, no groupBy fork). The Jaccard compare
    is one IEEE division of exact integer counts.

    Returns one row: candidate/truth/hit counts plus precision and
    recall. Empty candidate or truth sets define the corresponding
    ratio as 1.0 (nothing claimable was missed).

    ``jaccard_threshold`` must be > 0: the inverted-index shortcut
    enumerates only pairs sharing ≥ 1 shingle, which covers every pair
    with Jaccard > 0 but not the disjoint pairs a threshold of 0 would
    count — recall against that denominator would be silently inflated.
    """
    if not jaccard_threshold > 0:
        raise ValueError(
            "jaccard_threshold must be > 0 (the shared-shingle ground "
            f"truth excludes disjoint pairs), got {jaccard_threshold}"
        )
    from pyspark.sql import Window

    sh_rows = (
        ensure_parallelism(df)
        # tokens materialized before the shingle transform (see
        # minhash_signatures): split once per doc, not per element_at
        .select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
        .select(
            F.col(id_col),
            F.explode(shingles(F.col("__toks"), shingle_n)).alias("sh"),
        )
        .distinct()
    )
    sized = sh_rows.withColumn(
        "sz", F.count(F.lit(1)).over(Window.partitionBy(id_col))
    )
    postings = sized.groupBy("sh").agg(
        F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("sz"))).alias("ps")
    )
    overlaps = (
        postings.select(F.explode("ps").alias("a"), F.col("ps").alias("pb"))
        .select("a", F.explode("pb").alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.max("a.sz").alias("la"),
            F.max("b.sz").alias("lb"),
        )
    )
    jacc = F.col("inter").cast("double") / (
        F.col("la") + F.col("lb") - F.col("inter")
    ).cast("double")
    truth = (
        overlaps.withColumn("jaccard", jacc)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.lit(1).alias("__t"))
    )
    cand = lsh_candidate_pairs(
        minhash_signatures(df, text_col, id_col, shingle_n), id_col
    ).select("id_a", "id_b", F.lit(1).alias("__c"))
    joined = cand.join(truth, ["id_a", "id_b"], "full_outer")
    # coalesce the sums: agg over an EMPTY join (no candidates and no
    # truth) returns NULL sums, not zeros
    agg = joined.agg(
        F.coalesce(F.sum(F.coalesce("__c", F.lit(0))), F.lit(0))
        .cast("long")
        .alias("n_candidates"),
        F.coalesce(F.sum(F.coalesce("__t", F.lit(0))), F.lit(0))
        .cast("long")
        .alias("n_true"),
        F.coalesce(
            F.sum(F.coalesce("__c", F.lit(0)) * F.coalesce("__t", F.lit(0))),
            F.lit(0),
        )
        .cast("long")
        .alias("n_hit"),
    )
    return agg.select(
        "n_candidates",
        "n_true",
        "n_hit",
        F.when(F.col("n_candidates") == 0, F.lit(1.0))
        .otherwise(F.col("n_hit").cast("double") / F.col("n_candidates").cast("double"))
        .alias("lsh_precision"),
        F.when(F.col("n_true") == 0, F.lit(1.0))
        .otherwise(F.col("n_hit").cast("double") / F.col("n_true").cast("double"))
        .alias("lsh_recall"),
    )


# ------------------------------------------------- semantic dedup

def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.98,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column
    (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication" — public method, re-expressed on
    Spark primitives).

    Two stages, both already scale-shaped:

      1. k-means clustering of the embeddings (:func:`~shaha_spark.
         operators.kmeans.kmeans_fit` — per iteration one broadcast of
         k centroids + one shuffle-free assignment scan);
      2. within-cluster cosine near-dup pairs with the CLUSTER id as
         the blocking key (:func:`embedding_near_dup_pairs`) — the
         self-join is cluster-local, never the O(n²) cross join, and a
         pair is only ever compared once. Greedy lowest-id-wins
         survivor selection, the same convention as
         :func:`minhash_dedup`.

    At 100 TB the cluster count k scales with the corpus (SemDeDup
    uses ~10⁵ clusters for web scale) so each cluster-local join stays
    bounded; the clustering itself is linear scans. Returns surviving
    ``[id_col]`` rows.
    """
    from shaha_spark.operators.kmeans import assign_nearest, kmeans_fit

    centroids = kmeans_fit(df, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
    assigned = assign_nearest(df, centroids, vec_col=vec_col, id_col=id_col)
    pairs = embedding_near_dup_pairs(
        assigned,
        vec_col=vec_col,
        id_col=id_col,
        bucket_col="centroid_id",
        threshold=threshold,
    )
    losers = (
        pairs.select(F.col("id_b").alias(id_col)).distinct().localCheckpoint(eager=True)
    )
    return df.select(id_col).join(losers, id_col, "left_anti")


# ------------------------------------------------- line-level dedup

def dedup_duplicate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
    drop_empty_docs: bool = True,
) -> DataFrame:
    """Corpus-level exact line deduplication (the RefinedWeb / Falcon
    recipe for boilerplate removal): a line appearing in ``min_docs``
    or more DISTINCT documents is removed from every document, and the
    remaining lines are re-joined in their original order.

    Repeats of a line INSIDE one document do not make it a corpus
    duplicate (in-doc repetition is scored by
    :func:`~shaha_spark.operators.terms.ngram_repetition` instead);
    when a corpus-duplicated line is removed it is removed everywhere,
    including its in-doc repeats.

    Shuffle budget (the whole operator, at any scale): one explode +
    hash-shuffle on the line value for the distinct-doc count, one
    shuffle join of the exploded lines against the duplicated-line set
    (both sides keyed on the line), and one hash-shuffle on the doc id
    to reassemble — no window over the full corpus, no driver
    round-trip. The duplicated-line set is usually far smaller than
    the corpus (only lines crossing the threshold), so AQE typically
    turns the middle join into a broadcast.

    Returns ``[id_col, text_col]`` with the cleaned text; documents
    whose every line was removed are dropped when ``drop_empty_docs``
    (the Falcon behavior), else kept with an empty string.

    ``sep`` is a LITERAL separator, matching the re-join below and the
    DuckDB twin's string_split: it is \\Q...\\E-quoted before reaching
    Spark's regex-based split, so a separator like "." or "|" splits
    on the character itself, not on the regex it would otherwise be.
    (A separator containing the literal sequence \\E is rejected — the
    one thing the quoting cannot represent.)
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    if "\\E" in sep:
        raise ValueError(r"sep must not contain the literal sequence \E")
    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), F.lit("\\Q" + sep + "\\E"), -1)
        ).alias("__pos", "__line"),
    )
    dup_lines = (
        lines.select(id_col, "__line")
        .distinct()
        .groupBy("__line")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__line")
    )
    kept = lines.join(dup_lines, "__line", "left_anti")
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                    lambda s: s.getField("__line"),
                ),
                sep,
            ).alias(text_col)
        )
    )
    if drop_empty_docs:
        # a doc with zero surviving lines never reaches the groupBy, but
        # one whose survivors are all empty strings rebuilds to ""
        return rebuilt.where(F.col(text_col) != "")
    # keep fully-scrubbed docs: restore ids the anti-join removed entirely
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(id_col, F.coalesce(text_col, F.lit("")).alias(text_col))
    )


def trigram_fuzzy_pairs(
    df: DataFrame,
    col: str = "word",
    max_dist: int = 2,
    min_len: int = 4,
) -> DataFrame:
    """Distinct-value fuzzy pairs within a Levenshtein bound, blocked
    by SHARED CHARACTER TRIGRAMS — the posting-list join real fuzzy
    matchers use at scale, complementing :func:`levenshtein_pairs`'s
    length band (which alone degrades as strings grow: every length-k
    string meets every other length-±d string regardless of content).

    Blocking soundness: two strings of length ≥ ``min_len`` within
    edit distance d share at least one trigram whenever
    d ≤ (min_len − 3) // 3 + 1 is respected by construction — with
    min_len=4 and d≤2 a common trigram is NOT guaranteed for every
    theoretical pair, so this operator is the standard recall-oriented
    screen: candidates = pairs sharing ≥1 trigram AND within the
    length band, verified by exact ``levenshtein``. (Pairs with zero
    shared trigrams and distance ≤ d exist only for near-total
    rewrites of very short strings; the length-band operator remains
    the exhaustive option.)

    Plan: one explode to (trigram, value) postings, a self equi-join
    on the trigram key (hot trigrams bound the fanout — cap them
    upstream for adversarial vocabularies), distinct pairs, then the
    codegen'd exact verify. Shuffles on the trigram key and the pair
    key only.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if min_len < 3:
        # a value shorter than 3 chars has no trigram: sequence(1, len-2)
        # would DESCEND and emit position-0/negative pseudo-grams
        raise ValueError(f"min_len must be >= 3, got {min_len}")
    vals = df.select(F.col(col).alias("v")).distinct().filter(
        F.length("v") >= min_len
    )
    grams = vals.select(
        "v",
        F.explode_outer(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length("v") - 2),
                    lambda i: F.col("v").substr(i, F.lit(3)),
                )
            )
        ).alias("__g"),
    )
    a = grams.select(F.col("v").alias("v_a"), "__g")
    b = grams.select(F.col("v").alias("v_b"), "__g")
    cands = (
        a.join(b, "__g")
        .where(
            (F.col("v_a") < F.col("v_b"))
            & (
                F.abs(F.length("v_a") - F.length("v_b"))
                <= F.lit(max_dist)
            )
        )
        .select("v_a", "v_b")
        .distinct()
    )
    return cands.select(
        "v_a",
        "v_b",
        F.levenshtein("v_a", "v_b").cast("bigint").alias("dist"),
    ).where(F.col("dist") <= max_dist)


def url_dedup(
    df: DataFrame,
    url_col: str,
    id_col: str = "doc_id",
    suffixes: tuple[str, ...] | None = None,
) -> DataFrame:
    """URL-level dedup keyed on the CANONICAL URL (training-data
    canon: a crawl carries the same page under utm-tagged, cased,
    default-ported, trailing-slashed, param-reordered variants — see
    shaha_spark.functions.url for the canonical form). One row per
    canonical URL: the surviving ``{id_col}`` (min — deterministic),
    the variant count, and the REGISTERED domain (eTLD+1 under the
    public-suffix snapshot) for downstream per-site capping/weighting
    (the registered domain, not the hostname, is the unit
    RefinedWeb-style pipelines cap on).

    Scale shape: ONE hash aggregation on the canonical key with
    map-side partial combine — the canonicalization itself is pure
    codegen'd string algebra on the scan, no UDF, no second shuffle;
    the domain column derives from the already-grouped canonical URL
    (group-count-sized, not data-sized). Rows with NULL URLs are
    excluded (no identity to dedup on).

    ``suffixes`` overrides the multi-label public-suffix snapshot for
    the eTLD+1 attribution (pass the full PSL in production); None
    keeps the shipped default.
    """
    from shaha_spark.functions.url import (
        MULTI_LABEL_SUFFIXES,
        normalize_url,
        registered_domain,
    )

    sfx = MULTI_LABEL_SUFFIXES if suffixes is None else tuple(suffixes)

    return (
        df.where(F.col(url_col).isNotNull())
        .select(normalize_url(F.col(url_col)).alias("canonical_url"), id_col)
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("survivor_" + id_col),
            F.count(F.lit(1)).cast("bigint").alias("n_variants"),
        )
        .select(
            "canonical_url",
            registered_domain(F.col("canonical_url"), sfx).alias(
                "registered_domain"
            ),
            "survivor_" + id_col,
            "n_variants",
        )
    )


def url_policy_scan(
    df: DataFrame,
    url_col: str,
    id_col: str = "doc_id",
    blocked_domains: tuple[str, ...] = (),
    blocked_patterns: tuple[str, ...] = (),
    suffixes: tuple[str, ...] | None = None,
) -> DataFrame:
    """URL policy screening for crawled corpora (training-data canon:
    C4/RefinedWeb-style pipelines drop documents by DOMAIN blocklist
    — spam/adult/boilerplate hosts, keyed on the registered domain so
    subdomains can't dodge the list — and by URL-shape patterns:
    login/signup/search/session pages whose content is template noise).
    Returns ONE ROW PER INPUT DOC with an auditable verdict rather
    than silently filtered survivors:

      ``{id_col}``, ``registered_domain``, ``block_reason``
      (``domain`` — registered domain in the blocklist; ``pattern`` —
      first matching URL regex; ``none``), ``blocked``.

    Keep/drop composes downstream (``.where(~F.col("blocked"))``);
    keeping the reason column is what makes the screen reviewable —
    per-reason counts are one groupBy away, the audit any filtering
    report needs.

    Scale shape: a single codegen'd projection on the scan — the
    blocklist and patterns are config-sized literals (IN-list + rlike
    chain inside whole-stage codegen), no UDF, no join, no shuffle.
    For blocklists too large to inline (millions of domains), join a
    broadcast blocklist table on ``registered_domain`` instead — the
    literal form is the default because policy lists are config, not
    data. NULL URLs report ``none`` with a NULL domain (no URL to
    screen — content-level screens own those rows).

    ``suffixes`` overrides the public-suffix snapshot exactly as in
    :func:`url_dedup`.

    Reference parity: none (extension layer, training-data canon).
    """
    from shaha_spark.functions.url import (
        MULTI_LABEL_SUFFIXES,
        registered_domain,
    )

    sfx = MULTI_LABEL_SUFFIXES if suffixes is None else tuple(suffixes)
    url = F.col(url_col)
    dom = F.when(url.isNotNull(), registered_domain(url, sfx))
    # STAGED projections (r12): the domain expression is materialized
    # once, then the reason chain once, then both derived outputs read
    # plain attributes. In one flat select, every `dom`/`reason`
    # reference re-inlined its whole subtree inside CASE branches,
    # where codegen's subexpression elimination does not reach
    # (conditionally-evaluated branches are exempt) — each row paid
    # the host-regex chain several times over. CollapseProject keeps
    # these stages separate because each intermediate alias is
    # non-cheap and referenced more than once downstream.
    staged = df.select(F.col(id_col), url, dom.alias("__dom"))
    reason = F.lit("none")
    # build the when-chain inside-out so evaluation order is: domain
    # blocklist first, then patterns in declaration order
    for pat in reversed(blocked_patterns):
        reason = F.when(url.isNotNull() & url.rlike(pat), F.lit("pattern")).otherwise(reason)
    if blocked_domains:
        reason = F.when(F.col("__dom").isin(*blocked_domains), F.lit("domain")).otherwise(reason)
    reasoned = staged.select(
        F.col(id_col), F.col("__dom"), reason.alias("__reason")
    )
    return reasoned.select(
        F.col(id_col),
        F.col("__dom").alias("registered_domain"),
        F.col("__reason").alias("block_reason"),
        (F.col("__reason") != "none").alias("blocked"),
    )


def url_policy_scan_sql(
    select_stmt: str,
    url_expr: str,
    id_col: str = "doc_id",
    blocked_domains: tuple[str, ...] = (),
    blocked_patterns: tuple[str, ...] = (),
    suffixes: tuple[str, ...] | None = None,
) -> str:
    """DuckDB oracle twin of :func:`url_policy_scan` — the same
    registered-domain twin, the same blocklist/pattern order.
    Caller-supplied domains/patterns are rendered as SQL literals with
    embedded quotes escaped (r11 ADVICE: a domain or regex containing
    a single quote used to produce broken/injectable oracle SQL)."""
    from shaha_spark.functions.url import (
        MULTI_LABEL_SUFFIXES,
        registered_domain_sql,
    )

    def _lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    sfx = MULTI_LABEL_SUFFIXES if suffixes is None else tuple(suffixes)
    dom = (
        f"CASE WHEN {url_expr} IS NOT NULL THEN "
        f"{registered_domain_sql(url_expr, sfx)} END"
    )
    whens = []
    if blocked_domains:
        bl = ", ".join(_lit(d) for d in blocked_domains)
        whens.append(f"WHEN {dom} IN ({bl}) THEN 'domain'")
    for pat in blocked_patterns:
        whens.append(
            f"WHEN {url_expr} IS NOT NULL AND "
            f"regexp_matches({url_expr}, {_lit(pat)}) THEN 'pattern'"
        )
    if whens:
        chain = "\n    ".join(whens)
        reason_sql = f"CASE\n    {chain}\n    ELSE 'none' END"
    else:
        reason_sql = "'none'"
    return f"""WITH ups AS ({select_stmt})
SELECT {id_col},
  {dom} AS registered_domain,
  {reason_sql} AS block_reason,
  ({reason_sql}) <> 'none' AS blocked
FROM ups"""


# --------------------------------------- cross-source duplication map


def near_dup_source_matrix(
    df: DataFrame,
    edges: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate cross-source matrix: which sources duplicate each
    other, and how much — the mirror-site audit of the dedup canon
    (web-crawl duplication is heavily cross-HOST: the same page behind
    CDN mirrors, www/no-www, scraper re-posts; a matrix row with a
    large CROSS-source count names the mirror pair, while a large
    same-source diagonal cell flags template spam within one site).

    ``edges`` is any (id_a, id_b) near-dup pair list (MinHash/SimHash/
    embedding pairs all compose, same contract as
    :func:`~shaha_spark.operators.sampling.cluster_split`); both
    endpoints must come from ``df`` — pairs with an endpoint missing
    there are dropped by the inner joins, the shared
    edges-derive-from-df contract of the family. A NULL source labels
    as ``''`` (both engines' least/greatest silently SKIP nulls, which
    would mislabel a null↔s pair as same-source (s, s) — the coalesce
    makes "unknown source" an explicit label instead). One row per
    unordered source pair (``source_a`` ≤ ``source_b``
    lexicographically):
    ``n_pairs``, ``cross_source``, and ``pair_frac`` (share of all
    near-dup pairs — a single IEEE division of exact integers).

    Scale shape: two pairs-sized hash joins attach the endpoint
    sources (the pair list is LSH-bucketed upstream — never O(n²)),
    one map-side-combined hash-agg to the matrix, then a global window
    ONLY over the matrix rows (≤ |sources|² — policy-sized, never
    data-sized).

    Reference parity: none (extension layer, training-data canon).
    """
    from pyspark.sql import Window

    src = F.coalesce(F.col(source_col), F.lit(""))
    a = df.select(F.col(id_col).alias("id_a"), src.alias("__sa"))
    b = df.select(F.col(id_col).alias("id_b"), src.alias("__sb"))
    canon = (
        edges.join(a, "id_a")
        .join(b, "id_b")
        .select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
    )
    m = canon.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    total = F.sum("n_pairs").over(Window.partitionBy())
    return m.select(
        "source_a",
        "source_b",
        "n_pairs",
        (F.col("source_a") != F.col("source_b")).alias("cross_source"),
        (F.col("n_pairs").cast("double") / total.cast("double")).alias("pair_frac"),
    )


def near_dup_source_matrix_sql(
    docs_stmt: str,
    edges_stmt: str,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle twin of :func:`near_dup_source_matrix`.
    ``edges_stmt`` may itself be a full WITH…SELECT statement (DuckDB
    accepts a CTE chain inside a parenthesized subquery — the same
    nesting convention as the split_balance twin)."""
    return f"""WITH sm_docs AS ({docs_stmt}),
sm_edges AS ({edges_stmt}),
sm_lab AS (
  SELECT least(coalesce(a.{source_col}, ''), coalesce(b.{source_col}, '')) AS source_a,
         greatest(coalesce(a.{source_col}, ''), coalesce(b.{source_col}, '')) AS source_b
  FROM sm_edges e
  JOIN sm_docs a ON a.{id_col} = e.id_a
  JOIN sm_docs b ON b.{id_col} = e.id_b
),
sm_m AS (
  SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
  FROM sm_lab GROUP BY 1, 2
)
SELECT source_a, source_b, n_pairs,
  source_a <> source_b AS cross_source,
  CAST(n_pairs AS DOUBLE) / CAST(sum(n_pairs) OVER () AS DOUBLE) AS pair_frac
FROM sm_m"""
