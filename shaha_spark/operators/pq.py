"""Product-quantization (PQ) approximate nearest neighbor — the
memory-scale path beyond IVF (Jégou et al. 2011, "Product quantization
for nearest neighbor search" — public method re-expressed on Spark
primitives).

Why PQ at 100 TB: brute force scans full vectors (dim doubles/row);
IVF cuts the scanned FRACTION but still reads full vectors inside the
probed buckets. PQ compresses each vector to ``m`` single-byte-ish
codes (one per subspace), so the scan reads m ints instead of dim
floats — a 10-50× cut in scan width — and scores candidates from a
precomputed per-query lookup table of sub-dot-products (asymmetric
distance computation, ADC). In production PQ composes with IVF
(IVF-PQ): bucket first, then PQ-score inside buckets; the two
operators here are deliberately orthogonal so that composition is a
plain function chain.

Execution shapes:

  * ``pq_train`` — ONE grouped Lloyd run
    (:func:`~shaha_spark.operators.kmeans.kmeans_fit_grouped`) over the
    (sub_id, subvector) explosion: each iteration is a single
    broadcast-assign scan + partial-agg means covering all m subspaces
    at once; results are bit-identical to m independent fits.
  * ``pq_encode`` — ONE corpus scan: the m×k codebook broadcasts, each
    row computes its m nearest sub-centroids entirely inside
    higher-order expressions (no explode, no shuffle), and carries its
    exact vector norm alongside so cosine can be reconstructed at
    query time.
  * ``pq_topk`` — queries × codebook (both small) build the per-query
    ADC table driver-free; the corpus codes join the broadcast table
    and each row's approximate dot is an m-term fold over its codes.
    One shuffle total: the per-query top-k window.

Determinism: all arithmetic is the same strict left-to-right double
fold as :mod:`~shaha_spark.operators.similarity`; assignment ties
break on centroid id. No RNG anywhere (kmeans seeds are the lowest-id
rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from shaha_spark.operators.similarity import dot, norm


def _subvec(vec_col, sub: int, sub_dim: int):
    """1-based slice of subspace ``sub`` (0-based index)."""
    return F.slice(vec_col, sub * sub_dim + 1, sub_dim)


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Train per-subspace codebooks: the vector dimension is split into
    ``m`` contiguous subspaces and each gets a deterministic k-means
    codebook. Returns ``[sub_id, centroid_id, centroid]`` with
    ``m × k`` rows (broadcastable by construction).

    dim must be divisible by m (PQ's usual constraint; pad upstream if
    not).
    """
    first = (
        corpus.where(F.col(vec_col).isNotNull())
        .select(F.size(vec_col).alias("d"))
        .first()
    )
    if first is None:
        raise ValueError("empty corpus (or all-NULL embeddings)")
    dim = first["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_dim = dim // m

    # ONE grouped Lloyd run instead of m sequential kmeans_fit calls
    # (optimization round 12, guide §2.6/§1.2-1: the m sub-problems are
    # independent, and running them sequentially serialized ~7 driver-
    # synchronized jobs per subspace — worse, each iteration re-scanned
    # the corpus once PER SUBSPACE; keyed by sub_id it is one scan per
    # iteration at any m). Bit-identity with the sequential form is
    # argued step-by-step in kmeans_fit_grouped and pinned by
    # tests/test_optimization_r12.py against the legacy loop.
    slices = F.array(
        *[
            F.struct(
                F.lit(sub).alias("sub_id"),
                _subvec(F.col(vec_col), sub, sub_dim).alias("v"),
            )
            for sub in range(m)
        ]
    )
    data = corpus.select(F.col(id_col), F.explode(slices).alias("s")).select(
        F.col(id_col),
        F.col("s.sub_id").alias("sub_id"),
        F.col("s.v").alias(vec_col),
    )

    # seeds: kmeans_fit takes the k lowest-id rows of its input; every
    # subspace slice carries the same id set, so the per-sub seeds are
    # the k lowest-id corpus vectors, sliced — computed with ONE
    # TakeOrdered, then fanned out to the m groups
    seeds = corpus.select(F.col(id_col), F.col(vec_col)).orderBy(
        F.col(id_col).asc()
    ).limit(k)
    from pyspark.sql import Window

    init = (
        seeds.withColumn(
            "centroid_id",
            F.row_number().over(Window.orderBy(F.col(id_col).asc())),
        )
        .select("centroid_id", F.explode(slices).alias("s"))
        .select(
            F.col("s.sub_id").alias("sub_id"),
            "centroid_id",
            F.col("s.v").alias("centroid"),
        )
        .withColumn("n_members", F.lit(0).cast("bigint"))
    )

    from shaha_spark.operators.kmeans import kmeans_fit_grouped

    out = kmeans_fit_grouped(
        data, init, iters=iters, vec_col=vec_col, id_col=id_col,
        group_col="sub_id",
    ).select("sub_id", "centroid_id", "centroid")
    # m*k rows — pin them so downstream broadcasts don't re-run the fit
    return out.localCheckpoint(eager=True)


def ivf_pq_train(
    corpus: DataFrame,
    k_coarse: int = 8,
    m: int = 4,
    k_sub: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """Train the coarse IVF centroids AND the m PQ sub-codebooks in ONE
    grouped Lloyd run (optimization round 12, guide §1.2-1/§2.6: the
    coarse fit and the m sub-fits are m+1 independent k-means problems
    that :func:`build_ivf_pq_index` / the in-plan IVF-PQ chain ran
    SEQUENTIALLY — two full sets of driver-synchronized iteration jobs
    where one suffices). The coarse problem rides along as group −1
    with the FULL vectors; groups 0..m−1 are the subspace slices, so
    each iteration is a single broadcast-assign scan + one partial-agg
    means job covering all m+1 fits.

    Bit-identity: :func:`~shaha_spark.operators.kmeans.kmeans_fit_grouped`
    runs every group's trajectory exactly as
    :func:`~shaha_spark.operators.kmeans.kmeans_fit` would on that
    group's rows alone (same scoring expressions, argmax window keyed
    by (group, id), order-free decimal means), so the coarse result
    equals ``kmeans_fit(corpus, k_coarse, iters)`` and the codebooks
    equal ``pq_train(corpus, m, k_sub, iters)`` — pinned in
    tests/test_optimization_r12.py against both legacy calls.

    Returns ``(coarse, codebooks)``:
    ``coarse = [centroid_id, centroid, n_members]``,
    ``codebooks = [sub_id, centroid_id, centroid]``.
    """
    first = (
        corpus.where(F.col(vec_col).isNotNull())
        .select(F.size(vec_col).alias("d"))
        .first()
    )
    if first is None:
        raise ValueError("empty corpus (or all-NULL embeddings)")
    dim = first["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_dim = dim // m

    # group −1 carries the full vector (the coarse problem); 0..m−1 the
    # subspace slices. Data volume per scan doubles (dim + m·sub_dim),
    # but the JOB count halves versus the sequential pair of fits.
    slices = F.array(
        F.struct(F.lit(-1).alias("sub_id"), F.col(vec_col).alias("v")),
        *[
            F.struct(
                F.lit(sub).alias("sub_id"),
                _subvec(F.col(vec_col), sub, sub_dim).alias("v"),
            )
            for sub in range(m)
        ],
    )
    data = corpus.select(F.col(id_col), F.explode(slices).alias("s")).select(
        F.col(id_col),
        F.col("s.sub_id").alias("sub_id"),
        F.col("s.v").alias(vec_col),
    )

    # seeds: each fit takes the k lowest-id rows of ITS input — the same
    # lowest-id corpus rows for every group, so ONE TakeOrdered of
    # max(k_coarse, k_sub) rows feeds all m+1 groups, trimmed per group
    # to its own k
    k_seed = max(k_coarse, k_sub)
    seeds = corpus.select(F.col(id_col), F.col(vec_col)).orderBy(
        F.col(id_col).asc()
    ).limit(k_seed)
    numbered = seeds.withColumn(
        "centroid_id",
        F.row_number().over(Window.orderBy(F.col(id_col).asc())),
    )
    init = (
        numbered.select("centroid_id", F.explode(slices).alias("s"))
        .select(
            F.col("s.sub_id").alias("sub_id"),
            "centroid_id",
            F.col("s.v").alias("centroid"),
        )
        .where(
            (
                (F.col("sub_id") == -1)
                & (F.col("centroid_id") <= F.lit(k_coarse))
            )
            | ((F.col("sub_id") >= 0) & (F.col("centroid_id") <= F.lit(k_sub)))
        )
        .withColumn("n_members", F.lit(0).cast("bigint"))
    )

    from shaha_spark.operators.kmeans import kmeans_fit_grouped

    out = kmeans_fit_grouped(
        data, init, iters=iters, vec_col=vec_col, id_col=id_col,
        group_col="sub_id",
    )
    # model-sized (k_coarse + m*k_sub rows), already checkpointed by the
    # grouped fit — the splits below filter local blocks, no recompute
    coarse = out.where(F.col("sub_id") == -1).select(
        "centroid_id", "centroid", "n_members"
    )
    books = out.where(F.col("sub_id") >= 0).select(
        "sub_id", "centroid_id", "centroid"
    )
    return coarse, books


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode each vector as ``m`` codes (nearest sub-centroid per
    subspace, max sub-dot with id-asc ties) plus its exact L2 norm.
    Returns ``[id_col, codes array<int>, vnorm double]``.

    One shuffle-free corpus scan: the codebook is collected once
    (m × k rows — the PQ contract) into a literal array so the argmax
    over sub-centroids runs inside whole-stage codegen per row, with no
    explode and no join at all.
    """
    rows = codebooks.select("sub_id", "centroid_id", "centroid").collect()
    m = 1 + max(r["sub_id"] for r in rows)
    sub_dim = len(rows[0]["centroid"])
    by_sub: dict[int, list] = {}
    for r in rows:
        by_sub.setdefault(r["sub_id"], []).append(r)
    for sub in by_sub:
        by_sub[sub].sort(key=lambda r: r["centroid_id"])

    def best_code(sub: int):
        subv = _subvec(F.col(vec_col), sub, sub_dim)
        # struct(-dot, centroid_id) minimum = max dot, ties id-asc
        cands = F.array(
            *[
                F.struct(
                    (-dot(subv, F.array(*[F.lit(float(x)) for x in r["centroid"]])))
                    .alias("nd"),
                    F.lit(r["centroid_id"]).alias("cid"),
                )
                for r in by_sub[sub]
            ]
        )
        return F.array_min(cands).getField("cid")

    return corpus.select(
        F.col(id_col),
        F.array(*[best_code(s) for s in range(m)]).alias("codes"),
        norm(F.col(vec_col)).alias("vnorm"),
    )


def pq_distortion(
    corpus: DataFrame,
    codebooks: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int = 20,
) -> dict:
    """Write-time quantization-quality signal (VERDICT r10 #6): mean
    RELATIVE squared reconstruction error of the trained codebooks
    over a deterministic ~1/``sample_mod`` hash-sample of the corpus —
    ``mean(||v − reconstruct(encode(v))||² / ||v||²)``, scale-free in
    [0, ~1]. Near 0 = the codebooks explain the corpus (clusterable
    data); near 1 = the codes carry almost no signal and PQ recall
    will be poor — the failure mode a user otherwise discovers only at
    query time (the random-fixture recall@5 = 0.23 of BENCH r9/r10).
    Emitted into the index-build summary + quality sidecar so
    unsuitable corpora are flagged AT INGEST.

    Same execution shape as :func:`pq_encode` (broadcast codebook
    literals, one shuffle-free scan over the SAMPLE, then one scalar
    agg); zero-norm vectors are excluded (no relative error exists).
    """
    rows = codebooks.select("sub_id", "centroid_id", "centroid").collect()
    m = 1 + max(r["sub_id"] for r in rows)
    sub_dim = len(rows[0]["centroid"])
    by_sub: dict[int, list] = {}
    for r in rows:
        by_sub.setdefault(r["sub_id"], []).append(r)
    for sub in by_sub:
        by_sub[sub].sort(key=lambda r: r["centroid_id"])

    from shaha_spark.functions.text import h28

    sample = corpus
    if sample_mod > 1:
        sample = corpus.filter(
            h28(F.col(id_col).cast("string")) % sample_mod == 0
        )

    def residual_sq(sub: int):
        subv = _subvec(F.col(vec_col), sub, sub_dim)
        cands = F.array(
            *[
                F.struct(
                    (-dot(subv, F.array(*[F.lit(float(x)) for x in r["centroid"]])))
                    .alias("nd"),
                    F.lit(r["centroid_id"]).alias("cid"),
                    F.array(*[F.lit(float(x)) for x in r["centroid"]]).alias("cent"),
                )
                for r in by_sub[sub]
            ]
        )
        chosen = F.array_min(cands).getField("cent")
        return F.aggregate(
            F.zip_with(subv, chosen, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    per_vec = sample.select(
        sum(
            (residual_sq(s) for s in range(1, m)),
            residual_sq(0),
        ).alias("__res"),
        (norm(F.col(vec_col)) * norm(F.col(vec_col))).alias("__n2"),
    ).where(F.col("__n2") > 0)
    agg = per_vec.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("__res") / F.col("__n2")).alias("rel"),
    ).first()
    n_sampled = int(agg["n"] or 0)
    rel = float(agg["rel"]) if agg["rel"] is not None else None
    return {
        "n_sampled": n_sampled,
        "mean_rel_sq_err": round(rel, 6) if rel is not None else None,
        # past this, most of the sampled energy is unexplained by the
        # codebooks — recall will disappoint; rebuild with more
        # centroids or accept exact/IVF scoring instead
        "high_distortion": bool(rel is not None and rel > 0.25),
    }


def _adc_score(
    coded: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    per_query_codes: bool,
) -> DataFrame:
    """Shared ADC scoring tail of :func:`pq_topk` and
    :func:`ivf_pq_topk`: build the broadcast per-query
    (sub, code) → partial-dot table, aggregate each coded row's m
    entries, re-rank, top-k.

    ``per_query_codes`` = the coded frame already carries
    ``query_id_col`` (the IVF-probed case) — the ADC join then keys on
    (query, sub, code) so each code row scores only against its own
    query's table.

    Determinism (the module's cross-engine contract): each partial dot
    is rounded to 9 decimals and summed as exact DECIMAL — double
    addition is non-associative and the m addends arrive in
    shuffle-dependent order, so a raw F.sum could flip ulp-close ranks
    across runs or engines. The rank window orders by the ROUNDED
    6-decimal cosine (like every sibling top-k), id ascending.
    """
    sub_dim_row = codebooks.select(F.size("centroid").alias("d")).first()
    if sub_dim_row is None:
        raise ValueError("empty codebooks")
    sub_dim = sub_dim_row["d"]
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qv"),
        norm(F.col(vec_col)).alias("__qnorm"),
    )
    adc = (
        q.crossJoin(F.broadcast(codebooks))
        .select(
            query_id_col,
            "__qnorm",
            "sub_id",
            F.col("centroid_id").alias("code"),
            F.round(
                dot(
                    _subvec(F.col("__qv"), F.col("sub_id"), sub_dim),
                    F.col("centroid"),
                ),
                9,
            )
            .cast("decimal(25,9)")
            .alias("__pdot"),
        )
    )
    explode_cols = [F.col(id_col), F.col("vnorm")]
    join_keys = ["sub_id", "code"]
    if per_query_codes:
        explode_cols.insert(0, F.col(query_id_col))
        join_keys = [query_id_col, "sub_id", "code"]
    exploded = coded.select(
        *explode_cols, F.posexplode("codes").alias("sub_id", "code")
    )
    scored = (
        exploded.join(F.broadcast(adc), join_keys)
        .groupBy(query_id_col, id_col)
        .agg(
            F.round(
                F.sum("__pdot").cast("double")
                / (F.first("__qnorm") * F.first("vnorm")),
                6,
            ).alias("approx_cosine")
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "approx_cosine", "rank")
    )


def pq_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance top-k: approximate cosine between each query
    and each encoded corpus vector, scored from the per-query table of
    query-subvector × sub-centroid dot products.

    ``approx_dot(q, x) = Σ_sub table[q, sub, code_sub(x)]`` and
    ``approx_cosine = approx_dot / (‖q‖ · ‖x‖)`` using the exact norms
    (stored at encode time — the standard ADC-with-true-norms variant,
    which keeps self-matches at rank 1).

    The ADC table is ``n_queries × m × k`` rows — built from two
    broadcast-sized inputs and itself broadcast; the corpus-code scan
    aggregates its m (sub, code) entries against the table via an
    explode + hash-agg keyed on (query, id): the explode fans out m
    small int rows per corpus vector (m ≪ dim — this is exactly the
    width PQ saved), partial aggregation combines map-side, and the
    only full shuffle is the per-query top-k window over already-
    aggregated (query, id) scores. Scoring and ranking live in
    :func:`_adc_score` (shared with :func:`ivf_pq_topk`), which sums
    the partial dots as exact decimals and ranks on the rounded
    cosine — the module's determinism contract.
    """
    return _adc_score(
        codes, codebooks, queries, k, vec_col, id_col, query_id_col,
        per_query_codes=False,
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    coarse_centroids: DataFrame,
    codebooks: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-PQ: the production large-scale ANN composition — coarse IVF
    bucketing restricts WHICH vectors are scored (nprobe/n_centroids of
    the corpus), PQ codes restrict HOW WIDE each scored row is (m ints
    instead of dim floats). This function is a plain chain of the two
    orthogonal operators:

      1. :func:`~shaha_spark.operators.similarity.ivf_assign` buckets
         the corpus by nearest coarse centroid (write-time in
         production — the same caveat as ivf_topk);
      2. :func:`pq_encode` compresses every vector to codes + norm
         (also write-time in production);
      3. each query probes its ``nprobe`` nearest coarse buckets and
         PQ-scores ONLY the codes inside them via the broadcast ADC
         table; the per-query top-k window is the single full shuffle.

    Residual encoding (classic IVF-PQ quantizes vector − centroid) is
    deliberately not used: cosine scoring with true stored norms does
    not decompose over residuals, and the plain-code variant keeps both
    operators reusable standalone.
    """
    from shaha_spark.operators.similarity import cosine_sim, ivf_assign

    coarse = coarse_centroids.localCheckpoint(eager=True)
    # the query batch feeds both the coarse probe and the ADC scorer;
    # without a boundary its derivation re-runs per consumer, and the
    # extra consumers make the plan's scan count depend on surrounding
    # join strategy (observed 5 vs 6 corpus scans across sessions).
    # Query batches are small by contract.
    queries = queries.persist()
    assigned = ivf_assign(corpus, coarse, vec_col, id_col)
    codes = pq_encode(corpus, codebooks, vec_col, id_col)
    bucketed_codes = codes.join(
        assigned.select(id_col, "centroid_id"), id_col
    )
    q_probe = (
        queries.crossJoin(F.broadcast(coarse))
        .select(
            query_id_col,
            F.col(vec_col),
            F.col("centroid_id"),
            cosine_sim(F.col(vec_col), F.col("centroid")).alias("__sim"),
        )
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy(
                    F.col("__sim").desc(), F.col("centroid_id").asc()
                )
            ),
        )
        .where(F.col("__r") <= nprobe)
        .select(query_id_col, "centroid_id")
    )
    # keep only codes in probed buckets, then delegate scoring; the
    # probe pairs are (query, bucket) — broadcast-joined, so the corpus
    # code table is filtered in place with no extra shuffle
    probed = bucketed_codes.join(
        F.broadcast(q_probe), "centroid_id"
    ).select(id_col, "codes", "vnorm", query_id_col)
    from shaha_spark.caching import registers

    return registers(
        _adc_score(
            probed, codebooks, queries, k, vec_col, id_col, query_id_col,
            per_query_codes=True,
        ),
        queries,
    )
