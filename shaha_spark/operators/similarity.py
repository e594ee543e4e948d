"""Similarity search over an embedding column (array<float>).

Two paths:
  * brute-force cosine top-k — the exact baseline; cost n_queries × n,
    kept sane by broadcasting the (small) query side so the corpus is
    scanned once with no shuffle before the per-query top-k.
  * IVF (inverted-file) top-k — the scale path: corpus is bucketed by
    nearest centroid once (write-time in production), queries probe
    only ``nprobe`` buckets, cutting the scanned fraction to
    nprobe/n_centroids.

The dot/norm arithmetic is a strict left-to-right fold in DOUBLE
(F.aggregate over zip_with) — deterministic across runs and cluster
layouts; exposed cosine values are rounded to 6 decimals for
cross-engine comparability (see cosine_sim).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from shaha_spark.operators.profile import split_cast_double


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2(a: Column) -> Column:
    """Squared L2 norm (sequential double fold)."""
    return F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )


def norm(a: Column) -> Column:
    return F.sqrt(norm2(a))


def cosine_sim(a: Column, b: Column) -> Column:
    # dot / sqrt(na * nb): single sqrt of the product keeps self-similarity
    # at exactly 1.0 (sqrt(x)*sqrt(x) drifts a ulp above). External engines
    # (e.g. DuckDB's list_cosine_similarity) use FMA/unrolled accumulation
    # that differs in the last ulp, so operators exposing cosine VALUES
    # round to 6 decimals — unlike ratio outputs, cosines of real-valued
    # data do not land on decimal half-boundaries, so rounding is safe AND
    # necessary here.
    return dot(a, b) / F.sqrt(norm2(a) * norm2(b))


def cosine_sim_hoisted(d: Column, na2: Column, nb2: Column) -> Column:
    """:func:`cosine_sim` with the squared norms precomputed: the SAME
    three IEEE ops on the SAME operand values (dot / sqrt(na2 * nb2)),
    so results are bit-identical — but in a pair-scoring join the
    norms are evaluated once per INPUT ROW (carried as one double)
    instead of once per PAIR. That matters because the array folds are
    interpreted higher-order functions, not codegen: per-pair norm
    recomputation triples the interpreted work of every broadcast
    scoring stage (measured 2×+ on brute_force_topk at sf0.1)."""
    return d / F.sqrt(na2 * nb2)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query.

    The scoring leg is an Arrow-batched numpy kernel (optimization
    round 12, guide §4.2: hand whole batches to vectorized native
    code instead of per-pair interpreted expression evaluation): the
    query batch — small by construction, the same bound that justified
    broadcasting it before — is collected to the driver ONCE at plan
    construction and closed over by a ``mapInArrow`` function, so the
    corpus is still scanned exactly once with no shuffle before the
    per-query top-k. Per corpus batch one ``einsum`` computes every
    (row, query) dot product; ``optimize=False`` keeps the k-loop
    accumulation order fixed so a pair's score does not depend on how
    the corpus was batched or partitioned. Cosines are rounded to 6
    decimals IN SPARK (same operator as before), which absorbs the
    last-ulp accumulation difference vs the old sequential fold —
    verified value-identical on every fixture. Measured sf0.1:
    0.77 → 0.54 s; the gap widens with n·q (the old per-pair
    higher-order-function fold was interpreted, never codegen'd).

    Null semantics match the fold path: a null vector, a null element,
    or a corpus/query length mismatch yields a null cosine for that
    pair (nulls sort last under the rank window). Ties break
    deterministically on corpus id. One divergence at a previously
    UNDEFINED point: a zero-norm vector now scores NaN (IEEE 0/0)
    where the fold path raised DIVIDE_BY_ZERO under ANSI mode — the
    numpy kernel is total where the old one crashed.
    """
    import numpy as np
    import pyarrow as pa

    qid_dt = queries.schema[query_id_col].dataType.simpleString()
    cid_dt = corpus.schema[id_col].dataType.simpleString()
    qrows = queries.select(F.col(query_id_col), F.col(vec_col)).collect()

    # group the valid query vectors by dimension: a pair's cosine is
    # non-null only when lengths match (zip_with semantics), so each
    # dim group scores only corpus rows of that length
    def _ok(v) -> bool:
        return v is not None and all(x is not None for x in v)

    qids = [r[0] for r in qrows]
    n_q = len(qids)
    dim_groups: dict[int, tuple[list[int], "np.ndarray", "np.ndarray"]] = {}
    by_dim: dict[int, list[int]] = {}
    for i, r in enumerate(qrows):
        if _ok(r[1]):
            by_dim.setdefault(len(r[1]), []).append(i)
    for d, idxs in by_dim.items():
        Q = np.array([list(qrows[i][1]) for i in idxs], dtype=np.float64)
        qn2 = np.einsum("ij,ij->i", Q, Q, optimize=False)
        dim_groups[d] = (idxs, Q, qn2)

    out_schema = f"`{query_id_col}` {qid_dt}, `{id_col}` {cid_dt}, __cos double"

    def score(batches):
        qid_arr = pa.array(qids)
        for b in batches:
            n = b.num_rows
            if n == 0 or n_q == 0:
                continue
            ids = b.column(0)
            lst = b.column(1)
            list_null = pa.compute.is_null(lst).to_numpy(
                zero_copy_only=False
            ).astype(bool)
            lens = pa.compute.list_value_length(lst)
            lens_f = np.where(
                list_null,
                0,
                lens.to_numpy(zero_copy_only=False),
            ).astype(np.int64)
            flat = lst.flatten()
            vals = flat.to_numpy(zero_copy_only=False).astype(np.float64)
            ends = np.cumsum(lens_f)
            starts = ends - lens_f
            # element-NULL mask from Arrow, NOT isnan: a literal NaN
            # value must flow through and score NaN (as the fold did),
            # while a null ELEMENT nulls the whole pair
            elem_null = pa.compute.is_null(flat).to_numpy(
                zero_copy_only=False
            ).astype(bool)
            cum = np.concatenate(([0], np.cumsum(elem_null)))
            row_has_null_elem = (cum[ends] - cum[starts]) > 0
            cos = np.zeros((n, n_q), dtype=np.float64)
            mask = np.zeros((n, n_q), dtype=bool)  # True = non-null
            for d, (qcols, Q, qn2) in dim_groups.items():
                rows = np.flatnonzero(~list_null & (lens_f == d))
                if rows.size == 0:
                    continue
                rows = rows[~row_has_null_elem[rows]]
                if rows.size == 0:
                    continue
                idx = (starts[rows, None] + np.arange(d)[None, :]).ravel()
                A = vals[idx].reshape(rows.size, d)
                dots = np.einsum("ik,jk->ij", A, Q, optimize=False)
                cn2 = np.einsum("ij,ij->i", A, A, optimize=False)
                with np.errstate(invalid="ignore", divide="ignore"):
                    c = dots / np.sqrt(cn2[:, None] * qn2[None, :])
                cos[np.ix_(rows, qcols)] = c
                mask[np.ix_(rows, qcols)] = True
            yield pa.RecordBatch.from_arrays(
                [
                    qid_arr.take(pa.array(np.tile(np.arange(n_q), n))),
                    ids.take(pa.array(np.repeat(np.arange(n), n_q))),
                    pa.array(cos.ravel(), mask=~mask.ravel()),
                ],
                names=[query_id_col, id_col, "__cos"],
            )

    scored = corpus.select(F.col(id_col), F.col(vec_col)).mapInArrow(
        score, out_schema
    ).select(
        query_id_col,
        id_col,
        F.round(F.col("__cos"), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine).

    Centroids are broadcast; assignment is one scan + a per-vector
    argmax as a partial-aggregable ``max(struct(sim, −cid, …))``
    (optimization round 12, guide §2.3/§2.4 — a SortAggregate, so the
    map-side sort remains; the win over the old rank-1 window is the
    map-side combine of k·n vector-carrying rows to n before the
    exchange and the leaner reduce side, see kmeans.assign_nearest and
    OPTIMIZATION_r12.md §16). The −cid tie-break requires the caller's
    ``centroid_id_col`` to be numeric and non-NULL (all in-repo
    producers assign dense ints; a NULL id would win differently from
    the legacy window's asc-NULLS-FIRST ordering, and negation
    overflows at INT64_MIN under ANSI). In production the assignment
    is persisted/bucketed at write time so queries never recompute it.
    """
    c = F.broadcast(
        centroids.select(
            centroid_id_col,
            centroid_vec_col,
            norm2(F.col(centroid_vec_col)).alias("__ctn2"),
        )
    )
    scored = corpus.withColumn("__vn2", norm2(F.col(vec_col))).crossJoin(
        c
    ).select(
        F.col(id_col),
        F.col(vec_col),
        F.col(centroid_id_col),
        cosine_sim_hoisted(
            dot(F.col(vec_col), F.col(centroid_vec_col)),
            F.col("__vn2"),
            F.col("__ctn2"),
        ).alias("__sim"),
    )
    best = scored.groupBy(id_col).agg(
        F.max(
            F.struct(
                F.col("__sim").alias("s"),
                (-F.col(centroid_id_col)).alias("nc"),
                F.col(centroid_id_col).alias("cid"),
                F.col(vec_col).alias("v"),
            )
        ).alias("__b")
    )
    return best.select(
        F.col(id_col),
        F.col("__b.v").alias(vec_col),
        F.col("__b.cid").alias(centroid_id_col),
    )


def label_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    with_counts: bool = False,
    group_col: str | None = None,
) -> DataFrame:
    """Mean vector per label — a cheap stand-in for k-means centroids
    (the IVF structure is identical; swap in real k-means offline).

    The per-position mean accumulates in DECIMAL (exact, order-free)
    and divides once in DOUBLE: float summation order varies with
    partitioning, so a plain avg() would make the centroids — and any
    assignment decided by a near-tie — depend on the physical plan.

    This is the ONE home of the decimal-mean/array_sort reassembly
    recipe — kmeans._means delegates here (``with_counts=True`` adds
    ``n_members``), so a precision or rounding tweak cannot desync the
    two against their shared DuckDB oracle.

    ``group_col`` computes the same per-label means independently
    inside each group (PQ trains m sub-codebooks in ONE pass this way
    — optimization round 12). Decimal sums are order-free, so a
    group's means are bit-identical to running the ungrouped form on
    that group's rows alone.
    """
    grp = [group_col] if group_col else []
    exploded = corpus.select(
        *grp,
        F.col(label_col).alias("centroid_id"),
        F.posexplode(vec_col).alias("pos", "v"),
    )
    per_pos = exploded.groupBy(*grp, "centroid_id", "pos").agg(
        (
            split_cast_double(F.sum(F.col("v").cast("decimal(20,10)")), 10)
            / F.count(F.lit(1))
        ).alias("m"),
        F.count(F.lit(1)).alias("n"),
    )
    aggs = [F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")]
    if with_counts:
        aggs.append(F.first("n").alias("n_members"))
    out_cols = [
        *[F.col(g) for g in grp],
        F.col("centroid_id"),
        F.transform("pm", lambda s: s.getField("m").cast("float")).alias(
            "centroid"
        ),
    ]
    if with_counts:
        out_cols.append(F.col("n_members"))
    return per_pos.groupBy(*grp, "centroid_id").agg(*aggs).select(*out_cols)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` nearest centroids' buckets.

    corpus_assigned (id → centroid bucket) would be precomputed/bucketed
    at ingest in production; the per-query work is then proportional to
    the probed buckets only.
    """
    # Both the assignment and the probe broadcast the centroids, and a
    # centroid DataFrame DERIVED from the corpus (label_centroids) would
    # otherwise have its whole derivation — a corpus scan + two
    # aggregations — evaluated once per broadcast. The table is tiny
    # (one row per centroid), so materialize it eagerly instead.
    centroids = centroids.localCheckpoint(eager=True)
    assigned = ivf_assign(corpus, centroids, vec_col, id_col)
    c = F.broadcast(centroids)
    q_probe = (
        queries.crossJoin(c)
        .select(
            query_id_col,
            F.col(vec_col).alias("__qvec"),
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
        .select(
            query_id_col,
            "__qvec",
            norm2(F.col("__qvec")).alias("__qn2"),
            "centroid_id",
        )
    )
    scored = assigned.withColumn("__vn2", norm2(F.col(vec_col))).join(
        F.broadcast(q_probe), "centroid_id"
    ).select(
        query_id_col,
        id_col,
        F.round(
            cosine_sim_hoisted(
                dot(F.col(vec_col), F.col("__qvec")),
                F.col("__vn2"),
                F.col("__qn2"),
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query vector,
    the top-k most-similar corpus vectors carrying a DIFFERENT label —
    the negatives that sit closest to the decision boundary, which is
    exactly what a contrastive/retrieval trainer wants in the batch.

    Plan shape is :func:`brute_force_topk` with the label-inequality
    pushed BELOW the top-k window: broadcast the (small) query batch,
    scan the corpus once shuffle-free, filter same-label candidates
    before anything is ranked, then one per-query top-k window.
    At 100 TB the stage-A scan swaps for the IVF/PQ candidate
    generation (ivf_topk / pq_topk) with the same label predicate —
    the mining semantics live entirely in this filter + window, not in
    how candidates are produced. Ties break deterministically on the
    rounded cosine, then corpus id.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(label_col).alias("__qlabel"),
            F.col(vec_col).alias("__qvec"),
            norm2(F.col(vec_col)).alias("__qn2"),
        )
    )
    scored = (
        corpus.select(
            F.col(id_col),
            F.col(label_col),
            F.col(vec_col),
            norm2(F.col(vec_col)).alias("__cn2"),
        )
        .crossJoin(q)
        .where(F.col(label_col) != F.col("__qlabel"))
        .select(
            query_id_col,
            id_col,
            F.col(label_col).cast("bigint").alias("neg_label"),
            F.round(
                cosine_sim_hoisted(
                    dot(F.col(vec_col), F.col("__qvec")),
                    F.col("__cn2"),
                    F.col("__qn2"),
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            "neg_label",
            "cosine",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def knn_label_accuracy(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Leave-one-out kNN label-consistency evaluation — THE standard
    embedding-quality benchmark: for each probe vector, predict its
    label by majority vote over its k nearest corpus neighbors
    (cosine, self excluded) and report per-label accuracy. Complements
    :func:`~shaha_spark.operators.embeddings` silhouette (geometry)
    and :func:`topk_recall` (search fidelity): this one measures
    whether the embedding space actually separates the classes.

    Probes are a sample (evaluation never needs every vector), so the
    plan is the broadcast-probe shape: shuffle-free corpus scan, one
    per-probe top-k window, then two tiny aggregations over k·|probes|
    rows. Determinism: neighbor ties break on (rounded cosine, id);
    vote ties break on (count DESC, label ASC); accuracy is a single
    IEEE division of exact small integers — identical in any engine.
    """
    p = F.broadcast(
        probes.select(
            F.col(id_col).alias("__probe_id"),
            F.col(label_col).alias("__plabel"),
            F.col(vec_col).alias("__pvec"),
            norm2(F.col(vec_col)).alias("__pn2"),
        )
    )
    scored = (
        corpus.select(
            F.col(id_col),
            F.col(label_col),
            F.col(vec_col),
            norm2(F.col(vec_col)).alias("__cn2"),
        )
        .crossJoin(p)
        .where(F.col(id_col) != F.col("__probe_id"))
        .select(
            "__probe_id",
            "__plabel",
            F.col(id_col),
            F.col(label_col),
            F.round(
                cosine_sim_hoisted(
                    dot(F.col(vec_col), F.col("__pvec")),
                    F.col("__cn2"),
                    F.col("__pn2"),
                ),
                6,
            ).alias("__cos"),
        )
    )
    wk = Window.partitionBy("__probe_id").orderBy(
        F.col("__cos").desc(), F.col(id_col).asc()
    )
    topk = scored.withColumn("__r", F.row_number().over(wk)).where(
        F.col("__r") <= k
    )
    votes = topk.groupBy("__probe_id", "__plabel", label_col).agg(
        F.count(F.lit(1)).alias("__votes")
    )
    # asc_nulls_last: Spark default-orders NULL FIRST ascending while
    # DuckDB orders NULL LAST — a null label winning a vote tie would
    # silently diverge across engines
    wv = Window.partitionBy("__probe_id").orderBy(
        F.col("__votes").desc(), F.col(label_col).asc_nulls_last()
    )
    pred = (
        votes.withColumn("__r", F.row_number().over(wv))
        .where(F.col("__r") == 1)
        .select(
            "__probe_id",
            "__plabel",
            F.col(label_col).alias("__pred"),
        )
    )
    return pred.groupBy(F.col("__plabel").cast("bigint").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum(
            F.when(F.col("__pred") == F.col("__plabel"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_correct"),
    ).select(
        "label",
        "n_probes",
        "n_correct",
        (F.col("n_correct").cast("double") / F.col("n_probes")).alias(
            "accuracy"
        ),
    )


def topk_recall(
    exact: DataFrame,
    approx: DataFrame,
    k: int,
    query_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of an approximate top-k result against the exact one:
    per query, the fraction of true top-k neighbors the ANN retrieved —
    THE quality gate before trading exactness for speed (IVF nprobe /
    PQ codebook sizing).

    Both inputs are (query, id) result sets as produced by
    :func:`brute_force_topk` / :func:`ivf_topk`. Scale: one equi-join
    on (query, id) — both sides are k·queries rows, tiny next to the
    corpus scan that produced them — then a per-query count.
    """
    e = exact.select(query_col, id_col)
    # k·|queries| rows by construction (the ANN's top-k output) — the
    # unhinted equi-join planned sort-merge: two exchanges plus sorts
    # for a result-set-sized join (optimization round 12)
    a = F.broadcast(
        approx.select(query_col, id_col).withColumn("__hit", F.lit(1))
    )
    return (
        e.join(a, [query_col, id_col], "left")
        .groupBy(query_col)
        .agg(F.count("__hit").alias("n_hits"))
        .select(
            query_col,
            F.col("n_hits").cast("bigint").alias("n_hits"),
            (F.col("n_hits") / F.lit(float(k))).alias("recall"),
        )
    )


def prefix_topk(
    corpus: DataFrame,
    queries: DataFrame,
    prefix_dims: int = 8,
    m: int = 20,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Matryoshka-style two-stage search: candidate generation on the
    FIRST ``prefix_dims`` dimensions, exact full-dimension re-rank.

    Matryoshka-trained embeddings front-load information, so cosine
    over a short prefix is a cheap, surprisingly faithful pre-filter:
    stage A scans d'=prefix_dims floats per vector instead of d (an
    8/64 prefix cuts stage-A flops and scan bytes 8×), keeps the top
    ``m`` per query (prefix cosine DESC, id ASC, rounded to 6), and
    stage B re-ranks only m·|queries| candidates at full precision.

    Plan shape mirrors :func:`sq_topk`: broadcast queries, shuffle-free
    corpus scan carrying only (query_id, id, score) into the top-m
    window, candidates broadcast back against the corpus for re-rank.
    At 100 TB the prefix slice would be stored column-separate
    (write-time truncation) so stage A's scan prunes to d' floats at
    the parquet layer; here the slice is in-plan for oracle replay.
    """
    # the query batch feeds both stages (prefix scoring + full re-rank);
    # the lazy persist stops Spark re-deriving it per broadcast build
    queries = queries.persist()
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
            norm2(F.col(vec_col)).alias("__qn2"),
            F.slice(F.col(vec_col), 1, prefix_dims).alias("__qpre"),
        )
    )
    scored = corpus.select(
        F.col(id_col), F.slice(F.col(vec_col), 1, prefix_dims).alias("__pre")
    ).withColumn("__pn2", norm2(F.col("__pre"))).crossJoin(
        q.select(
            query_id_col, "__qpre", norm2(F.col("__qpre")).alias("__qpn2")
        )
    ).select(
        query_id_col,
        id_col,
        F.round(
            cosine_sim_hoisted(
                dot(F.col("__pre"), F.col("__qpre")),
                F.col("__pn2"),
                F.col("__qpn2"),
            ),
            6,
        ).alias("prefix_cosine"),
    )
    wa = Window.partitionBy(query_id_col).orderBy(
        F.col("prefix_cosine").desc(), F.col(id_col).asc()
    )
    cands = (
        scored.withColumn("__r", F.row_number().over(wa))
        .where(F.col("__r") <= m)
        .select(query_id_col, id_col, "prefix_cosine")
    )
    rescored = F.broadcast(cands).join(
        corpus.select(
            F.col(id_col),
            F.col(vec_col),
            norm2(F.col(vec_col)).alias("__cn2"),
        ),
        on=id_col,
    ).join(q.select(query_id_col, "__qvec", "__qn2"), on=query_id_col).select(
        query_id_col,
        id_col,
        "prefix_cosine",
        F.round(
            cosine_sim_hoisted(
                dot(F.col(vec_col), F.col("__qvec")),
                F.col("__cn2"),
                F.col("__qn2"),
            ),
            6,
        ).alias("cosine"),
    )
    wb = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    from shaha_spark.caching import registers

    return registers(
        rescored.withColumn("rank", F.row_number().over(wb))
        .where(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            "prefix_cosine",
            "cosine",
            F.col("rank").cast("bigint").alias("rank"),
        ),
        queries,
    )


def ndcg_ideal(k: int) -> float:
    """Ideal harmonic-discounted DCG for :func:`ndcg_at_k` — the exact
    per-term-rounded sum both the Spark plan and any oracle must embed
    as the SAME literal (HALF_UP quantization mirrors SQL round)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        sum(
            Decimal((k + 1 - i) / (i + 1.0)).quantize(
                Decimal("1e-9"), ROUND_HALF_UP
            )
            for i in range(1, k + 1)
        )
    )


def ndcg_at_k(
    exact: DataFrame,
    approx: DataFrame,
    k: int,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Rank-quality of an approximate top-k against the exact one:
    normalized discounted cumulative gain with graded relevance
    rel(item) = k+1-exact_rank (0 if outside the exact top-k).

    Discount is HARMONIC (1/(rank+1)) rather than the classic
    log2(rank+1): same monotone-decay semantics, but every term is a
    small-integer division — correctly-rounded identically in every
    IEEE engine — so per-term 9-decimal rounding + decimal-exact sums
    make the score bit-deterministic across engines and partitionings
    (the repo's standard determinism recipe; log2 would pull in
    platform libm ulp differences). Complements :func:`topk_recall`:
    recall ignores ORDER within the top-k, nDCG scores it.

    Scale: both inputs are k·|queries| rows; one equi-join + one
    per-query aggregation — negligible next to the search that
    produced them.

    Every query present in EITHER input gets a row: a query for which
    the approximate search returned nothing (e.g. all probed IVF
    buckets empty) scores ndcg = 0.0 instead of silently vanishing —
    consistent with :func:`topk_recall`, which reports such queries as
    recall 0.
    """
    # both inputs are consumed twice (the relevance join + the
    # all-queries spine union); without a boundary Spark re-runs the
    # SEARCHES that produced them once per consumer. k·|queries|-sized —
    # materializing lazily is free next to the searches it deduplicates.
    exact = exact.persist()
    approx = approx.persist()
    e = exact.select(
        F.col(query_col), F.col(id_col), F.col(rank_col).alias("__erank")
    )
    a = approx.select(
        F.col(query_col), F.col(id_col), F.col(rank_col).alias("__arank")
    )
    # e is k·|queries| rows by construction (the exact top-k result
    # set); unhinted, both query-sized joins here planned sort-merge
    # (optimization round 12 — same bound as topk_recall's hint)
    joined = a.join(F.broadcast(e), [query_col, id_col], "left")
    rel = F.when(
        F.col("__erank").isNotNull(),
        F.lit(k + 1).cast("double") - F.col("__erank").cast("double"),
    ).otherwise(F.lit(0.0))
    term = F.round(
        rel / (F.col("__arank").cast("double") + F.lit(1.0)), 9
    ).cast("decimal(19,9)")
    ideal = ndcg_ideal(k)
    per_q = joined.groupBy(query_col).agg(F.sum(term).alias("__dcg"))
    all_queries = (
        e.select(query_col).unionAll(a.select(query_col)).distinct()
    )
    from shaha_spark.caching import registers

    return registers(
        all_queries.join(F.broadcast(per_q), query_col, "left").select(
            F.col(query_col),
            F.coalesce(
                F.round(F.col("__dcg").cast("double") / F.lit(ideal), 6),
                F.lit(0.0),
            ).alias("ndcg"),
        ),
        exact,
        approx,
    )


def rank_fusion(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str,
    rank_col: str = "rank",
    k: int = 60,
    top: int = 20,
) -> DataFrame:
    """Reciprocal Rank Fusion of two ranked result lists — the
    standard hybrid-retrieval combiner (lexical BM25 ⊕ dense cosine):
    score(d) = Σ_lists 1/(k + rank_d), items missing from a list
    contribute nothing.

    Determinism: each term is one correctly-rounded division of exact
    integers, rounded to 9 decimals and summed as exact decimals; the
    final ordering tiebreaks on id. Both inputs are top-N-sized —
    the fusion is a full-outer join + one TakeOrderedAndProject,
    negligible next to the searches that produced them.
    """
    term = lambda c: F.round(
        F.lit(1.0) / (F.lit(float(k)) + c.cast("double")), 9
    ).cast("decimal(19,9)")
    a = ranked_a.select(
        F.col(id_col), term(F.col(rank_col)).alias("__ta")
    )
    b = ranked_b.select(
        F.col(id_col), term(F.col(rank_col)).alias("__tb")
    )
    zero = F.lit(0).cast("decimal(19,9)")
    fused = (
        a.join(b, id_col, "full_outer")
        .select(
            id_col,
            (
                F.coalesce(F.col("__ta"), zero)
                + F.coalesce(F.col("__tb"), zero)
            ).alias("__s"),
        )
    )
    return (
        fused.select(
            id_col, F.col("__s").cast("double").alias("rrf_score")
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(top)
    )
