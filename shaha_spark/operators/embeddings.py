"""Embedding-matrix operators: int8 quantization, sign-bit bucket
dedup, and a top-principal-component power iteration.

These extend the similarity/dedup family (operators/similarity.py,
operators/dedup.py) with the storage- and preprocessing-side pieces a
training-data pipeline needs before ANN indexing: shrink vectors 4×
(quantize), drop near-identical vectors cheaply (bucket dedup), and
characterize the corpus's dominant direction (top PC — the building
block for PCA whitening and spectral diagnostics).

Scale notes (100 TB):
  * every per-dimension statistic is ONE aggregation with map-side
    partials over ``d`` JVM expressions — no explode shuffle of
    n×d rows, no Python;
  * the corpus is never collected; only d-sized statistics (64 numbers)
    reach the driver, mirroring the kmeans centroid loop
    (operators/kmeans.py);
  * the power iteration is integer-exact (the pagerank trick,
    operators/graph.py): vectors are centered and quantized onto a
    2^20 grid, so every sum is exact integer/decimal arithmetic and
    the result is bit-identical across engines, partitionings, and
    retries. Two matvec rounds keep the decimal(38) accumulators in
    range up to ~10^6 rows per run; production would renormalize
    between rounds.

No reference counterpart (the reference is a hash CLI); part of the
LLM-pipeline extension surface alongside operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shaha_spark.operators.profile import split_cast_double

#: Fixed-point grid for the integer-exact power iteration: 2^20.
#: Multiplying a double by a power of two is EXACT, so quantization is
#: deterministic; 20 fractional bits keep centered float32 embeddings
#: well inside bigint during the first matvec.
GRID = 1 << 20


def _dim(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from one row (schema-level lookup; the
    arrays are fixed-width by construction). NULL vectors are ignored
    for the probe — and rejected with a clear message if the column
    holds nothing else."""
    row = (
        df.where(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("d"))
        .head()
    )
    if row is None:
        raise ValueError(
            f"no non-null vectors in column {vec_col!r} "
            "(empty table or all-NULL embeddings)"
        )
    return int(row.d)


def dim_stats(df: DataFrame, vec_col: str = "embedding") -> list[tuple[float, float]]:
    """[(min, max)] per dimension in ONE aggregation pass (2d columns,
    map-side combine; nothing but 2d floats reaches the driver)."""
    d = _dim(df, vec_col)
    aggs = []
    for p in range(d):
        comp = F.element_at(F.col(vec_col), p + 1)
        aggs.append(F.min(comp).alias(f"mn{p}"))
        aggs.append(F.max(comp).alias(f"mx{p}"))
    row = df.agg(*aggs).head()
    return [(float(row[f"mn{p}"]), float(row[f"mx{p}"])) for p in range(d)]


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-dimension affine uint8 quantization: code_p = min(255,
    floor((x_p - min_p) / (max_p - min_p) * 256)); degenerate
    dimensions (min == max) code to 0.

    Every step is exact or correctly-rounded IEEE arithmetic
    (float32 inputs are exact doubles; ×256 is exact), so codes are
    bit-identical across engines — no round-half ambiguity.
    Returns (id, pos, code) exploded for oracle comparison; the packed
    array form is a trivial ``collect_list`` away.
    """
    # delegate to sq_code_arrays so the affine-uint8 expression exists
    # ONCE in this file (its extra floor clamp at 0 is a no-op here:
    # corpus vectors satisfy x >= min by construction of dim_stats)
    stats = dim_stats(df, vec_col)
    coded = sq_code_arrays(df, stats, vec_col, id_col)
    return coded.select(
        F.col(id_col),
        F.posexplode("__codes").alias("pos", "code"),
    ).select(
        F.col(id_col),
        F.col("pos").cast("bigint").alias("pos"),
        F.col("code").cast("int").alias("code"),
    )


def bucket_signature(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """1-bit-per-dimension signature: '1' where x_p >= midpoint_p.

    The coarsest useful quantization — a d-character bucket key that
    groups vectors agreeing on every dimension's half. Comparisons of
    exact doubles, so deterministic.
    """
    stats = dim_stats(df, vec_col)
    mids = F.array(*[F.lit((mn + mx) / 2.0).cast("double") for mn, mx in stats])
    bits = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        mids,
        lambda x, mid: F.when(x >= mid, F.lit("1")).otherwise(F.lit("0")),
    )
    return df.select(
        F.col(id_col), F.array_join(bits, "").alias("bucket")
    )


def dedup_by_bucket(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Keep the lowest id per sign-bucket — O(n) near-dup screening.

    One hash shuffle on the bucket key. Buckets are 2^d-sparse, so
    collisions mean 'same orthant relative to the per-dim midpoints',
    a strictly coarser (cheaper, recall-1.0-for-exact-dups) screen
    than MinHash/SimHash over text (operators/dedup.py).
    """
    sig = bucket_signature(df, vec_col, id_col)
    return (
        sig.groupBy("bucket")
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


def _mean_grid(df: DataFrame, vec_col: str) -> list[float]:
    """Per-dimension decimal-exact mean, rounded to float32 (the same
    cross-engine determinism recipe as the kmeans centroid means).

    The d split-cast aggregates are rendered as SQL text — one parser
    call each instead of ~30 py4j Column round trips (optimization
    round 12, guide §7.3: Column-by-Column construction of the 64-wide
    aggregate cost 6.8 s of pure driver chatter at d=64). The sums and
    counts aggregate under plain aliases and the split-cast/divide
    apply in a projection on top — the same Aggregate+Project split
    Catalyst performs on agg result expressions; arithmetic and values
    are identical (pinned by tests/test_optimization_r12.py).
    """
    from shaha_spark.operators.profile import split_cast_double_spark_sql

    d = _dim(df, vec_col)
    # divide by the NON-NULL element count, not the row count: _dim
    # explicitly supports NULL embeddings (they carry no mass in the
    # sums), so dividing by all rows would deflate the mean and leave
    # centered_grid un-centered. Matches the oracle twin, where
    # unnest() emits no rows for a NULL vector.
    sums = [
        F.expr(
            f"sum(cast(cast(element_at({vec_col}, {p + 1}) as double)"
            f" as decimal(25,10)))"
        ).alias(f"__s{p}")
        for p in range(d)
    ]
    counts = [
        F.expr(f"count(element_at({vec_col}, {p + 1}))").alias(f"__c{p}")
        for p in range(d)
    ]
    outs = [
        F.expr(
            f"cast(({split_cast_double_spark_sql(f'__s{p}', 10)}"
            f" / __c{p}) as float)"
        ).alias(f"m{p}")
        for p in range(d)
    ]
    row = df.agg(*sums, *counts).select(*outs).head()
    return [float(row[f"m{p}"]) for p in range(d)]


def centered_grid(df: DataFrame, vec_col: str = "embedding") -> tuple[DataFrame, list[float]]:
    """Center each vector on the per-dim mean and quantize onto the
    2^20 integer grid: xq_p = floor((x_p - m_p) * 2^20) as bigint.

    x_p and m_p are float32 values — exact as doubles — so the
    subtraction is correctly rounded, the power-of-two scaling exact,
    and the floor deterministic: the grid matrix is bit-identical on
    any engine. Everything downstream is integer arithmetic.
    """
    means = _mean_grid(df, vec_col)
    marr = F.array(*[F.lit(m).cast("double") for m in means])
    xq = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        marr,
        lambda x, m: F.floor((x - m) * F.lit(float(GRID))).cast("bigint"),
    )
    return df.withColumn("__xq", xq), means


def _matvec(df: DataFrame, v: list[int]) -> list[int]:
    """One exact power-iteration step u = Aᵀ(A v) on the grid matrix.

    All sums run in decimal(38,0): after the first round the v
    components reach ~n·2^48, so the second round's per-row dot
    (2^87-ish at sf0.1) is far past bigint. Bounds: with |xq| ≤ 2^21
    and two rounds, |u| ≤ n²·d²·2^63 — inside decimal(38) (~2^126)
    up to ~10^5 rows; more rows or rounds need an interleaved
    renormalization (documented, not needed at test scale).
    Only d decimals return to the driver.

    Two optimization-round-12 changes, values identical (guide §7.3):
    the d per-position aggregates are ONE SQL string each instead of
    per-Column py4j chains, and v arrives via a broadcast one-row
    frame rather than inlined literals — v's components change every
    iteration, so literal plans generated different codegen source
    per call and janino recompiled the whole wide aggregate each time
    (measured: iteration 2 cost 14 s at d=64/500 rows, nearly all
    compile; with the stable source it reuses the cached class).
    """
    from decimal import Decimal as _D

    d = len(v)
    spark = df.sparkSession
    # decimal-typed payload: v components can exceed long range
    # mid-iteration; arrives already as the decimal(38,0) the fold uses
    vrow = spark.createDataFrame(
        [([_D(int(c)) for c in v],)], "__v array<decimal(38,0)>"
    )
    dot = F.aggregate(
        F.zip_with(F.col("__xq"), F.col("__v"), lambda x, y: x.cast("decimal(38,0)") * y),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, t: acc + t,
    )
    with_dot = df.join(F.broadcast(vrow)).select("__xq", dot.alias("__dot"))
    aggs = [
        F.expr(
            f"sum(cast(element_at(__xq, {p + 1}) as decimal(38,0)) * __dot)"
        ).alias(f"u{p}")
        for p in range(d)
    ]
    row = with_dot.agg(*aggs).head()
    return [int(row[f"u{p}"]) for p in range(d)]


def top_principal_component(
    df: DataFrame, vec_col: str = "embedding", iters: int = 2
) -> DataFrame:
    """Dominant eigenvector of the centered Gram matrix XᵀX by ``iters``
    exact power-iteration rounds from the all-ones start.

    Integer-exact end to end; the single inexact step is the FINAL
    normalization u / max|u| (one correctly-rounded IEEE division per
    component, rounded to 9 decimals). Returns (pos, comp) rows with
    comp in [-1, 1] and the max-magnitude component exactly ±1.
    """
    grid, _means = centered_grid(df, vec_col)
    grid = grid.select("__xq").localCheckpoint(eager=True)
    v = [1] * len(_means)  # dimensionality already known — no extra job
    for _ in range(iters):
        v = _matvec(grid, v)
    scale = float(max(abs(c) for c in v))
    if scale == 0.0:
        # zero iterate: every centered value quantized to 0 (identical
        # vectors / single row), or the all-ones start lies in the
        # grid's null space — there is no dominant direction to report
        raise ValueError(
            "top_principal_component: power iterate is the zero vector "
            "(no variance in the corpus, or the start vector is in the "
            "null space); the principal direction is undefined"
        )
    rows = [(p, round(c / scale, 9)) for p, c in enumerate(v)]
    spark = df.sparkSession
    return spark.createDataFrame(rows, "pos bigint, comp double")


def sq_code_arrays(
    df: DataFrame,
    stats: list[tuple[float, float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "__codes",
) -> DataFrame:
    """Packed uint8 code array per vector under the given per-dimension
    (min, max) ``stats`` — the array form of :func:`quantize_int8`, with
    an added floor clamp at 0 so out-of-range QUERY vectors (not drawn
    from the corpus the stats describe) still code validly.

    Same exactness argument as quantize_int8: float32 → double is
    exact, ×256 is exact, floor of a correctly-rounded division is
    deterministic — codes are bit-identical across engines.
    """
    mins = F.array(*[F.lit(mn).cast("double") for mn, _ in stats])
    spans = F.array(*[F.lit(mx - mn).cast("double") for mn, mx in stats])
    codes = F.zip_with(
        F.zip_with(
            F.col(vec_col).cast("array<double>"), mins, lambda x, mn: x - mn
        ),
        spans,
        lambda delta, span: F.when(span == 0.0, F.lit(0)).otherwise(
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0), F.floor(delta / span * F.lit(256.0)).cast("int")
                ),
            )
        ),
    )
    return df.select(F.col(id_col), F.col(vec_col), codes.alias(out_col))


def sq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    m: int = 20,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage scalar-quantized ANN: uint8 asymmetric-distance
    candidate generation, exact-cosine re-rank.

    Stage A scores every corpus vector against every (broadcast) query
    with the INTEGER dot product of their uint8 codes — 255²·d bounds
    the sum far inside int64, so candidate ranking is exact integer
    arithmetic with no float ambiguity — and keeps the top ``m`` per
    query (adc DESC, id ASC). Stage B joins the m·|queries| candidate
    ids back to the full-precision corpus (candidates broadcast — the
    big side never shuffles) and re-ranks by exact cosine, rounded to
    6 decimals with id tiebreak, keeping ``k``.

    100 TB shape: the corpus scan is shuffle-free in both stages; the
    only shuffles are the two per-query top-N windows, whose input is
    |corpus|×|queries| scored rows in stage A (same cost class as
    brute_force_topk but on 1-byte codes — this is the operator you
    run when the raw vectors no longer fit the scan budget) and
    m·|queries| rows in stage B. Production would persist the code
    arrays write-time; here they are derived in-plan so the oracle can
    replay the whole pipeline.
    """
    from .similarity import cosine_sim

    stats = dim_stats(corpus, vec_col)
    from pyspark.sql import Window

    ccodes = sq_code_arrays(corpus, stats, vec_col, id_col)
    # lazy persist: the batch-sized query codes feed BOTH the
    # stage-A broadcast and the stage-B re-rank join — without the
    # boundary each consumer re-derives the query-side scan
    qcodes = sq_code_arrays(
        queries, stats, vec_col, query_id_col, out_col="__qcodes"
    ).select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.col("__qcodes"),
    ).persist()
    # centered codes: raw uint8 dots are dominated by the +128 offset
    # term (every code is positive), which ranks by vector SUM, not
    # similarity. (c-128)·(q-128) strips the offset so the integer dot
    # is proportional to the dequantized inner product up to per-dim
    # span scaling — the standard SQ ADC — while staying exact int64.
    adc = F.aggregate(
        F.zip_with(
            F.col("__codes"),
            F.col("__qcodes"),
            lambda a, b: ((a - F.lit(128)) * (b - F.lit(128))).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    # only (query_id, id, adc) enters the top-m shuffle — the raw
    # vectors rejoin AFTER candidate selection, so the heavy window
    # moves 1 long per scored pair, not d floats
    scored = ccodes.crossJoin(F.broadcast(qcodes)).select(
        query_id_col, id_col, adc.alias("adc")
    )
    wa = Window.partitionBy(query_id_col).orderBy(
        F.col("adc").desc(), F.col(id_col).asc()
    )
    cands = (
        scored.withColumn("__r", F.row_number().over(wa))
        .where(F.col("__r") <= m)
        .select(query_id_col, id_col, "adc")
    )
    from shaha_spark.operators.similarity import cosine_sim_hoisted, dot, norm2

    rescored = F.broadcast(cands).join(
        corpus.select(
            F.col(id_col),
            F.col(vec_col),
            norm2(F.col(vec_col)).alias("__cn2"),
        ),
        on=id_col,
    ).join(
        F.broadcast(
            qcodes.select(
                query_id_col, "__qvec", norm2(F.col("__qvec")).alias("__qn2")
            )
        ),
        on=query_id_col,
    ).select(
        query_id_col,
        id_col,
        "adc",
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
            F.col("adc").cast("bigint").alias("adc"),
            "cosine",
            F.col("rank").cast("bigint").alias("rank"),
        ),
        qcodes,
    )
