"""Dataset profiling: per-column statistics for pipeline QA.

Count / nulls / min / max / mean / sample-stddev for numeric columns,
computed so the results are bit-reproducible against an external
oracle: sums and sums-of-squares accumulate in DECIMAL (exact,
order-independent), and the final mean/stddev are a fixed sequence of
double operations on those exact values. Built-in ``stddev`` would NOT
reproduce across engines (per-partition float accumulation differs).
"""

from __future__ import annotations

import re
from decimal import Decimal as _Dec

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

_SPLIT_TEN = 10_000_000_000  # 10^10
#: Exclusive bound on the unscaled |value|·10^scale for which the hi/lo
#: split is exactly representable: hi < 2^53 requires u < 2^53·10^10.
_SPLIT_LIMIT = (1 << 53) * _SPLIT_TEN


def _dec_scale(precision: str) -> int:
    """Scale of a 'decimal(p,s)' type string."""
    m = re.search(r"\(\s*\d+\s*,\s*(\d+)\s*\)", precision)
    if m is None:
        raise ValueError(
            f"precision must be a 'decimal(p,s)' type string, "
            f"got {precision!r}"
        )
    return int(m.group(1))


def split_cast_double(col, scale: int):
    """Cross-engine deterministic DECIMAL -> DOUBLE cast.

    DuckDB 1.x casts DECIMAL->DOUBLE in TWO roundings — int128 unscaled
    value to double first, then / 10^scale — while the JVM's
    BigDecimal.doubleValue() rounds once, correctly. The moment the
    unscaled value crosses 2^53 the two engines can diverge in the last
    ULP: a sum of squares over 600k price-sized rows (sf0.1 lineitem,
    SUM = 2224071148386123.1690) already does — DuckDB yields
    ...123.0 where the nearest double is ...123.2. Found by the r5
    sf0.1 oracle sweep; invisible at the sf0.01 driver gate.

    Recipe: split the EXACT unscaled integer u = |value|·10^scale into
    hi = u div 10^10 and lo = u mod 10^10. Both parts stay below 2^53
    for u < 2^53·10^10 (≈9.007e25 unscaled), so both engines cast them
    to double EXACTLY (zero rounding), and the recombination
    ``(hi·1e10 + lo) / 10^scale`` is a fixed 3-op IEEE sequence (mul,
    add, div on exactly-representable constants) replayed bit-for-bit
    by :func:`split_cast_double_sql`. The split runs on the absolute
    value — Spark's pmod and DuckDB's % disagree on negative operands —
    and the sign is restored by IEEE negation, which is exact.

    Domain guard: past u ≥ 2^53·10^10 the hi part itself exceeds 2^53
    and the bit-equality guarantee would silently degrade to
    last-ULP-maybe — so BOTH this function and the SQL twin return
    NULL there (symmetrically, via the same comparison on the same
    exact integer). An out-of-domain magnitude therefore surfaces as a
    visible NULL in the output instead of passing (or failing) the
    oracle by accident. Past decimal(38) capacity Spark's non-ANSI
    cast already yields NULL; DuckDB's HUGEINT path errors loudly —
    both are detectable, neither silently blesses a wrong value.
    """
    a = F.abs(col)
    u = (a * F.lit(10**scale)).cast("decimal(38,0)")
    lo = F.pmod(u, F.lit(_SPLIT_TEN).cast("decimal(11,0)"))
    # (u - lo) is an exact multiple of 10^10, so the decimal division
    # is exact regardless of the result scale Spark assigns it
    hi = ((u - lo) / F.lit(_SPLIT_TEN)).cast("decimal(28,0)")
    mag = (hi.cast("double") * F.lit(1.0e10) + lo.cast("double")) / F.lit(
        float(10**scale)
    )
    # 2^53·10^10 exceeds a JVM long, so the literal goes in as Decimal
    in_domain = u < F.lit(_Dec(_SPLIT_LIMIT)).cast("decimal(38,0)")
    return F.when(in_domain & (col < 0), -mag).when(in_domain, mag)


def split_cast_double_spark_sql(expr: str, scale: int) -> str:
    """Spark-SQL text form of :func:`split_cast_double` over a NAMED
    input (a column or sub-expression already present on the frame) —
    the same expression tree delivered to Catalyst in ONE parser call
    instead of ~25 py4j Column round trips (optimization round 12,
    guide §7.3: plan-construction chatter was ~40 ms per split-cast,
    6 of them in tpch_q1 alone). Literal forms are chosen so the parsed
    tree matches the Column builder's exactly: the ``D`` suffix forces
    DOUBLE (a bare ``1e10`` parses double too, but ``100.0`` would
    parse DECIMAL), ``BD`` forces the big-decimal literal the domain
    guard compares against. Tree identity is pinned by
    tests/test_optimization_r12.py over in-domain, boundary,
    out-of-domain, negative and null magnitudes."""
    ten = 10 ** scale
    u = f"cast((abs({expr}) * {ten}) as decimal(38,0))"
    lo = f"pmod({u}, cast({_SPLIT_TEN} as decimal(11,0)))"
    hi = f"cast((({u} - {lo}) / {_SPLIT_TEN}) as decimal(28,0))"
    mag = (
        f"((cast({hi} as double) * 1.0E10D + cast({lo} as double)) / "
        f"{float(ten)!r}D)"
    )
    dom = f"({u} < cast({_SPLIT_LIMIT}BD as decimal(38,0)))"
    return (
        f"(CASE WHEN {dom} AND ({expr} < 0) THEN -{mag} "
        f"WHEN {dom} THEN {mag} END)"
    )


def split_cast_double_sql(expr: str, scale: int) -> str:
    """DuckDB twin of :func:`split_cast_double` — the same hi/lo split,
    the same 3-op IEEE recombination, and the same NULL-out-of-domain
    guard on the same exact unscaled integer, so both engines produce
    the identical bit pattern (or both NULL) at any magnitude."""
    u = f"CAST(ABS({expr}) * {10**scale} AS HUGEINT)"
    mag = (
        f"((CAST(({u}) // {_SPLIT_TEN} AS DOUBLE) * 1e10 + "
        f"CAST(({u}) % {_SPLIT_TEN} AS DOUBLE)) / {float(10**scale)!r})"
    )
    return (
        f"(CASE WHEN ({u}) >= {_SPLIT_LIMIT} THEN NULL "
        f"WHEN ({expr}) < 0 THEN -{mag} ELSE {mag} END)"
    )


def numeric_profile(
    df: DataFrame, column: str, precision: str = "decimal(18,2)"
) -> DataFrame:
    """One-row profile of a numeric column.

    stddev = sqrt((sumsq - sum²/n) / (n-1)) with sumsq/sum exact
    decimals cast to double — deterministic because every floating
    operation is a single IEEE op on identical inputs.
    """
    dec = F.col(column).cast(precision)
    sc = _dec_scale(precision)
    n = F.count(F.col(column))
    s = split_cast_double(F.sum(dec), sc)
    sq = split_cast_double(F.sum(dec * dec), 2 * sc)
    mean = s / n
    # clamp at 0: for a constant column double cancellation can leave
    # sumsq - sum²/n a hair NEGATIVE (e.g. 3 rows of 0.1 → -2e-18) and
    # sqrt would return NaN, which then compares TRUE against any
    # threshold downstream. greatest() is one more deterministic IEEE
    # op replayed identically by the oracle twin.
    var = F.when(
        n > 1, F.greatest((sq - s * s / n) / (n - F.lit(1)), F.lit(0.0))
    ).otherwise(F.lit(0.0))
    return df.agg(
        n.alias("n"),
        F.count(F.when(F.col(column).isNull(), 1)).alias("n_null"),
        F.min(F.col(column)).cast("double").alias("min_value"),
        F.max(F.col(column)).cast("double").alias("max_value"),
        mean.alias("mean_value"),
        F.sqrt(var).alias("stddev_value"),
    )


def table_profile(
    df: DataFrame, columns: list[str], precision: str = "decimal(18,2)"
) -> DataFrame:
    """One profile row per column, computed in a SINGLE aggregation pass.

    All columns' count/null/min/max/sum/sumsq aggregates run in one
    ``agg`` over one scan (a per-column loop would rescan the table per
    column — the difference between one pass and C passes at 100 TB);
    the per-column rows then unpivot from the single aggregate row via
    an array-of-structs explode. Same deterministic decimal arithmetic
    as :func:`numeric_profile`.
    """
    # The two split-cast aggregates per column are rendered as SQL text
    # (optimization round 12, guide §7.3): the Column-built form cost
    # ~50 py4j round trips per column of pure plan construction. Sums
    # aggregate under plain aliases; the split-casts apply in a
    # projection on top — the same Aggregate+Project split Catalyst
    # performs on agg result expressions, so plan and values are
    # identical (tree identity pinned by test_optimization_r12).
    aggs = []
    sc = _dec_scale(precision)
    for c in columns:
        dec_txt = f"cast(`{c}` as {precision})"
        aggs += [
            F.count(F.col(c)).alias(f"__n_{c}"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nn_{c}"),
            F.min(F.col(c)).cast("double").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("double").alias(f"__mx_{c}"),
            F.expr(f"sum({dec_txt})").alias(f"__rs_{c}"),
            F.expr(f"sum({dec_txt} * {dec_txt})").alias(f"__rsq_{c}"),
        ]
    one = df.agg(*aggs).select(
        "*",
        *[
            F.expr(split_cast_double_spark_sql(f"`__rs_{c}`", sc)).alias(
                f"__s_{c}"
            )
            for c in columns
        ],
        *[
            F.expr(
                split_cast_double_spark_sql(f"`__rsq_{c}`", 2 * sc)
            ).alias(f"__sq_{c}")
            for c in columns
        ],
    )
    structs = []
    for c in columns:
        n = F.col(f"__n_{c}")
        s = F.col(f"__s_{c}")
        sq = F.col(f"__sq_{c}")
        mean = s / n
        # same negative-cancellation clamp as numeric_profile
        var = F.when(
            n > 1, F.greatest((sq - s * s / n) / (n - F.lit(1)), F.lit(0.0))
        ).otherwise(F.lit(0.0))
        structs.append(
            F.struct(
                F.lit(c).alias("column_name"),
                n.alias("n"),
                F.col(f"__nn_{c}").alias("n_null"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
                mean.alias("mean_value"),
                F.sqrt(var).alias("stddev_value"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def table_profile_sql(
    table: str, columns: list[str], precision: str = "DECIMAL(18,2)"
) -> str:
    """DuckDB oracle twin of :func:`table_profile`: the same per-column
    formulas, one SELECT per column, UNION ALL."""
    sc = _dec_scale(precision)
    selects = []
    for c in columns:
        s = split_cast_double_sql(f"SUM(CAST({c} AS {precision}))", sc)
        sq = split_cast_double_sql(
            f"SUM(CAST({c} AS {precision}) * CAST({c} AS {precision}))", 2 * sc
        )
        selects.append(f"""SELECT
  '{c}' AS column_name,
  count({c}) AS n,
  count(CASE WHEN {c} IS NULL THEN 1 END) AS n_null,
  CAST(min({c}) AS DOUBLE) AS min_value,
  CAST(max({c}) AS DOUBLE) AS max_value,
  {s} / count({c}) AS mean_value,
  sqrt(CASE WHEN count({c}) > 1 THEN
    greatest(({sq}
     - {s} * {s} / count({c}))
    / (count({c}) - 1), 0.0) ELSE 0.0 END) AS stddev_value
FROM {table}""")
    return "\nUNION ALL\n".join(selects)


def profile_sql(table: str, column: str, precision: str = "DECIMAL(18,2)") -> str:
    """DuckDB oracle twin of :func:`numeric_profile` (same formula, same
    op order — do NOT substitute the engine's stddev())."""
    sc = _dec_scale(precision)
    s = split_cast_double_sql(f"SUM(CAST({column} AS {precision}))", sc)
    sq = split_cast_double_sql(
        f"SUM(CAST({column} AS {precision}) * CAST({column} AS {precision}))",
        2 * sc,
    )
    return f"""SELECT
  count({column}) AS n,
  count(CASE WHEN {column} IS NULL THEN 1 END) AS n_null,
  CAST(min({column}) AS DOUBLE) AS min_value,
  CAST(max({column}) AS DOUBLE) AS max_value,
  {s} / count({column}) AS mean_value,
  sqrt(CASE WHEN count({column}) > 1 THEN
    greatest(({sq}
     - {s} * {s} / count({column}))
    / (count({column}) - 1), 0.0) ELSE 0.0 END) AS stddev_value
FROM {table}"""


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
) -> DataFrame:
    """Exact per-group quantiles with linear interpolation
    (quantile_cont semantics), one output column ``p<q*100>`` per q.

    The interpolation is spelled out — ``v_lo + (v_hi - v_lo) * frac``
    on values selected by 0-based rank — rather than delegated to the
    engine's quantile(), so any engine replaying the same IEEE op
    sequence reproduces the result bit-for-bit. Tie order within equal
    values is irrelevant: the ranks select by position and tied
    positions carry equal values.

    One shuffle on the group key; the per-group sort is inherent to
    exact quantiles (use a sketch for approximate-at-scale).

    NULL values are excluded before ranking (quantiles are statistics
    of the observed values). Ranking them would both shift every
    quantile AND diverge across engines: Spark windows order NULLS
    FIRST, DuckDB NULLS LAST, so the same rank would select different
    values.
    """
    from pyspark.sql import Window

    df = df.where(F.col(value_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(value_col)
    v = F.col(value_col).cast("double")
    ranked = df.select(
        F.col(group_col),
        v.alias("_v"),
        (F.row_number().over(w) - 1).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("_n"),
    )
    aggs = []
    for q in qs:
        target = (F.col("_n") - 1).cast("double") * F.lit(float(q))
        lo = F.floor(target)
        frac = target - lo
        v_lo = F.max(F.when(F.col("_rn") == lo, F.col("_v")))
        v_hi = F.max(F.when(F.col("_rn") == F.ceil(target), F.col("_v")))
        aggs.append(
            (v_lo + (v_hi - v_lo) * F.max(frac)).alias(f"p{round(q * 100)}")
        )
    return ranked.groupBy(group_col).agg(*aggs)


def group_quantiles_sql(
    table: str, group_col: str, value_col: str, qs: list[float]
) -> str:
    """DuckDB oracle twin of :func:`group_quantiles` — the same ranked
    selection and interpolation op order (NOT the engine's
    quantile_cont, whose internal arithmetic is unspecified)."""
    cols = []
    for q in qs:
        t = f"(CAST(n - 1 AS DOUBLE) * {float(q)!r})"
        v_lo = f"max(CASE WHEN rn = CAST(floor({t}) AS BIGINT) THEN v END)"
        v_hi = f"max(CASE WHEN rn = CAST(ceil({t}) AS BIGINT) THEN v END)"
        frac = f"max({t} - floor({t}))"
        cols.append(f"{v_lo} + ({v_hi} - {v_lo}) * {frac} AS p{round(q * 100)}")
    cols_sql = ",\n  ".join(cols)
    return f"""WITH r AS (
  SELECT {group_col}, CAST({value_col} AS DOUBLE) AS v,
    row_number() OVER (PARTITION BY {group_col} ORDER BY {value_col}) - 1 AS rn,
    count(*) OVER (PARTITION BY {group_col}) AS n
  FROM {table} WHERE {value_col} IS NOT NULL
)
SELECT {group_col},
  {cols_sql}
FROM r GROUP BY {group_col}"""


def _quantile_labels(qs: list[float]) -> list[str]:
    """Output column label per q: ``p<round(q*100)>``. Raises when two
    distinct q values collide on the same label (e.g. 0.333 and 0.334
    both map to p33) — silently-duplicated Spark column names / a
    duplicate-alias SQL error otherwise (r8 ADVICE)."""
    labels = [f"p{round(q * 100)}" for q in qs]
    seen: dict[str, float] = {}
    for q, lab in zip(qs, labels):
        if lab in seen and seen[lab] != q:
            raise ValueError(
                f"quantiles {seen[lab]!r} and {q!r} both label as "
                f"{lab!r} — space qs at least 0.005 apart or dedupe"
            )
        seen[lab] = q
    return labels


def quantile_disc(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    n_buckets: int = 256,
) -> DataFrame:
    """Exact GLOBAL discrete quantiles (type-1 / inverse ECDF): for
    each q, the smallest value whose cumulative count reaches 1-based
    rank ``max(1, ceil(q·n))`` — DuckDB's ``quantile_disc`` convention
    (pinned against the built-in in tests/test_quantiles.py). Returns
    ONE row with a ``p<q*100>`` column per q.

    :func:`group_quantiles` interpolates per group, where the
    per-group sort is inherent and parallel across groups; a GLOBAL
    quantile has no such partitioning, and the naive global-sort
    window is a single-partition scale-killer. This uses the
    :func:`ks_2samp` bucketed-prefix-sum shape instead: per-distinct-
    value counts (hash agg, map-side partials), order-preserving value
    buckets computed in-plan from the broadcast min/max, per-bucket
    running counts, and ONLY the ≤ ``n_buckets`` bucket totals through
    a single-partition running-total window. Bucketing only GROUPS the
    prefix sum — integer addition is associative, so the cumulative
    counts equal the oracle's flat global window exactly.

    Rank selection is a pure BIGINT comparison against the exact
    cumulative count, and the result is a data ELEMENT, not
    arithmetic — so the output is bit-identical across engines. The
    single float op, ``ceil(q·n)``, is one IEEE multiply of the same
    two operands on both sides. NULLs are excluded (rank statistics of
    observed values; see group_quantiles for the cross-engine NULL
    ordering hazard).

    Scan discipline: the per-distinct-value aggregation is the ONLY
    pass over the fact table, pinned by a lazy ``persist`` —
    its plan is consumed by both the min/max stats side and the
    bucketing side, and without the boundary each consumer would
    re-derive the scan (the r8 plan read 4×). Every downstream stage
    (bucketing, per-bucket cum, bucket totals, offsets) is a
    projection or agg over the checkpointed distinct values; ``__n``
    comes from the bucket totals inside the same ≤``n_buckets``-row
    single-partition window pass as the offsets, so no separate
    global count branch exists.
    """
    from pyspark.sql import Window

    labels = _quantile_labels(qs)
    f = df.where(F.col(value_col).isNotNull())
    per_v = (
        f.groupBy(F.col(value_col).cast("double").alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .persist(StorageLevel.DISK_ONLY)
    )
    stats = per_v.agg(
        F.min("__v").alias("__lo"),
        F.max("__v").alias("__hi"),
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets))
    bucketed = per_v.crossJoin(F.broadcast(stats)).withColumn(
        "__bkt",
        F.when(
            F.col("__hi") > F.col("__lo"),
            F.least(
                F.floor((F.col("__v") - F.col("__lo")) / width),
                F.lit(n_buckets - 1),
            ),
        ).otherwise(F.lit(0)),
    )
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bucketed.withColumn("__cum", F.sum("__c").over(w_in))
    totals = bucketed.groupBy("__bkt").agg(
        F.sum("__c").cast("long").alias("__t")
    )
    w_bkt = Window.orderBy(F.col("__bkt").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy(F.col("__bkt").asc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = totals.select(
        "__bkt",
        F.coalesce(F.sum("__t").over(w_bkt), F.lit(0)).alias("__o"),
        F.sum("__t").over(w_all).alias("__n"),
    )
    joined = cum.join(F.broadcast(offsets), "__bkt").select(
        "__v", "__n", (F.col("__o") + F.col("__cum")).alias("__cumt")
    )
    aggs = []
    for q, label in zip(qs, labels):
        rank = F.greatest(
            F.lit(1).cast("bigint"),
            F.ceil(F.lit(float(q)) * F.col("__n").cast("double")).cast(
                "bigint"
            ),
        )
        aggs.append(
            F.min(F.when(F.col("__cumt") >= rank, F.col("__v"))).alias(label)
        )
    from shaha_spark.caching import registers

    return registers(joined.agg(*aggs), per_v)


def quantile_disc_sql(table: str, value_col: str, qs: list[float]) -> str:
    """DuckDB oracle twin of :func:`quantile_disc` — the same rank
    selection over a FLAT global cumulative window (the oracle need not
    bucket; the bucketed plan's integer prefix sums are identical).
    Spelled out rather than delegated to the engine's quantile_disc so
    the rank convention is explicit; the built-in is pinned equal in
    tests."""
    cols = []
    for q, label in zip(qs, _quantile_labels(qs)):
        rank = (
            f"greatest(1, CAST(ceil({float(q)!r} * CAST(n AS DOUBLE)) "
            f"AS BIGINT))"
        )
        cols.append(f"min(CASE WHEN cum >= {rank} THEN v END) AS {label}")
    cols_sql = ",\n  ".join(cols)
    return f"""WITH pv AS (
  SELECT CAST({value_col} AS DOUBLE) AS v, count(*) AS c
  FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1
), r AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
  FROM pv
)
SELECT
  {cols_sql}
FROM r"""


def pearson_corr(
    df: DataFrame, col_x: str, col_y: str, precision: str = "decimal(18,2)"
) -> DataFrame:
    """One-row Pearson correlation of two numeric columns.

    Same determinism strategy as the stddev profile: all five sums
    accumulate exactly in DECIMAL (order-independent), and the final
    correlation is a fixed sequence of double operations on those exact
    values — the engine's corr() would instead accumulate doubles
    per-partition and drift with partitioning.

    Only COMPLETE pairs participate: rows where either column is NULL
    are excluded, so n and all five sums cover the same population.
    (Unfiltered, each SUM would skip its own column's NULLs
    independently and the formula would mix populations — a NULL-laced
    perfectly-correlated column pair can read as near-zero r.)
    """
    df = df.where(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
    x = F.col(col_x).cast(precision)
    y = F.col(col_y).cast(precision)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    sc = _dec_scale(precision)
    n = F.col("n").cast("double")
    sx = split_cast_double(F.col("sx"), sc)
    sy = split_cast_double(F.col("sy"), sc)
    sxx = split_cast_double(F.col("sxx"), 2 * sc)
    syy = split_cast_double(F.col("syy"), 2 * sc)
    sxy = split_cast_double(F.col("sxy"), 2 * sc)
    return agg.select(
        F.col("n"),
        ((n * sxy - sx * sy)
         / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
         ).alias("pearson_r"),
    )


def pearson_corr_sql(
    table: str, col_x: str, col_y: str, precision: str = "DECIMAL(18,2)"
) -> str:
    """DuckDB oracle twin of :func:`pearson_corr` (same op order; NOT
    the engine's corr())."""
    sc = _dec_scale(precision)
    dsx = split_cast_double_sql("sx", sc)
    dsy = split_cast_double_sql("sy", sc)
    dsxx = split_cast_double_sql("sxx", 2 * sc)
    dsyy = split_cast_double_sql("syy", 2 * sc)
    dsxy = split_cast_double_sql("sxy", 2 * sc)
    return f"""WITH s AS (
  SELECT count(*) AS n,
    SUM(CAST({col_x} AS {precision})) AS sx,
    SUM(CAST({col_y} AS {precision})) AS sy,
    SUM(CAST({col_x} AS {precision}) * CAST({col_x} AS {precision})) AS sxx,
    SUM(CAST({col_y} AS {precision}) * CAST({col_y} AS {precision})) AS syy,
    SUM(CAST({col_x} AS {precision}) * CAST({col_y} AS {precision})) AS sxy
  FROM {table} WHERE {col_x} IS NOT NULL AND {col_y} IS NOT NULL
)
SELECT CAST(n AS BIGINT) AS n,
  (CAST(n AS DOUBLE) * {dsxy} - {dsx} * {dsy})
  / (sqrt(CAST(n AS DOUBLE) * {dsxx} - {dsx} * {dsx})
     * sqrt(CAST(n AS DOUBLE) * {dsyy} - {dsy} * {dsy})) AS pearson_r
FROM s"""


def group_quantile_filter(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q: float,
    threshold_col: str = "q_threshold",
) -> DataFrame:
    """Keep rows whose ``value_col`` is >= their group's q-quantile —
    the 'drop the bottom quartile per source' curation stage.

    Implemented as window functions over ONE lineage of the input: a
    separate quantile aggregation joined back would make the (often
    expensive) upstream a diamond dependency and evaluate it twice.
    Cost is one shuffle on the group key with a per-group sort; the
    interpolation matches :func:`group_quantiles` exactly, and the
    applied threshold is kept as ``threshold_col`` for auditability.

    NULL values are excluded up front (they could never pass the
    ``>= threshold`` filter anyway, but ranking them would shift _n
    and _rn and move every group's threshold).
    """
    from pyspark.sql import Window

    df = df.where(F.col(value_col).isNotNull())
    w_ord = Window.partitionBy(group_col).orderBy(value_col)
    w_all = Window.partitionBy(group_col)
    v = F.col(value_col).cast("double")
    ranked = df.withColumn("_rn", F.row_number().over(w_ord) - 1).withColumn(
        "_n", F.count(F.lit(1)).over(w_all)
    )
    target = (F.col("_n") - 1).cast("double") * F.lit(float(q))
    lo = F.floor(target)
    frac = target - lo
    v_lo = F.max(F.when(F.col("_rn") == lo, v)).over(w_all)
    v_hi = F.max(F.when(F.col("_rn") == F.ceil(target), v)).over(w_all)
    thr = v_lo + (v_hi - v_lo) * frac
    return (
        ranked.withColumn(threshold_col, thr)
        .filter(v >= F.col(threshold_col))
        .drop("_rn", "_n")
    )


def histogram(
    df: DataFrame, col: str, bins: int = 10
) -> DataFrame:
    """Equi-width histogram: [bucket, lo, hi, n] rows, empty buckets
    omitted.

    Bounds come from a 1-row broadcast aggregate (table statistics in
    production); bucket assignment is a codegen'd expression and the
    count is one map-side-partial hash aggregate carrying at most
    ``bins`` rows per partition into the shuffle — the same
    fixed-width-shuffle property as the HLL sketch. All arithmetic is
    a fixed sequence of double ops, reproducible across engines.

    NULL values are excluded: least(NULL, bins-1) skips the NULL in
    both engines, so unfiltered NULL rows would silently pile into the
    top bucket as a phantom spike at the maximum.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    df = df.where(F.col(col).isNotNull())
    bounds = df.agg(
        F.min(F.col(col)).cast("double").alias("_mn"),
        F.max(F.col(col)).cast("double").alias("_mx"),
    )
    v = F.col(col).cast("double")
    width = (F.col("_mx") - F.col("_mn")) / F.lit(float(bins))
    raw = F.floor((v - F.col("_mn")) / width).cast("long")
    bucket = F.when(F.col("_mx") > F.col("_mn"),
                    F.least(raw, F.lit(bins - 1))).otherwise(F.lit(0))
    return (
        df.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "_mn", "_mx")
        .groupBy("bucket", "_mn", "_mx")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.col("_mn") + F.col("bucket").cast("double")
             * ((F.col("_mx") - F.col("_mn")) / F.lit(float(bins)))).alias("lo"),
            (F.col("_mn") + (F.col("bucket") + 1).cast("double")
             * ((F.col("_mx") - F.col("_mn")) / F.lit(float(bins)))).alias("hi"),
            "n",
        )
    )


def histogram_sql(table: str, col: str, bins: int = 10) -> str:
    """DuckDB oracle twin of :func:`histogram` — identical bucket and
    edge arithmetic."""
    width = f"((b._mx - b._mn) / {float(bins)!r})"
    raw = f"CAST(floor((CAST({col} AS DOUBLE) - b._mn) / {width}) AS BIGINT)"
    bucket = f"CASE WHEN b._mx > b._mn THEN least({raw}, {bins - 1}) ELSE 0 END"
    return f"""WITH b AS (
  SELECT CAST(min({col}) AS DOUBLE) AS _mn, CAST(max({col}) AS DOUBLE) AS _mx FROM {table}
),
g AS (
  SELECT {bucket} AS bucket, b._mn, b._mx, count(*) AS n
  FROM {table}, b WHERE {col} IS NOT NULL GROUP BY 1, 2, 3
)
SELECT bucket,
  _mn + CAST(bucket AS DOUBLE) * ((_mx - _mn) / {float(bins)!r}) AS lo,
  _mn + CAST(bucket + 1 AS DOUBLE) * ((_mx - _mn) / {float(bins)!r}) AS hi,
  CAST(n AS BIGINT) AS n
FROM g"""


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    id_col: str,
    z: float = 3.0,
    precision: str = "decimal(18,2)",
) -> DataFrame:
    """Rows whose value deviates more than ``z`` sample standard
    deviations from their group mean — the basic distributional
    anomaly screen.

    The per-group moments come from a hash AGGREGATION joined back to
    the fact rows (optimization r12, guide §2.3/§2.5) — NOT a window
    over the group partition: with a low-cardinality group key the
    window form shuffles the ENTIRE fact table into |groups|
    partitions (5 here — an unfixable skew funnel at 100 TB, and AQE
    skew handling does not apply to windows), where the aggregate
    combines map-side to |groups| rows and joins back broadcast-sized,
    leaving the fact scan shuffle-free. Measured 3.6 → 1.9 s at sf0.1;
    values are bit-identical (the sums accumulate exactly in DECIMAL
    and are order-free; the join is null-safe on the group key exactly
    as window partitioning groups NULLs). The cost is a second fact
    scan (join probe side), the standard price of the
    aggregate-then-attach shape. The z-score is a fixed sequence of
    double ops on the exact sums — deterministic across engines and
    partitionings, unlike a double-accumulated stddev. Degenerate
    groups (n < 2, or zero variance) are dropped by an explicit
    ``sd > 0 AND NOT isnan(sd)`` guard BEFORE the division: without it
    the 0/0 z-score is NaN, and Spark orders NaN greater than every
    number in comparisons — abs(NaN) > z would be TRUE in Spark and
    false elsewhere, a silent cross-engine divergence.

    NULL values are excluded up front: the SUMs skip them but
    COUNT(*) would not, so NULL-bearing groups would get a fabricated
    variance (and their null rows a null z-score)."""
    df = df.where(F.col(value_col).isNotNull())
    v = F.col(value_col).cast(precision)
    agg = df.groupBy(*[F.col(g) for g in group_cols]).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(v).alias("__s"),
        F.sum(v * v).alias("__s2"),
    )
    cond = None
    for g in group_cols:
        c = df[g].eqNullSafe(agg[g])
        cond = c if cond is None else (cond & c)
    stats = df.select(
        F.col(id_col),
        *[F.col(g) for g in group_cols],
        F.col(value_col),
    ).join(agg, cond).drop(*[agg[g] for g in group_cols])
    sc = _dec_scale(precision)
    n = F.col("__n").cast("double")
    s = split_cast_double(F.col("__s"), sc)
    s2 = split_cast_double(F.col("__s2"), 2 * sc)
    mean = s / n
    sd = F.sqrt((s2 - s * s / n) / (n - F.lit(1.0)))
    # singleton groups first (n - 1 = 0 is a hard DIVIDE_BY_ZERO under
    # ANSI mode, not a NaN) — then the zero-variance / NaN guard
    guarded = (
        stats.filter(F.col("__n") >= 2)
        .withColumn("__sd", sd)
        .filter((F.col("__sd") > 0) & ~F.isnan(F.col("__sd")))
    )
    zscore = (F.col(value_col) - mean) / F.col("__sd")
    return (
        guarded.withColumn("zscore", zscore)
        .filter(F.abs(F.col("zscore")) > z)
        .select(
            F.col(id_col),
            *[F.col(g) for g in group_cols],
            F.col(value_col),
            "zscore",
        )
    )


def zscore_outliers_sql(
    table: str,
    value_col: str,
    group_cols: list[str],
    id_col: str,
    z: float = 3.0,
    precision: str = "DECIMAL(18,2)",
) -> str:
    """DuckDB oracle twin of :func:`zscore_outliers` — same window
    sums, same double op order (NOT the engine's stddev_samp)."""
    groups = ", ".join(group_cols)
    sc = _dec_scale(precision)
    dsv = split_cast_double_sql("sv", sc)
    dsv2 = split_cast_double_sql("sv2", 2 * sc)
    return f"""WITH s AS (
  SELECT {id_col}, {groups}, {value_col},
    COUNT(*) OVER w AS n,
    SUM(CAST({value_col} AS {precision})) OVER w AS sv,
    SUM(CAST({value_col} AS {precision}) * CAST({value_col} AS {precision})) OVER w AS sv2
  FROM {table} WHERE {value_col} IS NOT NULL
  WINDOW w AS (PARTITION BY {groups})
),
g AS (
  SELECT {id_col}, {groups}, {value_col}, n, sv,
    sqrt(({dsv2} - {dsv} * {dsv} / CAST(n AS DOUBLE))
         / (CAST(n AS DOUBLE) - 1.0)) AS sd
  FROM s WHERE n >= 2
),
zc AS (
  SELECT {id_col}, {groups}, {value_col},
    ({value_col} - {dsv} / CAST(n AS DOUBLE)) / sd AS zscore
  FROM g WHERE sd > 0 AND NOT isnan(sd)
)
SELECT {id_col}, {groups}, {value_col}, zscore
FROM zc WHERE abs(zscore) > {z}"""


def equi_depth_histogram(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    buckets: int = 8,
) -> DataFrame:
    """Per-group equi-depth (equal-count) histogram: ``ntile`` buckets
    over the total order (value, id), each reporting its [lo, hi]
    value range and row count — the complement of the equi-width
    :func:`histogram` for skewed distributions.

    The id tiebreak makes the order total, so bucket assignment is
    deterministic and both engines' NTILE (first buckets take the
    remainder rows) agree exactly. Scale shape: one shuffle on the
    group key and a per-group sort — the same inherent cost as
    :func:`group_quantiles`; groups parallelize across the cluster.

    NULL values are excluded before bucketing: Spark sorts NULLS
    FIRST, DuckDB NULLS LAST, so ranking them would both pollute the
    depth counts and diverge across engines.
    """
    from pyspark.sql import Window

    df = df.where(F.col(value_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(value_col, id_col)
    return (
        df.select(
            F.col(group_col),
            F.col(value_col),
            F.ntile(buckets).over(w).alias("bucket"),
        )
        .groupBy(group_col, "bucket")
        .agg(
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def equi_depth_histogram_sql(
    table: str,
    group_col: str,
    value_col: str,
    id_col: str,
    buckets: int = 8,
) -> str:
    """DuckDB oracle twin of :func:`equi_depth_histogram`."""
    return f"""WITH t AS (
  SELECT {group_col}, {value_col},
    ntile({buckets}) OVER (
      PARTITION BY {group_col} ORDER BY {value_col}, {id_col}
    ) AS bucket
  FROM {table} WHERE {value_col} IS NOT NULL
)
SELECT {group_col}, bucket,
  min({value_col}) AS lo, max({value_col}) AS hi,
  CAST(count(*) AS BIGINT) AS n
FROM t GROUP BY 1, 2"""


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Per-group quantile clipping (winsorization): values below the
    group's ``lo_q`` quantile or above ``hi_q`` snap to the boundary —
    the standard heavy-tail taming step before scaling/training.

    Reuses :func:`group_quantiles` for the exact interpolated
    boundaries (deterministic IEEE op sequence), broadcasts the tiny
    per-group boundary table back onto the rows, and clips with
    least/greatest — no second sort of the fact table.
    """
    bounds = group_quantiles(df, group_col, value_col, [lo_q, hi_q])
    lo_name = f"p{round(lo_q * 100)}"
    hi_name = f"p{round(hi_q * 100)}"
    v = F.col(value_col).cast("double")
    return (
        df.join(F.broadcast(bounds), group_col)
        .select(
            F.col(id_col),
            F.col(group_col),
            v.alias(value_col),
            # when-guard: least/greatest skip NULLs in both engines, so
            # an unguarded clip would rewrite a NULL value as clip_lo
            F.when(
                v.isNotNull(),
                F.least(F.greatest(v, F.col(lo_name)), F.col(hi_name)),
            ).alias("value_clipped"),
            F.col(lo_name).alias("clip_lo"),
            F.col(hi_name).alias("clip_hi"),
        )
    )


def winsorize_sql(
    table: str,
    group_col: str,
    value_col: str,
    id_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> str:
    """DuckDB oracle twin of :func:`winsorize`, over the
    :func:`group_quantiles_sql` boundary CTE."""
    lo_name = f"p{round(lo_q * 100)}"
    hi_name = f"p{round(hi_q * 100)}"
    return f"""WITH bounds AS (
{group_quantiles_sql(table, group_col, value_col, [lo_q, hi_q])}
)
SELECT t.{id_col}, t.{group_col},
  CAST(t.{value_col} AS DOUBLE) AS {value_col},
  CASE WHEN t.{value_col} IS NOT NULL
    THEN least(greatest(CAST(t.{value_col} AS DOUBLE), b.{lo_name}), b.{hi_name})
  END AS value_clipped,
  b.{lo_name} AS clip_lo,
  b.{hi_name} AS clip_hi
FROM {table} t JOIN bounds b ON t.{group_col} = b.{group_col}"""


def welch_t(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    precision: str = "decimal(18,2)",
) -> DataFrame:
    """Welch's two-sample t statistic between two groups — the A/B
    experiment readout (unequal variances, unequal sizes).

    One aggregation pass: all six sums (n, Σv, Σv² per group) are
    conditional DECIMAL sums — order-independent exact — and the
    statistic is a fixed sequence of correctly-rounded double ops
    (IEEE sqrt included), so the result is bit-identical across
    engines and partitionings, like pearson_corr. Degenerate inputs
    (a group missing or single-row) yield t_stat = 0.0, not null.

    NULL values are excluded up front: the conditional sums would skip
    them anyway, but the 1-counters would NOT, inflating n_a/n_b and
    fabricating variance from rows that contributed no value.
    """
    df = df.where(F.col(value_col).isNotNull())
    v = F.col(value_col).cast(precision)
    is_a = F.col(group_col) == F.lit(group_a)
    is_b = F.col(group_col) == F.lit(group_b)
    zero = F.lit(0).cast(precision)
    agg = df.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("na"),
        F.sum(F.when(is_a, v).otherwise(zero)).alias("sa"),
        F.sum(F.when(is_a, v * v).otherwise(zero)).alias("ssa"),
        F.sum(F.when(is_b, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(is_b, v).otherwise(zero)).alias("sb"),
        F.sum(F.when(is_b, v * v).otherwise(zero)).alias("ssb"),
    )
    sc = _dec_scale(precision)
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    sa = split_cast_double(F.col("sa"), sc)
    sb = split_cast_double(F.col("sb"), sc)
    ssa = split_cast_double(F.col("ssa"), 2 * sc)
    ssb = split_cast_double(F.col("ssb"), 2 * sc)
    ma, mb = sa / na, sb / nb
    va = (ssa - sa * sa / na) / (na - F.lit(1.0))
    vb = (ssb - sb * sb / nb) / (nb - F.lit(1.0))
    se = F.sqrt(va / na + vb / nb)
    ok = (F.col("na") > 1) & (F.col("nb") > 1)
    return agg.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.when(F.col("na") > 0, ma).otherwise(F.lit(0.0)).alias("mean_a"),
        F.when(F.col("nb") > 0, mb).otherwise(F.lit(0.0)).alias("mean_b"),
        F.when(ok & (se > 0), (ma - mb) / se).otherwise(F.lit(0.0)).alias(
            "t_stat"
        ),
    )


def welch_t_sql(
    table: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    precision: str = "DECIMAL(18,2)",
) -> str:
    """DuckDB oracle twin of :func:`welch_t` (same op order)."""
    v = f"CAST({value_col} AS {precision})"
    sc = _dec_scale(precision)
    dsa = split_cast_double_sql("sa", sc)
    dsb = split_cast_double_sql("sb", sc)
    dssa = split_cast_double_sql("ssa", 2 * sc)
    dssb = split_cast_double_sql("ssb", 2 * sc)
    se = (
        f"sqrt((({dssa} - {dsa} * {dsa} / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0)) / CAST(na AS DOUBLE)"
        f"   + (({dssb} - {dsb} * {dsb} / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0)) / CAST(nb AS DOUBLE))"
    )
    return f"""WITH s AS (
  SELECT
    SUM(CASE WHEN {group_col} = {group_a} THEN 1 ELSE 0 END) AS na,
    SUM(CASE WHEN {group_col} = {group_a} THEN {v} ELSE CAST(0 AS {precision}) END) AS sa,
    SUM(CASE WHEN {group_col} = {group_a} THEN {v} * {v} ELSE CAST(0 AS {precision}) END) AS ssa,
    SUM(CASE WHEN {group_col} = {group_b} THEN 1 ELSE 0 END) AS nb,
    SUM(CASE WHEN {group_col} = {group_b} THEN {v} ELSE CAST(0 AS {precision}) END) AS sb,
    SUM(CASE WHEN {group_col} = {group_b} THEN {v} * {v} ELSE CAST(0 AS {precision}) END) AS ssb
  FROM {table} WHERE {value_col} IS NOT NULL
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
  CASE WHEN na > 0 THEN {dsa} / CAST(na AS DOUBLE) ELSE 0.0 END AS mean_a,
  CASE WHEN nb > 0 THEN {dsb} / CAST(nb AS DOUBLE) ELSE 0.0 END AS mean_b,
  CASE WHEN na > 1 AND nb > 1 AND
    {se} > 0
  THEN
    ({dsa} / CAST(na AS DOUBLE) - {dsb} / CAST(nb AS DOUBLE))
    / {se}
  ELSE 0.0 END AS t_stat
FROM s"""


def psi(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two slices of a numeric
    column — the standard distribution-drift monitor between a
    reference corpus and a new batch.

    Equal-width bins over the COMBINED min/max (one tiny bounds
    broadcast); per-bin shares clamp at ``eps`` so empty bins
    contribute finitely; each term ``(p−q)·ln(p/q)`` is rounded to 9
    decimals and summed as exact decimals — the unigram-logprob
    determinism recipe. Plan: union scan → 1-row bounds broadcast →
    codegen'd bin projection → one |bins|-key aggregation. Returns one
    row [psi, n_a, n_b, n_bins_used].
    """
    a = df_a.select(F.col(col).cast("double").alias("__x")).withColumn(
        "__side", F.lit(0)
    )
    b = df_b.select(F.col(col).cast("double").alias("__x")).withColumn(
        "__side", F.lit(1)
    )
    u = a.unionByName(b).filter(F.col("__x").isNotNull())
    bounds = u.agg(
        F.min("__x").alias("__mn"), F.max("__x").alias("__mx")
    )
    binned = u.crossJoin(F.broadcast(bounds)).select(
        "__side",
        F.when(F.col("__mx") == F.col("__mn"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(bins - 1),
                F.floor(
                    (F.col("__x") - F.col("__mn"))
                    / (F.col("__mx") - F.col("__mn"))
                    * F.lit(float(bins))
                ).cast("int"),
            )
        )
        .alias("__bin"),
    )
    # |bins|-row table consumed twice (totals + the PSI terms) — the
    # lazy persist stops the whole union+bin+agg subtree running
    # once per consumer (was 8 parquet scans for one PSI). The raw
    # bounds pass still rescans the union — one extra pruned scan is
    # cheaper than materializing the corpus-sized binned stream.
    counts = binned.groupBy("__bin").agg(
        F.sum(F.when(F.col("__side") == 0, 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(F.col("__side") == 1, 1).otherwise(0)).alias("__cb"),
    ).persist()
    totals = counts.agg(
        F.sum("__ca").alias("__na"), F.sum("__cb").alias("__nb")
    )
    # NULLIF-style zero guard: an EMPTY slice would otherwise be a
    # DIVIDE_BY_ZERO crash under ANSI mode. null/0 share falls through
    # greatest() to the eps clamp (greatest skips nulls in BOTH
    # engines), so an empty side reads as all-eps shares — i.e. PSI
    # saturates at "maximal drift" instead of aborting the monitor.
    e = F.lit(float(eps))
    na_safe = F.when(F.col("__na") > 0, F.col("__na").cast("double"))
    nb_safe = F.when(F.col("__nb") > 0, F.col("__nb").cast("double"))
    p = F.greatest(F.col("__ca").cast("double") / na_safe, e)
    q = F.greatest(F.col("__cb").cast("double") / nb_safe, e)
    terms = counts.crossJoin(F.broadcast(totals)).select(
        F.round((p - q) * F.log(p / q), 9).cast("decimal(20,9)").alias("__t"),
        "__ca",
        "__cb",
        F.col("__na"),
        F.col("__nb"),
    )
    from shaha_spark.caching import registers

    return registers(
        terms.agg(
            F.sum("__t").cast("double").alias("psi"),
            F.first("__na").cast("bigint").alias("n_a"),
            F.first("__nb").cast("bigint").alias("n_b"),
            F.count(F.lit(1)).cast("bigint").alias("n_bins_used"),
        ),
        counts,
    )


def psi_sql(
    table_a: str, table_b: str, col: str, bins: int = 10, eps: float = 1e-6
) -> str:
    """DuckDB oracle twin of :func:`psi` (same bin rule, same clamped
    rounded-ln terms, same decimal sums)."""
    return f"""WITH u AS (
  SELECT CAST({col} AS DOUBLE) AS x, 0 AS side FROM {table_a} WHERE {col} IS NOT NULL
  UNION ALL
  SELECT CAST({col} AS DOUBLE) AS x, 1 AS side FROM {table_b} WHERE {col} IS NOT NULL
),
bounds AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM u),
binned AS (
  SELECT side,
    CASE WHEN mx = mn THEN 0
         ELSE LEAST({bins - 1}, CAST(FLOOR((x - mn) / (mx - mn) * {float(bins)!r}) AS INTEGER))
    END AS bin
  FROM u CROSS JOIN bounds
),
counts AS (
  SELECT bin,
    SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS ca,
    SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cb
  FROM binned GROUP BY bin
),
tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM counts),
terms AS (
  SELECT
    CAST(round(
      (GREATEST(CAST(ca AS DOUBLE) / CAST(NULLIF(na, 0) AS DOUBLE), {eps!r})
       - GREATEST(CAST(cb AS DOUBLE) / CAST(NULLIF(nb, 0) AS DOUBLE), {eps!r}))
      * ln(GREATEST(CAST(ca AS DOUBLE) / CAST(NULLIF(na, 0) AS DOUBLE), {eps!r})
           / GREATEST(CAST(cb AS DOUBLE) / CAST(NULLIF(nb, 0) AS DOUBLE), {eps!r})),
      9) AS DECIMAL(20,9)) AS t,
    na, nb
  FROM counts CROSS JOIN tot
)
SELECT CAST(SUM(t) AS DOUBLE) AS psi,
       CAST(ANY_VALUE(na) AS BIGINT) AS n_a,
       CAST(ANY_VALUE(nb) AS BIGINT) AS n_b,
       CAST(COUNT(*) AS BIGINT) AS n_bins_used
FROM terms"""


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outliers by Median Absolute Deviation: flag
    rows with |x − median| > k · MAD, where MAD = median(|x − median|).

    The z-score screen (events_outliers) breaks down exactly when you
    need it — outliers inflate the mean AND the stddev, masking
    themselves; medians don't move. Both medians reuse
    :func:`group_quantiles`'s explicit exact-interpolation recipe, so
    the flags are bit-deterministic across engines. Degenerate groups
    (MAD = 0, i.e. >50% identical values) flag any deviation from the
    median — the conventional strict reading.

    Two shuffles on the group key (one per median — the second ranks
    the derived |x − median| column) + one broadcast join of the
    group-level statistics back to the rows. The narrow ``dev``
    projection (group, id, x, med, adev) is materialized once via a
    lazy disk-backed persist: it feeds BOTH the second median and the
    final filter, and re-deriving it repeats the first median's scan
    per consumer (4 fact scans measured). Materializing the 5-column
    projection once is the cheaper input to derive the MAD from at
    any scale.
    """
    med = group_quantiles(df, group_col, value_col, [0.5]).select(
        F.col(group_col), F.col("p50").alias("__med")
    )
    dev = df.join(F.broadcast(med), group_col).select(
        F.col(group_col),
        F.col(id_col),
        F.col(value_col).cast("double").alias("__x"),
        F.col("__med"),
        F.abs(F.col(value_col).cast("double") - F.col("__med")).alias("__adev"),
    ).persist(StorageLevel.DISK_ONLY)
    mad = group_quantiles(dev, group_col, "__adev", [0.5]).select(
        F.col(group_col), F.col("p50").alias("__mad")
    )
    from shaha_spark.caching import registers

    return registers(
        dev.join(F.broadcast(mad), group_col)
        .where(F.col("__adev") > F.lit(float(k)) * F.col("__mad"))
        .select(
            F.col(group_col),
            F.col(id_col),
            F.col("__x").alias("value"),
            F.col("__med").alias("median"),
            F.col("__mad").alias("mad"),
        ),
        dev,
    )


def chi_square(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pearson chi-square statistic of independence for two categorical
    columns — one row [chi2, dof, n].

    Observed counts are one hash-agg; expected counts come from the
    row/column marginals joined back (both broadcast — they are
    category-cardinality-sized). Every observed count is an exact
    integer; each cell term (o−e)²/e is a fixed double sequence on
    exact inputs, rounded to 9 decimals and summed as exact decimals —
    the engine-exact recipe. Cells with zero marginal mass cannot
    occur (cells only exist where observed > 0, and absent observed
    cells contribute e²/e = e, folded in via the marginal identity:
    chi2 = Σ_cells o²/e − n, which needs ONLY the observed cells).

    Rows with a NULL in either column are excluded up front: NULL is
    not a category. Without the filter, NULL-key cells survive the
    groupBy but never match the marginal equi-joins (NULL never equals
    NULL), so __n counts rows whose cells are missing from the o²/e
    sum and the marginal identity breaks — chi2 deflates, even below
    zero.
    """
    df = df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    # lazy persist: obs (category-cardinality² rows) feeds FOUR
    # consumers (ra, cb, tot, cells) — each would re-derive the fact
    # scan without the boundary (5 runtime scans measured for one
    # statistic; VERDICT r8 #4's cure applied beyond quantile_disc)
    obs = (
        df.groupBy(col_a, col_b)
        .agg(F.count(F.lit(1)).alias("__o"))
        .persist()
    )
    ra = obs.groupBy(col_a).agg(F.sum("__o").alias("__ra"))
    cb = obs.groupBy(col_b).agg(F.sum("__o").alias("__cb"))
    tot = obs.agg(
        F.sum("__o").alias("__n"),
        F.count_distinct(col_a).alias("__ka"),
        F.count_distinct(col_b).alias("__kb"),
    )
    cells = (
        obs.join(F.broadcast(ra), col_a)
        .join(F.broadcast(cb), col_b)
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                (F.col("__o").cast("double") * F.col("__o"))
                / (
                    F.col("__ra").cast("double")
                    * F.col("__cb").cast("double")
                    / F.col("__n").cast("double")
                ),
                9,
            )
            .cast("decimal(25,9)")
            .alias("__t"),
            "__n",
            "__ka",
            "__kb",
        )
    )
    from shaha_spark.caching import registers

    return registers(
        cells.agg(
            F.round(
                # split-cast: SUM(t) ~ n + chi2 crosses 2^53 in unscaled
                # units (scale 9) near n ~ 9e6 rows — see split_cast_double
                split_cast_double(F.sum("__t"), 9)
                - F.first("__n").cast("double"),
                9,
            ).alias("chi2"),
            ((F.first("__ka") - 1) * (F.first("__kb") - 1))
            .cast("bigint")
            .alias("dof"),
            F.first("__n").cast("bigint").alias("n"),
        ),
        obs,
    )


def mutual_info(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns — one
    row [mi_nats, n]. The dependence MEASURE complementing
    :func:`chi_square`'s significance TEST: MI is the KL divergence of
    the joint from the product of marginals,
    MI = Σ_cells (o/n)·ln(n·o / (ra·cb)), and only observed cells
    contribute (0·ln0 = 0 by continuity).

    Same plan shape as chi_square: observed counts in one hash agg,
    category-cardinality marginals broadcast back. Determinism: counts
    are exact integers; each cell's log-ratio argument is a fixed
    3-op double sequence on exact casts, the ln is rounded to 9
    decimals (the transcendental recipe), the per-cell term
    o·ln-rounded is rounded to 6 and summed as exact DECIMAL, and the
    final /n is one split-cast division — no double accumulates across
    rows anywhere. The product o·rln is a STANDALONE multiply feeding
    round() (never a multiply-add chain), so DuckDB's FMA contraction
    (see timeseries.ewma_sql) has nothing to fuse.

    NULLs in either column are excluded up front (not a category —
    same marginal-identity hazard as chi_square).
    """
    df = df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    # same four-consumer boundary as chi_square (ra, cb, tot, cells)
    obs = (
        df.groupBy(col_a, col_b)
        .agg(F.count(F.lit(1)).alias("__o"))
        .persist()
    )
    ra = obs.groupBy(col_a).agg(F.sum("__o").alias("__ra"))
    cb = obs.groupBy(col_b).agg(F.sum("__o").alias("__cb"))
    tot = obs.agg(F.sum("__o").alias("__n"))
    rln = F.round(
        F.log(
            (F.col("__n").cast("double") * F.col("__o").cast("double"))
            / (F.col("__ra").cast("double") * F.col("__cb").cast("double"))
        ),
        9,
    )
    cells = (
        obs.join(F.broadcast(ra), col_a)
        .join(F.broadcast(cb), col_b)
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(F.col("__o").cast("double") * rln, 6)
            .cast("decimal(25,6)")
            .alias("__t"),
            "__n",
        )
    )
    from shaha_spark.caching import registers

    return registers(
        cells.agg(
            (split_cast_double(F.sum("__t"), 6) / F.first("__n").cast("double"))
            .alias("mi_nats"),
            F.first("__n").cast("bigint").alias("n"),
        ),
        obs,
    )


def mutual_info_sql(table: str, col_a: str, col_b: str) -> str:
    """DuckDB oracle twin of :func:`mutual_info` — identical exact
    counts, rounded-ln cells, decimal sum, split-cast division."""
    return f"""WITH f AS (
  SELECT {col_a}, {col_b} FROM {table}
  WHERE {col_a} IS NOT NULL AND {col_b} IS NOT NULL
), obs AS (
  SELECT {col_a}, {col_b}, count(*) AS o FROM f GROUP BY {col_a}, {col_b}
), ra AS (
  SELECT {col_a}, sum(o) AS ra FROM obs GROUP BY {col_a}
), cb AS (
  SELECT {col_b}, sum(o) AS cb FROM obs GROUP BY {col_b}
), tot AS (
  SELECT sum(o) AS n FROM obs
), cells AS (
  SELECT CAST(round(CAST(o AS DOUBLE) * round(ln(
           (CAST(n AS DOUBLE) * CAST(o AS DOUBLE))
           / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE))), 9), 6)
         AS DECIMAL(25,6)) AS t, n
  FROM obs
  JOIN ra USING ({col_a})
  JOIN cb USING ({col_b})
  CROSS JOIN tot
)
SELECT {split_cast_double_sql("SUM(t)", 6)} / CAST(first(n) AS DOUBLE) AS mi_nats,
  CAST(first(n) AS BIGINT) AS n
FROM cells"""


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top: int = 10,
) -> DataFrame:
    """Key-distribution skew report WITHOUT a global sort — the
    pre-join/pre-agg health check for shuffle planning: one row
    [n_rows, n_keys, max_count, max_share, hhi, topk_shares].

    HHI (Herfindahl index, Σ share²) and max-share need only exact
    integer aggregates (Σcnt² / (Σcnt)² — no ordering), so unlike a
    Gini coefficient there is NO prefix-sum window over the key table:
    the plan is two hash-aggs plus a TakeOrderedAndProject for the
    top-k shares. HHI reads directly as the effective-key reciprocal:
    1/HHI ≈ equivalent number of equally-loaded keys.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__c"))
    # top-k IN-PLAN (orderBy+limit is a distributed
    # TakeOrderedAndProject; collect_list sees at most ``top`` rows,
    # re-sorted since collect order is not guaranteed) — the operator
    # stays lazy like its siblings, and both this branch and the
    # moment aggregation read the SAME Exchange(hash(key)) subtree,
    # which exchange reuse collapses to one scan of the fact table.
    # The previous driver-side .collect() made the call eager and
    # re-ran the groupBy shuffle for the second aggregation.
    topk = (
        counts.orderBy(F.col("__c").desc(), F.col(key_col).asc())
        .limit(top)
        .agg(
            F.sort_array(
                F.collect_list(F.col("__c").cast("double")), asc=False
            ).alias("__topc")
        )
    )
    agg = counts.agg(
        F.sum("__c").alias("__n"),
        F.count(F.lit(1)).alias("__k"),
        F.max("__c").alias("__mx"),
        F.sum(F.col("__c") * F.col("__c")).alias("__ss"),
    )
    n = F.col("__n").cast("double")
    return agg.crossJoin(F.broadcast(topk)).select(
        F.col("__n").cast("bigint").alias("n_rows"),
        F.col("__k").cast("bigint").alias("n_keys"),
        F.col("__mx").cast("bigint").alias("max_count"),
        F.round(F.col("__mx").cast("double") / n, 9).alias("max_share"),
        F.round(F.col("__ss").cast("double") / (n * n), 9).alias("hhi"),
        F.transform(
            F.col("__topc"), lambda c: F.round(c / n, 9)
        ).alias("topk_shares"),
    )


def weighted_quantile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    q: float = 0.5,
) -> DataFrame:
    """Exact per-group weighted quantile (lower/type-1 rule): the
    smallest value whose cumulative weight reaches q·W — the weighted
    median (q=0.5) every revenue/size-weighted summary needs, where
    the unweighted median over rows is simply wrong.

    Determinism: weights are 2-decimal-quantized and prefix-summed as
    exact decimals over the per-group (value, tiebreak) sort; the
    threshold test compares exact decimals (q·W computed in decimal),
    so the selected row is engine-exact — no floating cumulative
    drift. One shuffle on the group key; the per-group sort is
    inherent to exactness, same cost class as group_quantiles.

    Rows with a NULL value or NULL weight are excluded: a NULL value
    cannot be "the smallest value reaching q·W" (and sorts NULLS FIRST
    in Spark, NULLS LAST in DuckDB), and a NULL weight would be
    skipped by the sums while still occupying a rank.
    """
    from pyspark.sql import Window

    df = df.where(
        F.col(value_col).isNotNull() & F.col(weight_col).isNotNull()
    )
    w = F.col(weight_col).cast("decimal(18,2)")
    win = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(weight_col).asc()
    )
    ranked = df.select(
        F.col(group_col),
        F.col(value_col).cast("double").alias("__v"),
        F.sum(w)
        .over(win.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__cw"),
        F.sum(w).over(Window.partitionBy(group_col)).alias("__tw"),
    )
    hit = ranked.where(
        F.col("__cw") >= F.lit(q).cast("decimal(10,6)") * F.col("__tw")
    )
    agg = hit.groupBy(group_col).agg(
        F.min("__v").alias(f"wq{round(q * 100)}"),
        F.first("__tw").cast("double").alias("total_weight"),
    )
    return agg


def ks_2samp(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    n_buckets: int = 256,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the value
    distributions of two groups — the nonparametric drift test
    complementing :func:`psi` (binned) and the classifier AUC.

    Exact-rational evaluation: with cumulative counts A(v), B(v) over
    the DISTINCT sorted values, D = max |A(v)·n_b − B(v)·n_a| /
    (n_a·n_b). The numerator is pure BIGINT arithmetic — both engines
    agree bit-for-bit with no float comparisons anywhere in the max —
    and the final statistic is ONE IEEE division of two exact-integer
    casts. Bound: n_a·n_b must stay below 2^63 (n ≲ 3·10^9 rows per
    side — beyond any statistically meaningful sample).

    Scale shape (the token_budget_select pattern): cumulative counts
    partition on an order-preserving value bucket computed in-plan from
    the broadcast min/max (≤ ``n_buckets`` partitions), and only the
    per-bucket totals pass through a single-partition running-total
    window (``n_buckets`` rows at any scale). Bucketing only GROUPS the
    prefix sum — integer addition is associative, so the result is
    identical to the oracle's flat global window. NULL values are
    excluded (an ECDF is undefined on them; both engines drop them in
    the same filter).

    Group-label contract: ``group_a``/``group_b`` may be any equatable
    type here (``isin`` handles them), but the SQL twin
    :func:`ks_2samp_sql` enforces STRING labels (it must embed them as
    quoted literals) and raises ``ValueError`` otherwise — callers
    pairing the twins should pass strings to both.
    """
    from pyspark.sql import Window

    f = df.where(
        F.col(group_col).isin([group_a, group_b])
        & F.col(value_col).isNotNull()
    )
    # lazy persist: per_v is consumed by BOTH the stats side and the
    # bucketing side (and cum by the totals and final-join sides) —
    # without the boundary each consumer re-derives the fact scan
    # (4-5 scans measured; same cure as quantile_disc, VERDICT r8 #4)
    per_v = f.groupBy(F.col(value_col).alias("__v")).agg(
        F.sum(F.when(F.col(group_col) == group_a, 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(F.col(group_col) == group_b, 1).otherwise(0)).alias("__cb"),
    ).persist(StorageLevel.DISK_ONLY)
    stats = per_v.agg(
        F.min("__v").alias("__lo"),
        F.max("__v").alias("__hi"),
        F.sum("__ca").cast("long").alias("__n1"),
        F.sum("__cb").cast("long").alias("__n2"),
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets))
    bucketed = per_v.crossJoin(F.broadcast(stats)).withColumn(
        "__bkt",
        F.when(
            F.col("__hi") > F.col("__lo"),
            F.least(
                F.floor((F.col("__v") - F.col("__lo")) / width),
                F.lit(n_buckets - 1),
            ),
        ).otherwise(F.lit(0)),
    )
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bucketed.withColumn("__cum_a", F.sum("__ca").over(w_in)).withColumn(
        "__cum_b", F.sum("__cb").over(w_in)
    )
    # bucket totals from the pre-window counts (sum == max(cum), both
    # exact ints) so the windowed cum subtree has ONE consumer
    totals = bucketed.groupBy("__bkt").agg(
        F.sum("__ca").cast("long").alias("__ta"),
        F.sum("__cb").cast("long").alias("__tb"),
    )
    w_bkt = Window.orderBy(F.col("__bkt").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__bkt",
        F.coalesce(F.sum("__ta").over(w_bkt), F.lit(0)).alias("__oa"),
        F.coalesce(F.sum("__tb").over(w_bkt), F.lit(0)).alias("__ob"),
    )
    diff = F.abs(
        (F.col("__oa") + F.col("__cum_a")).cast("long") * F.col("__n2")
        - (F.col("__ob") + F.col("__cum_b")).cast("long") * F.col("__n1")
    )
    from shaha_spark.caching import registers

    return registers(
        cum.join(F.broadcast(offsets), "__bkt")
        .groupBy("__n1", "__n2")
        .agg(F.max(diff).alias("__dnum"))
        .select(
            F.col("__n1").alias("n_a"),
            F.col("__n2").alias("n_b"),
            F.col("__dnum").cast("long").alias("d_num"),
            # Degenerate-input guard (ADVICE r6): if one group has zero
            # rows the statistic is undefined — return NULL in BOTH
            # engines instead of Spark's ANSI DIVIDE_BY_ZERO vs
            # DuckDB's silent NULL (the SQL twin carries the same CASE).
            F.when(
                (F.col("__n1") > 0) & (F.col("__n2") > 0),
                F.col("__dnum").cast("double")
                / (F.col("__n1") * F.col("__n2")).cast("double"),
            ).alias("d_stat"),
        ),
        per_v,
    )


def ks_2samp_sql(
    table: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> str:
    """DuckDB twin of :func:`ks_2samp` — a FLAT global cumulative
    window (the oracle need not bucket; integer addition is
    associative, so the bucketed Spark plan produces identical exact
    integers), the same BIGINT numerator, and the same single final
    IEEE division.

    Contract (ADVICE r6): ``group_a``/``group_b`` are embedded as
    single-quoted SQL string literals, so this twin accepts STRING
    group values only — quote-free, like the other ``*_sql`` helpers.
    The Spark side's ``isin()`` accepts arbitrary types; when pairing
    the twins for an oracle, the group column must be a string."""
    for g in (group_a, group_b):
        if not isinstance(g, str) or "'" in g:
            raise ValueError(
                "ks_2samp_sql group values must be quote-free strings; "
                f"got {g!r}"
            )
    return f"""WITH f AS (
  SELECT {value_col} AS v,
         CASE WHEN {group_col} = '{group_a}' THEN 1 ELSE 0 END AS ia,
         CASE WHEN {group_col} = '{group_b}' THEN 1 ELSE 0 END AS ib
  FROM {table}
  WHERE {group_col} IN ('{group_a}', '{group_b}') AND {value_col} IS NOT NULL
),
pv AS (SELECT v, SUM(ia) AS ca, SUM(ib) AS cb FROM f GROUP BY v),
n AS (SELECT CAST(SUM(ca) AS BIGINT) AS n1, CAST(SUM(cb) AS BIGINT) AS n2 FROM pv),
c AS (
  SELECT CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cum_a,
         CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cum_b
  FROM pv
)
SELECT n1 AS n_a, n2 AS n_b,
  CAST(MAX(ABS(cum_a * n2 - cum_b * n1)) AS BIGINT) AS d_num,
  CASE WHEN n1 > 0 AND n2 > 0 THEN
    CAST(MAX(ABS(cum_a * n2 - cum_b * n1)) AS DOUBLE)
      / CAST(n1 * n2 AS DOUBLE)
  END AS d_stat
FROM c CROSS JOIN n GROUP BY n1, n2"""


#: Poisson(1) inverse-CDF cutoffs on a 28-bit uniform: P(X <= k) for
#: k = 0..4, scaled to [0, 2^28) and floored IN PYTHON so both engines
#: compare against identical integer literals. Weights cap at 5
#: (P(X > 4) ~ 0.366% — the capped tail shifts each replicate's
#: expected weight by < 0.004, far inside bootstrap noise, and keeps
#: the CASE chain fixed-depth).
_POIS1_CUTS = [
    int((2**28) * p)
    for p in (
        0.36787944117144233,  # e^-1
        0.7357588823428847,
        0.9196986029286058,
        0.9810118431238462,
        0.9963401531726563,
    )
]


def _pois1_weight(u28):
    w = F.lit(5)
    for k in range(len(_POIS1_CUTS) - 1, -1, -1):
        w = F.when(u28 < F.lit(_POIS1_CUTS[k]), F.lit(k)).otherwise(w)
    return w


def _pois1_weight_sql(u28_expr: str) -> str:
    branches = " ".join(
        f"WHEN {u28_expr} < {cut} THEN {k}"
        for k, cut in enumerate(_POIS1_CUTS)
    )
    return f"(CASE {branches} ELSE 5 END)"


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    key_col: str,
    n_reps: int = 40,
    alpha: float = 0.05,
    salt: str = "boot",
    precision: str = "decimal(12,2)",
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean — the
    at-scale bootstrap (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google 2012): instead of resampling n rows
    B times (impossible distributed), each row gets B independent
    Poisson(1) replicate weights, so ALL replicate estimates compute
    in ONE aggregation pass over ONE scan.

    Determinism recipe: replicate weights derive from md5 over
    (key, replicate-group, salt) — one md5 yields FOUR independent
    28-bit uniforms (hex slices), so B replicates cost ceil(B/4) md5
    calls per row; the Poisson inverse-CDF cutoffs are integer
    literals precomputed in Python (identical in both engines); each
    replicate mean is an exact decimal weighted sum split-cast to
    double over an exact integer weight count (one IEEE division);
    the CI picks order statistics from the sorted replicate-mean
    array (floor(alpha/2·B) from each end). NULL values are excluded.
    A replicate whose total Poisson weight is 0 (tiny-n only) is
    coalesced to the overall mean in both engines so the sorted
    array's NULL placement can never diverge cross-engine.

    Output: one row — n, mean_value, ci_lo, ci_hi, n_reps.
    """
    if n_reps < 4:
        raise ValueError(f"n_reps must be >= 4, got {n_reps}")
    if "`" in value_col or "`" in key_col:
        raise ValueError("value_col/key_col must not contain backticks")
    sc = _dec_scale(precision)
    x = F.col(value_col).cast(precision)
    filtered = df.where(F.col(value_col).isNotNull())
    # STAGED weight derivation (r12): digests, then 28-bit uniforms,
    # then Poisson weights, each materialized as a column before the
    # aggregation. Written as one inline expression per aggregate, the
    # md5 sat inside the weight CASE's conditional branches where
    # codegen subexpression elimination does not reach, and each of the
    # n_reps weights was re-evaluated by BOTH its aggregates — up to
    # ~2·6·n_reps md5 calls per row (measured 5.6 s -> 0.6 s at 100k
    # rows). CollapseProject keeps the stages separate (every
    # intermediate alias is non-cheap and referenced more than once);
    # the F.expr strings cut the ~n_reps·20-call py4j construction
    # chatter to one parse per column (same tree, same values).
    lit_salt = salt.replace("'", "\\'")
    n_groups = (n_reps + 3) // 4
    digests = filtered.select(
        F.col(value_col),
        *[
            F.expr(
                f"md5(concat(cast(`{key_col}` as string), '|{g}|{lit_salt}'))"
            ).alias(f"__d_{g}")
            for g in range(n_groups)
        ],
    )
    # Each digest's 28 used hex chars parse as TWO 56-bit conv() calls
    # (chars 1-14 and 15-28; 56 bits fit a signed long) instead of four
    # 28-bit ones, and each half splits into its two original 28-bit
    # uniforms with a shift/mask: conv(substring(d,1,14)) ==
    # u0 * 2^28 + u1 exactly (base-16 positional value), so
    # shiftright(h,28) == u0 and h & (2^28-1) == u1 bit-for-bit — the
    # string-parse count per row halves (r13; conv dominates the md5 in
    # the digest stage's per-row cost) while the replicate weights, and
    # therefore the oracle contract, are unchanged. Pinned against the
    # legacy one-conv-per-uniform form in test_optimization_r13.py.
    n_halves = (n_reps + 1) // 2
    halves = digests.select(
        F.col(value_col),
        *[
            F.expr(
                f"cast(conv(substring(__d_{h // 2}, {1 + 14 * (h % 2)},"
                " 14), 16, 10) as long)"
            ).alias(f"__h_{h}")
            for h in range(n_halves)
        ],
    )
    uniforms = halves.select(
        F.col(value_col),
        *[
            F.expr(
                f"shiftright(__h_{b // 2}, 28)"
                if b % 2 == 0
                else f"(__h_{b // 2} & 268435455)"
            ).alias(f"__u_{b}")
            for b in range(n_reps)
        ],
    )
    def _w_sql(b: int) -> str:
        branches = " ".join(
            f"WHEN __u_{b} < {cut} THEN {k}"
            for k, cut in enumerate(_POIS1_CUTS)
        )
        return f"(CASE {branches} ELSE 5 END)"

    weighted = uniforms.select(
        F.col(value_col),
        *[F.expr(_w_sql(b)).alias(f"__w_{b}") for b in range(n_reps)],
    )
    # The n_reps weighted means aggregate under plain aliases with the
    # split-cast/guard applied in a projection on top, all rendered as
    # SQL text (optimization round 12, guide §7.3: the Column-built
    # split-cast per replicate cost ~28 py4j round trips each — ~1,100
    # for the default 40 replicates; same Aggregate+Project split
    # Catalyst performs on agg result expressions, values identical).
    x_txt = f"cast(`{value_col}` as {precision})"
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.expr(f"sum({x_txt})").alias("__sx"),
    ]
    for b in range(n_reps):
        aggs.append(F.expr(f"sum({x_txt} * __w_{b})").alias(f"__sxw_{b}"))
        aggs.append(F.expr(f"sum(__w_{b})").alias(f"__sw_{b}"))
    mean_txt = f"({split_cast_double_spark_sql('__sx', sc)} / n)"
    one = weighted.agg(*aggs).select(
        "n",
        F.expr(mean_txt).alias("mean_value"),
        *[
            F.expr(
                f"(CASE WHEN __sw_{b} > 0 THEN "
                f"({split_cast_double_spark_sql(f'__sxw_{b}', sc)}"
                f" / cast(__sw_{b} as double)) END)"
            ).alias(f"__m_{b}")
            for b in range(n_reps)
        ],
    )
    # A replicate whose total Poisson weight is 0 (probability e^-n per
    # replicate — only material at tiny n) has an undefined mean; it is
    # coalesced to the overall mean in BOTH engines (ADVICE r6: Spark's
    # sort_array places NULLs first, DuckDB's list_sort places them
    # last, so leaving NULLs in the array skews the order-statistic
    # index differently per engine).
    reps = F.sort_array(
        F.array(
            *[
                F.coalesce(F.col(f"__m_{b}"), F.col("mean_value"))
                for b in range(n_reps)
            ]
        )
    )
    k = int((alpha / 2.0) * n_reps)
    return one.select(
        "n",
        "mean_value",
        F.element_at(reps, k + 1).alias("ci_lo"),
        F.element_at(reps, n_reps - k).alias("ci_hi"),
        F.lit(n_reps).cast("int").alias("n_reps"),
    )


def bootstrap_mean_ci_sql(
    table: str,
    value_col: str,
    key_col: str,
    n_reps: int = 40,
    alpha: float = 0.05,
    salt: str = "boot",
    precision: str = "DECIMAL(12,2)",
) -> str:
    """DuckDB twin of :func:`bootstrap_mean_ci` — identical md5
    slicing, integer cutoffs, decimal-exact weighted sums, split-cast
    divisions, and order-statistic selection."""
    sc = _dec_scale(precision.lower())
    x = f"CAST({value_col} AS {precision})"
    means = []
    for b in range(n_reps):
        grp, off = divmod(b, 4)
        u28 = (
            f"CAST(concat('0x', substr(md5(concat(CAST({key_col} AS VARCHAR), "
            f"'|{grp}|{salt}')), {1 + 7 * off}, 7)) AS BIGINT)"
        )
        w = _pois1_weight_sql(u28)
        means.append(
            f"CASE WHEN SUM({w}) > 0 THEN "
            f"{split_cast_double_sql(f'SUM({x} * {w})', sc)}"
            f" / CAST(SUM({w}) AS DOUBLE) END AS m_{b}"
        )
    k = int((alpha / 2.0) * n_reps)
    means_select = ",\n    ".join(means)
    return f"""WITH agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    {split_cast_double_sql(f'SUM({x})', sc)} / COUNT(*) AS mean_value,
    {means_select}
  FROM {table} WHERE {value_col} IS NOT NULL
),
s AS (SELECT n, mean_value,
      list_sort([{", ".join(f"COALESCE(m_{b}, mean_value)" for b in range(n_reps))}]) AS reps
      FROM agg)
SELECT n, mean_value, reps[{k + 1}] AS ci_lo, reps[{n_reps - k}] AS ci_hi,
       CAST({n_reps} AS INT) AS n_reps
FROM s"""
