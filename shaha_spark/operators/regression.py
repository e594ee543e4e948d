"""Deterministic least-squares trend and autocorrelation.

Reference parity: the reference engine (oritwoen/shaha) has no
regression surface — these belong to the large-scale analytics
extension layer, same rationale as profile.pearson_corr (src/stats.rs
covers only count/min/max-style scan stats).

Both operators follow the repo's exact-sums determinism recipe
(profile.pearson_corr): every moment accumulates exactly in DECIMAL
(order-independent integer arithmetic, so partitioning cannot move the
result), conversion to double goes through split_cast_double, and the
closed-form finale is a FIXED sequence of IEEE ops replayed
identically by the DuckDB SQL twins. The engines' own regr_slope() /
corr() accumulate doubles per-partition and drift with partitioning —
unusable for a value-hash gate.

Scale notes:
  * ols_fit is ONE hash aggregation with map-side partials — no
    window, no join, no sort; group count is irrelevant.
  * autocorr forms lag pairs inside per-SERIES windows (the series key
    should be high-cardinality — e.g. (event_type, user_id), never a
    low-cardinality label alone, which would serialize a giant
    partition) and then pools the pair moments per GROUP in the same
    single hash aggregation shape.

Magnitude domain (oracle-twin constraint, see the r6 notes): DuckDB
multiplies DECIMAL(18,*) operands in int64, so per-row unscaled
products must stay below ~1e18 — callers should center/rescale x to a
small range (e.g. hours since a fixed epoch literal, not raw epoch
micros). The summed moments then stay far inside split_cast_double's
2^53·10^10 domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shaha_spark.operators.profile import (
    _dec_scale,
    split_cast_double,
    split_cast_double_sql,
)


def _moments(x: Column, y: Column) -> list[Column]:
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    ]


def _fit_cols(sc: int) -> tuple[Column, Column, Column, Column]:
    """(slope, intercept, r2, n) from the exact decimal moments.

    Fixed op order; degenerate inputs return NULL in both engines:
    dx == 0 (fewer than two distinct x, incl. n<2) kills slope,
    intercept and r2; dy == 0 (constant y) additionally kills r2.
    The == 0.0 guards compare doubles produced by identical op
    sequences on exactly-cast integers, so both engines take the same
    branch.
    """
    n = F.col("n").cast("double")
    sx = split_cast_double(F.col("sx"), sc)
    sy = split_cast_double(F.col("sy"), sc)
    sxx = split_cast_double(F.col("sxx"), 2 * sc)
    syy = split_cast_double(F.col("syy"), 2 * sc)
    sxy = split_cast_double(F.col("sxy"), 2 * sc)
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    slope = F.when(dx != 0.0, cov / dx)
    intercept = F.when(dx != 0.0, (sy - (cov / dx) * sx) / n)
    r2 = F.when((dx != 0.0) & (dy != 0.0), (cov * cov) / (dx * dy))
    return slope, intercept, r2, F.col("n").cast("bigint")


def ols_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    precision: str = "decimal(18,2)",
) -> DataFrame:
    """Per-group simple least-squares fit y = slope·x + intercept.

    Output: [group, n, slope, intercept, r2] — one row per group.
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), intercept from the
    means, r2 the squared Pearson correlation; all moments exact in
    DECIMAL, finale a fixed IEEE sequence (see module docstring).
    Rows with NULL in either column are excluded so every moment
    covers the same population (the pearson_corr NULL hazard).
    """
    df = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    x = F.col(x_col).cast(precision)
    y = F.col(y_col).cast(precision)
    agg = df.groupBy(group_col).agg(*_moments(x, y))
    slope, intercept, r2, n = _fit_cols(_dec_scale(precision))
    return agg.select(
        F.col(group_col),
        n.alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def _fit_sql(sc: int) -> str:
    dsx = split_cast_double_sql("sx", sc)
    dsy = split_cast_double_sql("sy", sc)
    dsxx = split_cast_double_sql("sxx", 2 * sc)
    dsyy = split_cast_double_sql("syy", 2 * sc)
    dsxy = split_cast_double_sql("sxy", 2 * sc)
    n = "CAST(n AS DOUBLE)"
    dx = f"({n} * {dsxx} - {dsx} * {dsx})"
    dy = f"({n} * {dsyy} - {dsy} * {dsy})"
    cov = f"({n} * {dsxy} - {dsx} * {dsy})"
    return (
        f"CAST(n AS BIGINT) AS n,\n"
        f"  CASE WHEN {dx} <> 0.0 THEN {cov} / {dx} END AS slope,\n"
        f"  CASE WHEN {dx} <> 0.0 THEN ({dsy} - ({cov} / {dx}) * {dsx}) / {n} END"
        f" AS intercept,\n"
        f"  CASE WHEN {dx} <> 0.0 AND {dy} <> 0.0"
        f" THEN ({cov} * {cov}) / ({dx} * {dy}) END AS r2"
    )


def ols_fit_sql(
    table: str,
    group_col: str,
    x_expr: str,
    y_expr: str,
    precision: str = "DECIMAL(18,2)",
    where: str = "TRUE",
) -> str:
    """DuckDB oracle twin of :func:`ols_fit` — same moments, same op
    order, same NULL guards. ``x_expr``/``y_expr`` are SQL expressions
    (e.g. a rescaled time column) evaluated before the decimal cast,
    mirroring whatever projection the Spark caller applied."""
    sc = _dec_scale(precision)
    cx = f"CAST(({x_expr}) AS {precision})"
    cy = f"CAST(({y_expr}) AS {precision})"
    return f"""WITH m AS (
  SELECT {group_col}, count(*) AS n,
    SUM({cx}) AS sx, SUM({cy}) AS sy,
    SUM({cx} * {cx}) AS sxx, SUM({cy} * {cy}) AS syy,
    SUM({cx} * {cy}) AS sxy
  FROM {table}
  WHERE ({x_expr}) IS NOT NULL AND ({y_expr}) IS NOT NULL AND ({where})
  GROUP BY {group_col}
)
SELECT {group_col},
  {_fit_sql(sc)}
FROM m"""


def autocorr(
    df: DataFrame,
    series_cols: list[str],
    order_cols: list[str],
    value_col: str,
    group_cols: list[str],
    lag: int = 1,
    precision: str = "decimal(18,2)",
) -> DataFrame:
    """Pooled within-series lag-k autocorrelation.

    Pairs (v_t, v_{t+lag}) form INSIDE each series (window partitioned
    by ``series_cols``, ordered by ``order_cols`` — the caller must
    make that ordering total, e.g. (ts, id), or pair formation is
    nondeterministic); the Pearson moments of all pairs then pool per
    ``group_cols`` (must be a prefix/subset of series_cols) in one
    hash aggregation. Output: [*group_cols, n_pairs, autocorr].

    Scale: the windows partition on the SERIES key — choose one with
    data-proportional cardinality (users, documents), never a
    low-cardinality label, so no partition serializes the table. The
    pooled aggregation is the same map-side-partial hash agg as
    ols_fit.
    """
    from pyspark.sql import Window

    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    w = Window.partitionBy(*series_cols).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    pairs = (
        df.where(F.col(value_col).isNotNull())
        .withColumn("__y2", F.lead(value_col, lag).over(w))
        .where(F.col("__y2").isNotNull())
    )
    x = F.col(value_col).cast(precision)
    y = F.col("__y2").cast(precision)
    agg = pairs.groupBy(*group_cols).agg(*_moments(x, y))
    sc = _dec_scale(precision)
    n = F.col("n").cast("double")
    sx = split_cast_double(F.col("sx"), sc)
    sy = split_cast_double(F.col("sy"), sc)
    sxx = split_cast_double(F.col("sxx"), 2 * sc)
    syy = split_cast_double(F.col("syy"), 2 * sc)
    sxy = split_cast_double(F.col("sxy"), 2 * sc)
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    return agg.select(
        *[F.col(c) for c in group_cols],
        F.col("n").cast("bigint").alias("n_pairs"),
        F.when(
            (dx != 0.0) & (dy != 0.0), cov / (F.sqrt(dx) * F.sqrt(dy))
        ).alias("autocorr"),
    )


def autocorr_sql(
    table: str,
    series_cols: list[str],
    order_by: str,
    value_col: str,
    group_cols: list[str],
    lag: int = 1,
    precision: str = "DECIMAL(18,2)",
) -> str:
    """DuckDB oracle twin of :func:`autocorr` — flat lead() window with
    the identical partition/order, then the same pooled moments and op
    order. ``order_by`` is the comma-joined ORDER BY expression list
    (must match the Spark order_cols exactly)."""
    sc = _dec_scale(precision)
    part = ", ".join(series_cols)
    grp = ", ".join(group_cols)
    cx = f"CAST(v1 AS {precision})"
    cy = f"CAST(v2 AS {precision})"
    dsx = split_cast_double_sql("sx", sc)
    dsy = split_cast_double_sql("sy", sc)
    dsxx = split_cast_double_sql("sxx", 2 * sc)
    dsyy = split_cast_double_sql("syy", 2 * sc)
    dsxy = split_cast_double_sql("sxy", 2 * sc)
    n = "CAST(n AS DOUBLE)"
    dx = f"({n} * {dsxx} - {dsx} * {dsx})"
    dy = f"({n} * {dsyy} - {dsy} * {dsy})"
    cov = f"({n} * {dsxy} - {dsx} * {dsy})"
    return f"""WITH pairs AS (
  SELECT {grp}, {value_col} AS v1,
    lead({value_col}, {lag}) OVER (PARTITION BY {part} ORDER BY {order_by}) AS v2
  FROM {table} WHERE {value_col} IS NOT NULL
), m AS (
  SELECT {grp}, count(*) AS n,
    SUM({cx}) AS sx, SUM({cy}) AS sy,
    SUM({cx} * {cx}) AS sxx, SUM({cy} * {cy}) AS syy,
    SUM({cx} * {cy}) AS sxy
  FROM pairs WHERE v2 IS NOT NULL
  GROUP BY {grp}
)
SELECT {grp}, CAST(n AS BIGINT) AS n_pairs,
  CASE WHEN {dx} <> 0.0 AND {dy} <> 0.0
       THEN {cov} / (sqrt({dx}) * sqrt({dy})) END AS autocorr
FROM m"""
