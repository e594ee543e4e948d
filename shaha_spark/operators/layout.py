"""Multi-dimensional data layout: Z-order (Morton) clustering.

A hash database sorts by one key; analytic tables often filter on TWO
(user and time, region and date). A linear sort on either column makes
min/max pruning useless for the other. Interleaving the bits of both
keys (the Z-order / Morton curve) bounds every file's bounding box in
BOTH dimensions, so two-dimensional predicates prune files the way
one-dimensional ones prune a sorted layout — the construction behind
Delta/Iceberg table clustering, here as plain codegen'd expressions.

Everything is integer arithmetic (min-max fixed-point normalization,
shift-and-mask bit spreading), so the z-value is engine-portable and
oracle-checkable like every other operator in this repo.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension (two dims → 32-bit z-values)
ZORDER_BITS = 16

#: shift-and-mask spreading constants for 16 → 32-bit bit interleave
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread_bits(x: Column) -> Column:
    """Spread a 16-bit value so its bits occupy even positions of a
    32-bit lane (the standard magic-number Morton spreading)."""
    out = x.bitwiseAND(F.lit((1 << ZORDER_BITS) - 1))
    for shift, mask in _SPREAD:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def zorder_value(
    df: DataFrame, col_x: str, col_y: str, out_col: str = "zval"
) -> DataFrame:
    """Attach the 32-bit Morton code of (col_x, col_y) as ``out_col``.

    Both columns are min-max normalized to 16-bit fixed point with
    integer arithmetic; the per-table min/max scalars join as a 1-row
    broadcast (at scale these come from table statistics instead of a
    scan). Sorting/range-partitioning by ``out_col`` before writing
    gives every output file a bounded 2-D bounding box.
    """
    bounds = df.agg(
        F.min(col_x).cast("long").alias("_mnx"),
        F.max(col_x).cast("long").alias("_mxx"),
        F.min(col_y).cast("long").alias("_mny"),
        F.max(col_y).cast("long").alias("_mxy"),
    )
    top = F.lit((1 << ZORDER_BITS) - 1)
    with_bounds = df.crossJoin(F.broadcast(bounds))

    def norm(c: str, mn: str, mx: str) -> Column:
        # integer DIV keeps this exact and engine-portable; the
        # arithmetic runs in DECIMAL(38,0) because (c - mn) * 65535
        # overflows int64 once the column spans more than ~1.4e14
        # (about 4.5 years of epoch micros) — silently wrapping under
        # non-ANSI semantics. A constant column (span = 0) maps to 0.
        span = F.expr(f"CAST({mx} AS DECIMAL(38,0)) - {mn}")
        return F.when(
            span > 0,
            F.expr(
                f"CAST((CAST({c} AS DECIMAL(38,0)) - {mn})"
                f" * {(1 << ZORDER_BITS) - 1}"
                f" DIV (CAST({mx} AS DECIMAL(38,0)) - {mn}) AS BIGINT)"
            ),
        ).otherwise(F.lit(0)).cast("long")

    zx = _spread_bits(norm(col_x, "_mnx", "_mxx"))
    zy = _spread_bits(norm(col_y, "_mny", "_mxy"))
    return with_bounds.withColumn(
        out_col, zx.bitwiseOR(F.shiftleft(zy, 1)).cast("long")
    ).drop("_mnx", "_mxx", "_mny", "_mxy")


def zorder_value_sql(
    table: str, col_x: str, col_y: str, out_cols: str, out_col: str = "zval"
) -> str:
    """DuckDB oracle twin of :func:`zorder_value` — identical
    normalization and spreading arithmetic. ``out_cols`` is the SQL
    projection list to emit alongside ``out_col``."""

    def spread(expr: str) -> str:
        out = f"({expr} & {(1 << ZORDER_BITS) - 1})"
        for shift, mask in _SPREAD:
            out = f"(({out} | ({out} << {shift})) & {mask})"
        return out

    def norm(c: str, mn: str, mx: str) -> str:
        # HUGEINT mirrors the Spark side's DECIMAL(38,0) widening: the
        # multiply must not wrap for full-range BIGINT columns
        return (
            f"CASE WHEN CAST({mx} AS HUGEINT) - {mn} > 0 THEN "
            f"CAST((CAST({c} AS HUGEINT) - {mn}) * {(1 << ZORDER_BITS) - 1}"
            f" // (CAST({mx} AS HUGEINT) - {mn}) AS BIGINT) "
            f"ELSE 0 END"
        )

    nx = norm(col_x, "b._mnx", "b._mxx")
    ny = norm(col_y, "b._mny", "b._mxy")
    return f"""WITH b AS (
  SELECT CAST(min({col_x}) AS BIGINT) AS _mnx, CAST(max({col_x}) AS BIGINT) AS _mxx,
         CAST(min({col_y}) AS BIGINT) AS _mny, CAST(max({col_y}) AS BIGINT) AS _mxy
  FROM {table}
)
SELECT {out_cols},
  ({spread(nx)} | ({spread(ny)} << 1)) AS {out_col}
FROM {table}, b"""
