"""Distinct-count sketching: a deterministic HyperLogLog built from
relational primitives.

Why build HLL out of groupBy/max instead of ``approx_count_distinct``:
Spark's built-in sketch is engine-private (not reproducible elsewhere,
not oracle-checkable, changes across versions). This construction is
the textbook HLL (Flajolet et al. 2007) from a cross-engine-stable
md5-derived hash, so ANY engine that can md5 computes the identical
estimate — the same property the dedup family builds on.

Shape at scale: one hash-aggregate to per-bucket register maxima
(map-side partial max — the shuffle carries at most ``m`` rows per
partition regardless of input size), then a single tiny aggregation of
``m`` registers. This is exactly how a distributed HLL merge works:
partial registers combine by max, so the operator parallelizes without
ever moving raw values.

Determinism notes (why the estimate bit-matches across engines):

* register values are small integers from string-length arithmetic —
  no floating point;
* ``2^-M`` terms are computed as ``1.0 / (1 << M)`` — exact powers of
  two, and their sum stays an exact multiple of 2^-(2^p+1) well inside
  double's 53-bit mantissa, so the summation is exact in ANY order;
* the final estimate is one division of an exact literal by that exact
  sum.

The small-cardinality linear-counting correction (m·ln(m/V)) is
deliberately omitted: ``ln`` is only faithfully-rounded and would
break cross-engine equality. Callers with tiny cardinalities should
use exact countDistinct — the sketch is for the regime where exact is
too expensive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shaha_spark.functions.text import h32


def _alpha_m2(m: int) -> float:
    """alpha_m * m^2 as one Python float — injected as the SAME literal
    into both the Spark and oracle expressions."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m


def hll_distinct(
    df: DataFrame, col: str, p: int = 6, out_col: str = "hll_estimate"
) -> DataFrame:
    """One-row DataFrame with the HLL cardinality estimate of ``col``.

    ``p`` register-index bits → m = 2^p registers; standard error is
    ~1.04/sqrt(m) (13% at p=6, 3.3% at p=10). The 32-bit item hash is
    split into a bucket (low p bits) and a 32-p bit window whose
    leading-zero count (via the bit-length of its binary rendering —
    integer/string ops only, no log2 floats) yields the register rank.
    """
    m = 1 << p
    w_bits = 32 - p
    h = h32(F.col(col).cast("string"))
    bucket = (h % m).alias("bucket")
    w = F.shiftright(h, p)
    # bit-length via base-2 string length: conv() is codegen'd, exact,
    # and engine-portable (log2 floats misround at power-of-two edges)
    rho = (
        F.when(w == 0, F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits + 1) - F.length(F.conv(w.cast("string"), 10, 2)))
        .alias("rho")
    )
    registers = (
        df.select(bucket, rho)
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )
    # S = sum 2^-reg over all m buckets; absent buckets contribute 2^0
    # SQL expr: the Python shiftleft wrapper takes only literal counts
    term = F.lit(1.0) / F.expr(
        "cast(shiftleft(cast(1 as bigint), reg) as double)"
    )
    return registers.agg(
        (
            F.lit(_alpha_m2(m))
            / (F.sum(term) + (F.lit(m) - F.count(F.lit(1))).cast("double"))
        ).alias(out_col),
        F.count(F.lit(1)).alias("n_registers"),
    )


def hll_distinct_sql(
    table: str, col: str, p: int = 6, out_col: str = "hll_estimate"
) -> str:
    """DuckDB oracle twin of :func:`hll_distinct` — the identical hash
    split, register construction, and estimate arithmetic."""
    m = 1 << p
    w_bits = 32 - p
    h = f"CAST(concat('0x', substr(md5(CAST({col} AS VARCHAR)), 1, 8)) AS BIGINT)"
    return f"""WITH hashed AS (
  SELECT {h} % {m} AS bucket,
    {h} >> {p} AS w
  FROM {table}
),
regs AS (
  SELECT bucket,
    max(CASE WHEN w = 0 THEN {w_bits + 1}
             ELSE {w_bits + 1} - length(bin(w)) END) AS reg
  FROM hashed GROUP BY bucket
)
SELECT {_alpha_m2(m)!r} / (SUM(1.0 / CAST((CAST(1 AS BIGINT) << reg) AS DOUBLE))
    + CAST({m} - count(*) AS DOUBLE)) AS {out_col},
  count(*) AS n_registers
FROM regs"""
