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

The small-cardinality linear-counting correction (m·ln(m/V)) IS
applied (round 4): without it the estimate at cardinalities ≪ m is
off by an order of magnitude (measured 190 vs 15 exact at p=8). The
``ln`` determinism concern (faithful-vs-correct rounding differs
across libms) is resolved the same way as every other transcendental
in the repo: the ln is rounded to 9 decimals in BOTH engines before
the final multiply, so the corrected estimate bit-matches wherever
the two libms agree to 9 decimals — the repo-wide recipe.
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


def _small_range_correct(raw, empties, m: int):
    """Standard HLL small-range correction: when the raw harmonic-mean
    estimate is ≤ 2.5·m and empty registers remain, switch to linear
    counting, ``m · ln(m / V)`` (V = empty-register count). Without it
    the raw estimate at cardinalities ≪ m is off by an order of
    magnitude (measured: 190 vs 15 exact at p=8). ln is rounded to 9
    decimals — the repo-wide transcendental determinism recipe — so
    both engines agree bit-for-bit.
    """
    return F.when(
        (raw <= F.lit(2.5 * m)) & (empties > 0),
        F.lit(float(m)) * F.round(F.log(F.lit(float(m)) / empties), 9),
    ).otherwise(raw)


#: raw HLL harmonic-mean estimate (alpha*m^2 / (S + empties)), shared
#: by both SQL twins so the corrected and raw forms stay in lockstep
_HLL_RAW_SQL = (
    "{a!r} / (SUM(1.0 / CAST((CAST(1 AS BIGINT) << reg) AS DOUBLE)) "
    "+ CAST({m} - count(*) AS DOUBLE))"
)


def _small_range_correct_sql(raw: str, empties: str, m: int) -> str:
    """DuckDB twin of :func:`_small_range_correct` (same literals, same
    rounded-ln recipe)."""
    return (
        f"CASE WHEN ({raw}) <= {2.5 * m!r} AND ({empties}) > 0 "
        f"THEN CAST({m} AS DOUBLE) * round(ln(CAST({m} AS DOUBLE) / ({empties})), 9) "
        f"ELSE ({raw}) END"
    )


def hll_distinct(
    df: DataFrame, col: str, p: int = 6, out_col: str = "hll_estimate"
) -> DataFrame:
    """One-row DataFrame with the HLL cardinality estimate of ``col``.

    ``p`` register-index bits → m = 2^p registers; standard error is
    ~1.04/sqrt(m) (13% at p=6, 3.3% at p=10). The 32-bit item hash is
    split into a bucket (low p bits) and a 32-p bit window whose
    leading-zero count (via the bit-length of its binary rendering —
    integer/string ops only, no log2 floats) yields the register rank.

    NULLs are excluded: a NULL item would form a (NULL, NULL) register
    row that count(*) counts but the 2^-reg sum skips, systematically
    inflating the estimate (and an all-NULL column would return NULL
    instead of ~0).
    """
    m = 1 << p
    w_bits = 32 - p
    df = df.where(F.col(col).isNotNull())
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
    raw = F.lit(_alpha_m2(m)) / (
        F.sum(term) + (F.lit(m) - F.count(F.lit(1))).cast("double")
    )
    empties = (F.lit(m) - F.count(F.lit(1))).cast("double")
    return registers.agg(
        _small_range_correct(raw, empties, m).alias(out_col),
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
  FROM {table} WHERE {col} IS NOT NULL
),
regs AS (
  SELECT bucket,
    max(CASE WHEN w = 0 THEN {w_bits + 1}
             ELSE {w_bits + 1} - length(bin(w)) END) AS reg
  FROM hashed GROUP BY bucket
)
SELECT {_small_range_correct_sql(_HLL_RAW_SQL.format(a=_alpha_m2(m), m=m), f"CAST({m} - count(*) AS DOUBLE)", m)} AS {out_col},
  count(*) AS n_registers
FROM regs"""


# ---------------------------------------------------------- count-min

def _cms_hash(item, salt: int, width: int):
    """Row hash for CMS depth ``salt``: md5 of the salted item, reduced
    to a column index. Same construction in :func:`cms_frequencies_sql`."""
    return h32(F.concat(F.lit(f"{salt}:"), item)) % F.lit(width)


def cms_frequencies(
    df: DataFrame,
    col: str,
    items: list[str],
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min frequency estimates (Cormode & Muthukrishnan 2005)
    for a literal list of probe ``items`` over ``df[col]``.

    Shape at scale: the sketch is a groupBy over at most
    ``depth * width`` cells — the shuffle after the map-side partial
    count carries a bounded number of rows per partition no matter how
    large the input, and partial sketches merge by cell-wise addition
    (the same property that makes CMS a streaming/distributed sketch).
    Probes join against the tiny cell table via broadcast.

    Determinism: integer counters, md5-derived cell indices, and a
    ``min`` over exact integers — bit-identical in any engine that can
    md5 (oracle twin below). Estimates only ever over-count.
    """
    item = F.col(col).cast("string")
    cells = (
        df.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(d).alias("row"),
                        _cms_hash(item, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ])
            ).alias("c")
        )
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = df.sparkSession
    probes = spark.createDataFrame([(it,) for it in items], "item string")
    probe_cells = probes.select(
        "item",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("row"),
                    _cms_hash(F.col("item"), d, width).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("c"),
    ).select("item", F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    return (
        probe_cells.join(F.broadcast(cells), ["row", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("n", F.lit(0))).cast("long").alias("cms_count"))
        .orderBy("item")
    )


def cms_frequencies_sql(
    table: str, col: str, items: list[str], depth: int = 4, width: int = 256
) -> str:
    """DuckDB oracle twin of :func:`cms_frequencies`."""

    def h(expr: str, d: int) -> str:
        salted = f"concat('{d}:', CAST({expr} AS VARCHAR))"
        return (
            f"CAST(concat('0x', substr(md5({salted}), 1, 8)) AS BIGINT) % {width}"
        )

    cell_rows = " UNION ALL ".join(
        f"SELECT {d} AS row, {h(col, d)} AS bucket FROM {table}"
        for d in range(depth)
    )
    probe_vals = ", ".join(f"('{it}')" for it in items)
    probe_rows = " UNION ALL ".join(
        f"SELECT item, {d} AS row, {h('item', d)} AS bucket FROM probes"
        for d in range(depth)
    )
    return f"""WITH cells0 AS ({cell_rows}),
cells AS (SELECT row, bucket, count(*) AS n FROM cells0 GROUP BY 1, 2),
probes (item) AS (VALUES {probe_vals}),
pc AS ({probe_rows})
SELECT pc.item,
  CAST(min(COALESCE(cells.n, 0)) AS BIGINT) AS cms_count
FROM pc LEFT JOIN cells ON pc.row = cells.row AND pc.bucket = cells.bucket
GROUP BY pc.item
ORDER BY pc.item"""


# ------------------------------------------------------------- bloom

#: Bits per bitmap word: 63, not 64 — DuckDB raises on 1::BIGINT << 63
#: (sign-bit overflow) where Spark wraps silently, so the portable
#: construction never shifts past bit 62.
BLOOM_WORD_BITS = 63


def _bloom_positions(item, k: int, m_bits: int) -> list:
    return [
        h32(F.concat(F.lit(f"b{i}:"), item)) % F.lit(m_bits) for i in range(k)
    ]


def bloom_membership(
    corpus: DataFrame,
    probes: DataFrame,
    col: str,
    probe_id: str,
    m_bits: int = 8192,
    k: int = 5,
) -> DataFrame:
    """Bloom-filter membership screen: for every probe row, whether its
    ``col`` value is *possibly* in ``corpus[col]`` (false positives at
    the usual bloom rate, never false negatives).

    The 100 TB use: incremental dedup admission — the bitmap is a few
    KB regardless of corpus size, so new-batch rows that are definitely
    novel skip the expensive join against the corpus entirely.

    Shape: corpus → k md5-derived bit positions per row → groupBy word
    index with a ``bit_or`` aggregate (map-side partial OR; the shuffle
    carries at most m/63 longs per partition) → tiny bitmap broadcast
    to the probe side; a probe is "maybe" iff all k bits are set
    (``bool_and`` over the k looked-up bits).
    """
    item_c = F.col(col).cast("string")
    set_bits = (
        corpus.select(
            F.explode(F.array(*_bloom_positions(item_c, k, m_bits))).alias("pos")
        )
        .select(
            (F.col("pos") / BLOOM_WORD_BITS).cast("long").alias("word_idx"),
            (F.col("pos") % BLOOM_WORD_BITS).alias("bit"),
        )
        .select("word_idx", F.expr("shiftleft(cast(1 as bigint), bit)").alias("m"))
        .groupBy("word_idx")
        .agg(F.bit_or("m").alias("word"))
    )
    probe_bits = probes.select(
        F.col(probe_id),
        F.col(col),
        F.posexplode(F.array(*_bloom_positions(item_c, k, m_bits))).alias(
            "i", "pos"
        ),
    ).select(
        probe_id,
        col,
        (F.col("pos") / BLOOM_WORD_BITS).cast("long").alias("word_idx"),
        F.expr(f"shiftleft(cast(1 as bigint), pos % {BLOOM_WORD_BITS})").alias("m"),
    )
    return (
        probe_bits.join(F.broadcast(set_bits), "word_idx", "left")
        .withColumn(
            "hit", F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("m")) != 0
        )
        .groupBy(probe_id, col)
        .agg(F.bool_and("hit").alias("maybe_in_corpus"))
    )


def bloom_membership_sql(
    corpus_sql: str,
    probes_sql: str,
    col: str,
    probe_id: str,
    m_bits: int = 8192,
    k: int = 5,
) -> str:
    """DuckDB oracle twin of :func:`bloom_membership`. ``corpus_sql``
    and ``probes_sql`` are full SELECTs producing the two inputs."""

    def pos(expr: str, i: int) -> str:
        salted = f"concat('b{i}:', CAST({expr} AS VARCHAR))"
        return (
            f"CAST(concat('0x', substr(md5({salted}), 1, 8)) AS BIGINT) % {m_bits}"
        )

    corpus_pos = " UNION ALL ".join(
        f"SELECT {pos(col, i)} AS pos FROM corpus" for i in range(k)
    )
    probe_pos = " UNION ALL ".join(
        f"SELECT {probe_id}, {col}, {pos(col, i)} AS pos FROM probes"
        for i in range(k)
    )
    w = BLOOM_WORD_BITS
    return f"""WITH corpus AS ({corpus_sql}),
probes AS ({probes_sql}),
cpos AS ({corpus_pos}),
bitmap AS (
  SELECT pos // {w} AS word_idx,
    bit_or(CAST(1 AS BIGINT) << CAST(pos % {w} AS INTEGER)) AS word
  FROM cpos GROUP BY 1
),
ppos AS ({probe_pos}),
looked AS (
  SELECT p.{probe_id}, p.{col},
    (COALESCE(b.word, 0) & (CAST(1 AS BIGINT) << CAST(p.pos % {w} AS INTEGER))) <> 0 AS hit
  FROM ppos p LEFT JOIN bitmap b ON p.pos // {w} = b.word_idx
)
SELECT {probe_id}, {col}, bool_and(hit) AS maybe_in_corpus
FROM looked GROUP BY 1, 2"""


def hll_group_distinct(
    df: DataFrame,
    group_col: str,
    col: str,
    p: int = 6,
    out_col: str = "hll_estimate",
) -> DataFrame:
    """Per-group HLL distinct estimates — :func:`hll_distinct` with the
    group key carried through both aggregations. The shuffle after the
    partial max carries at most ``m`` register rows per group, so
    estimating distincts for millions of groups costs one bounded
    hash-aggregate pass (the built-in exact countDistinct would
    shuffle every raw value). NULL items are excluded for the same
    register-corruption reason as :func:`hll_distinct`."""
    m = 1 << p
    w_bits = 32 - p
    df = df.where(F.col(col).isNotNull())
    h = h32(F.col(col).cast("string"))
    bucket = (h % m).alias("bucket")
    w = F.shiftright(h, p)
    rho = (
        F.when(w == 0, F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits + 1) - F.length(F.conv(w.cast("string"), 10, 2)))
        .alias("rho")
    )
    registers = (
        df.select(F.col(group_col), bucket, rho)
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").alias("reg"))
    )
    term = F.lit(1.0) / F.expr(
        "cast(shiftleft(cast(1 as bigint), reg) as double)"
    )
    return registers.groupBy(group_col).agg(
        _small_range_correct(
            F.lit(_alpha_m2(m))
            / (F.sum(term) + (F.lit(m) - F.count(F.lit(1))).cast("double")),
            (F.lit(m) - F.count(F.lit(1))).cast("double"),
            m,
        ).alias(out_col),
        F.count(F.lit(1)).alias("n_registers"),
    )


def hll_group_distinct_sql(
    table: str,
    group_col: str,
    col: str,
    p: int = 6,
    out_col: str = "hll_estimate",
) -> str:
    """DuckDB oracle twin of :func:`hll_group_distinct`."""
    m = 1 << p
    w_bits = 32 - p
    h = f"CAST(concat('0x', substr(md5(CAST({col} AS VARCHAR)), 1, 8)) AS BIGINT)"
    return f"""WITH hashed AS (
  SELECT {group_col}, {h} % {m} AS bucket,
    {h} >> {p} AS w
  FROM {table} WHERE {col} IS NOT NULL
),
regs AS (
  SELECT {group_col}, bucket,
    max(CASE WHEN w = 0 THEN {w_bits + 1}
             ELSE {w_bits + 1} - length(bin(w)) END) AS reg
  FROM hashed GROUP BY 1, 2
)
SELECT {group_col},
  {_small_range_correct_sql(_HLL_RAW_SQL.format(a=_alpha_m2(m), m=m), f"CAST({m} - count(*) AS DOUBLE)", m)} AS {out_col},
  count(*) AS n_registers
FROM regs GROUP BY {group_col}"""
