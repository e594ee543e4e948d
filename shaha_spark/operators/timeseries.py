"""Time-series shaping operators: dense-grid gap fill with forward
fill, consecutive-event debounce, and SCD2 (slowly-changing-dimension
type 2) interval history derived from an event stream.

These complete the warehouse-side surface around the existing
sessionize / rolling / funnel / retention family: `gapfill` turns a
sparse event aggregate into the dense per-bucket series a dashboard or
model-feature job expects; `debounce` is the standard telemetry
de-noising step (drop repeats of the same key arriving within a
minimum gap); `scd2_intervals` reconstructs attribute validity
intervals — the classic dimension-history build — from raw change
events.

Scale shapes (all single-shuffle on the partition key):

- `gapfill`: one hash-agg to the bucket grain, a per-key min/max agg
  (tiny), a bounded `sequence` fan-out (keys x buckets — the output's
  own size), one equi-join back, and one per-key ordered window for
  the forward fill. No global sort; keys parallelize across the
  cluster.
- `debounce`: one shuffle + per-key sort, a single LAG — the same
  inherent cost as sessionization (cf. events_sessionize).
- `scd2_intervals`: two ordered windows over the same per-key sort
  (change flag + running segment id, then interval close via LEAD on
  the segment table, which is already orders of magnitude smaller than
  the input). Spark keeps both windows in one sort because they share
  the partition/order keys.

Determinism recipe (driver DuckDB-oracle exact): event ordering is
made total with an `(ts_us, event_id)` sort key; value sums go through
DECIMAL(18,2) so partial-aggregation order cannot perturb them; the
forward-filled column carries the decimal sum (not a float average),
cast to double only at the end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from shaha_spark.operators.profile import split_cast_double, split_cast_double_sql


def gapfill(
    events: DataFrame,
    key_col: str = "event_type",
    tus_col: str = "tus",
    value_col: str = "value",
) -> DataFrame:
    """Dense hourly series per key over each key's own [min, max] hour
    span: empty buckets appear with ``n_events = 0`` / ``sum_value =
    0.0``, and ``ffill_sum_value`` carries the last non-empty bucket's
    sum forward (last-observation-carried-forward).

    ``tus_col`` is an epoch-microsecond long (see
    :func:`shaha_spark.util.normalize_event_ts`).
    """
    hour = F.date_trunc("hour", F.timestamp_micros(F.col(tus_col)))
    hourly = events.groupBy(
        F.col(key_col), hour.alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sv"),
    )
    span = hourly.groupBy(key_col).agg(
        F.min("h").alias("hmin"), F.max("h").alias("hmax")
    )
    grid = span.select(
        key_col,
        F.explode(F.expr("sequence(hmin, hmax, interval 1 hour)")).alias("h"),
    )
    filled = grid.join(hourly, [key_col, "h"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        F.col(key_col),
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        split_cast_double(F.coalesce(F.col("sv"), F.lit(0)), 2).alias(
            "sum_value"
        ),
        split_cast_double(F.last("sv", ignorenulls=True).over(w), 2).alias(
            "ffill_sum_value"
        ),
    )


def gapfill_sql(table: str = "events") -> str:
    """DuckDB oracle twin of :func:`gapfill` (hourly, event_type key)."""
    return f"""WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n,
         SUM(CAST(value AS DECIMAL(18,2))) AS sv
  FROM {table} GROUP BY 1, 2
),
span AS (
  SELECT event_type, min(h) AS hmin, max(h) AS hmax FROM hourly GROUP BY 1
),
grid AS (
  SELECT event_type,
         unnest(generate_series(hmin, hmax, interval 1 hour)) AS h
  FROM span
),
j AS (
  SELECT g.event_type, g.h, hourly.n, hourly.sv
  FROM grid g LEFT JOIN hourly ON g.event_type = hourly.event_type AND g.h = hourly.h
)
SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
  CAST(coalesce(n, 0) AS BIGINT) AS n_events,
  {split_cast_double_sql("coalesce(sv, 0)", 2)} AS sum_value,
  {split_cast_double_sql('''last_value(sv IGNORE NULLS) OVER (
    PARTITION BY event_type ORDER BY h
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  )''', 2)} AS ffill_sum_value
FROM j"""


def debounce(
    events: DataFrame,
    key_cols: list[str] | None = None,
    tus_col: str = "tus",
    id_col: str = "event_id",
    min_gap_us: int = 60_000_000,
) -> DataFrame:
    """Drop events arriving within ``min_gap_us`` of the PREVIOUS event
    of the same key (consecutive-gap debounce, the LAG formulation —
    not "previous retained", which is inherently sequential). The
    `(ts, id)` sort key makes the order total, so simultaneous
    duplicates keep exactly the lowest id.
    """
    key_cols = key_cols or ["user_id", "event_type"]
    w = Window.partitionBy(*key_cols).orderBy(tus_col, id_col)
    prev = F.lag(tus_col).over(w)
    return (
        events.withColumn("__prev", prev)
        .where(F.col("__prev").isNull() | (F.col(tus_col) - F.col("__prev") >= min_gap_us))
        .drop("__prev")
    )


def debounce_sql(
    table: str = "events",
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    min_gap_us: int = 60_000_000,
) -> str:
    """DuckDB oracle twin of :func:`debounce` (projects id/keys/ts_us)."""
    keys = ", ".join(key_cols)
    return f"""WITH o AS (
  SELECT event_id, {keys}, epoch_us(ts) AS ts_us,
    lag(epoch_us(ts)) OVER (
      PARTITION BY {keys} ORDER BY epoch_us(ts), event_id
    ) AS prev
  FROM {table}
)
SELECT event_id, {keys}, ts_us FROM o
WHERE prev IS NULL OR ts_us - prev >= {min_gap_us}"""


def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    attr: Column | None = None,
    attr_name: str = "attr",
    tus_col: str = "tus",
    id_col: str = "event_id",
) -> DataFrame:
    """SCD type-2 history: per key, contiguous runs of an attribute
    value become validity intervals ``[valid_from_us, valid_to_us)``
    with ``valid_to_us`` NULL on the current (open) interval.

    ``attr`` is any deterministic column expression over the event row
    (default: ``CAST(get_json_object(props, '$.k') AS INT)``). Interval
    boundaries are epoch-microsecond longs so the comparison is exact.
    """
    if attr is None:
        attr = F.get_json_object(F.col("props"), "$.k").cast("int")
    w = Window.partitionBy(key_col).orderBy(tus_col, id_col)
    tagged = events.select(
        F.col(key_col), F.col(tus_col), F.col(id_col), attr.alias(attr_name)
    )
    prev = F.lag(attr_name).over(w)
    # eqNullSafe == SQL `IS NOT DISTINCT FROM`: the change flag agrees
    # with the oracle even if the attribute expression yields NULLs
    seg = (
        tagged.withColumn(
            "__chg",
            F.when(~prev.eqNullSafe(F.col(attr_name)), 1).otherwise(0),
        )
        .withColumn(
            "__seg",
            F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    grouped = seg.groupBy(key_col, "__seg").agg(
        F.min(attr_name).alias(attr_name),
        F.min(tus_col).alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    # simultaneous events with different attrs make consecutive
    # segments share a valid_from; the segment id (monotone in the
    # total event order) breaks the tie identically on both engines
    w2 = Window.partitionBy(key_col).orderBy("valid_from_us", "__seg")
    return grouped.select(
        F.col(key_col),
        F.col(attr_name),
        F.col("valid_from_us"),
        F.lead("valid_from_us").over(w2).alias("valid_to_us"),
        F.col("n_events"),
        F.lead("valid_from_us").over(w2).isNull().alias("is_current"),
    )


def scd2_sql(table: str = "events", key_col: str = "user_id") -> str:
    """DuckDB oracle twin of :func:`scd2_intervals` with the default
    ``props.k`` attribute."""
    return f"""WITH tagged AS (
  SELECT {key_col}, epoch_us(ts) AS tus, event_id,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS attr
  FROM {table}
),
seg AS (
  SELECT *, SUM(chg) OVER (
      PARTITION BY {key_col} ORDER BY tus, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg_id
  FROM (
    SELECT *, CASE WHEN lag(attr) OVER (
        PARTITION BY {key_col} ORDER BY tus, event_id) IS DISTINCT FROM attr
      THEN 1 ELSE 0 END AS chg
    FROM tagged
  )
),
grouped AS (
  SELECT {key_col}, seg_id, min(attr) AS attr,
         min(tus) AS valid_from_us, CAST(count(*) AS BIGINT) AS n_events
  FROM seg GROUP BY 1, 2
)
SELECT {key_col}, attr, valid_from_us,
  lead(valid_from_us) OVER (
    PARTITION BY {key_col} ORDER BY valid_from_us, seg_id) AS valid_to_us,
  n_events,
  lead(valid_from_us) OVER (
    PARTITION BY {key_col} ORDER BY valid_from_us, seg_id)
    IS NULL AS is_current
FROM grouped"""


def cdc_apply(
    changelog: DataFrame,
    key_cols: list[str],
    ts_col: str,
    op_col: str,
    value_cols: list[str],
    tie_col: str,
    delete_op: str = "delete",
) -> DataFrame:
    """Apply a CDC changelog to produce the current snapshot — the
    MERGE/upsert compaction every lakehouse table maintenance job runs:
    per key, the latest operation wins (ordered by ``ts_col`` then
    ``tie_col`` for a total order); if that operation is ``delete_op``
    the key disappears, otherwise its values form the current row.

    Complements scd2_intervals (which keeps the full history): this is
    the "type 1" current-state materialization, with delete semantics.

    One hash shuffle on the key, one per-key window argmax — no joins,
    no global sort. At 100 TB this runs per partition-dir of the
    changelog and unions with the untouched base snapshot (same
    slice-compaction manifest shape as pipeline/compact.py).
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), F.col(tie_col).desc()
    )
    return (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != F.lit(delete_op)))
        .select(
            *key_cols,
            F.col(ts_col).alias(f"last_{ts_col}"),
            F.col(op_col).alias("last_op"),
            *value_cols,
        )
    )


def cumulative_distinct(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
) -> DataFrame:
    """Running distinct count — "total unique users through day D" —
    without an expanding-window distinct (quadratic state): each key
    contributes once, at its FIRST bucket, so the running total is a
    prefix sum of first-appearance counts.

    Plan: one hash-agg to (key → min bucket), one hash-agg to
    (bucket → new keys), one ordered window over the BUCKET table —
    whose cardinality is the calendar, not the data, so the single
    global window is microscopic at any input size.
    """
    firsts = df.groupBy(key_col).agg(F.min(bucket_col).alias("__first"))
    per_bucket = firsts.groupBy(F.col("__first").alias(bucket_col)).agg(
        F.count(F.lit(1)).alias("new_keys")
    )
    w = (
        Window.orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_bucket.select(
        bucket_col,
        F.col("new_keys").cast("bigint").alias("new_keys"),
        F.sum("new_keys").over(w).cast("bigint").alias("cum_keys"),
    )


def mean_shift_points(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_us: int,
    min_points: int = 3,
    threshold: float = 10.0,
) -> DataFrame:
    """Change-point screen: rows where the mean of the NEXT
    ``window_us`` of values differs from the mean of the PREVIOUS
    window by more than ``threshold`` (both windows needing
    ``min_points`` samples) — the two-window mean-shift detector, the
    window-expressible member of the change-detection family (CUSUM's
    running max-recursion cannot be a window function; this screen is
    what you run distributed, then refine per flagged neighborhood).

    Both frames are RANGE windows over the SAME per-key time sort —
    one shuffle, one sort, like sessionize. Determinism: window sums
    accumulate 2-decimal-quantized values as exact decimals (the
    incremental-rollup recipe), counts are exact, each mean is one
    double division, and the shift is one subtraction — engine-exact.
    The before-frame excludes the current row; the after-frame includes
    it (every boundary row belongs to exactly one side).

    NULL values are excluded up front: the frame SUMs skip them but
    COUNT(*) would not, so a null-laced window would divide a partial
    sum by the full row count and report a fabricated mean.
    """
    df = df.where(F.col(value_col).isNotNull())
    v = F.col(value_col).cast("decimal(18,2)")
    # the range frame is in MICROSECONDS; a timestamp column cast to
    # long yields SECONDS, which would silently widen the frames 1e6×
    # (every window covers the whole series and real shifts vanish) —
    # so timestamps go through unix_micros explicitly
    ts_type = df.schema[ts_col].dataType.typeName()
    if ts_type in ("timestamp", "timestamp_ntz"):
        order_key = F.unix_micros(F.col(ts_col).cast("timestamp"))
    else:
        order_key = F.col(ts_col).cast("long")
    before = (
        Window.partitionBy(key_col)
        .orderBy(order_key)
        .rangeBetween(-window_us, -1)
    )
    after = (
        Window.partitionBy(key_col)
        .orderBy(order_key)
        .rangeBetween(0, window_us - 1)
    )
    framed = df.select(
        F.col(key_col),
        F.col(ts_col),
        F.sum(v).over(before).alias("__sb"),
        F.count(F.lit(1)).over(before).alias("__nb"),
        F.sum(v).over(after).alias("__sa"),
        F.count(F.lit(1)).over(after).alias("__na"),
    )
    mb = F.col("__sb").cast("double") / F.col("__nb").cast("double")
    ma = F.col("__sa").cast("double") / F.col("__na").cast("double")
    return (
        framed.where(
            (F.col("__nb") >= min_points) & (F.col("__na") >= min_points)
        )
        .select(
            key_col,
            ts_col,
            F.round(mb, 9).alias("mean_before"),
            F.round(ma, 9).alias("mean_after"),
            F.round(ma - mb, 9).alias("shift"),
        )
        .where(F.abs(F.col("shift")) > F.lit(float(threshold)))
    )


def interval_union_length(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping/adjacent [start, end) intervals per key and
    report coverage — one row per key
    [n_intervals, n_merged, covered_us] — the "total active time"
    computation where naive SUM(end-start) double-counts overlaps.

    Classic sweep as windows: order intervals by (start, end); an
    interval OPENS a new merged segment iff its start exceeds the
    running max end of everything before it (frame ending at -1 row —
    incremental, the nearest_join lesson); the running count of opens
    is the segment id; each merged segment contributes
    max(end) − min(start). Two windows on one per-key sort + one
    segment agg — sessionize cost, never an interval self-join.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    seg = df.select(
        F.col(key_col),
        F.col(start_col).cast("long").alias("__s"),
        F.col(end_col).cast("long").alias("__e"),
        F.sum(opens)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__seg"),
    )
    merged = seg.groupBy(key_col, "__seg").agg(
        F.min("__s").alias("__ms"),
        F.max("__e").alias("__me"),
        F.count(F.lit(1)).alias("__n"),
    )
    return merged.groupBy(key_col).agg(
        F.sum("__n").cast("bigint").alias("n_intervals"),
        F.count(F.lit(1)).cast("bigint").alias("n_merged"),
        F.sum(F.col("__me") - F.col("__ms")).cast("bigint").alias("covered_us"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Kaplan-Meier survival curve: S(t) = Π_{t_i ≤ t} (1 − d_i/n_i)
    over distinct event times, with right-censoring — time-to-churn /
    time-to-failure estimation under incomplete observation
    (``event_col`` = 1 observed, 0 censored at ``duration_col``).

    Distributed shape: one hash-agg to (time → deaths, exits), one
    suffix-sum window over the DISTINCT-TIME table for the at-risk
    counts (bounded by distinct durations, not rows — the
    cumulative_distinct trick), one running product. The product is
    computed as exp of a prefix sum of per-time rounded ln factors
    (decimal-exact sums — the unigram-logprob recipe), so the curve is
    engine-deterministic; times with deaths only appear in the output.
    """
    g = [group_col] if group_col else []
    per_t = df.groupBy(
        *g, F.col(duration_col).cast("long").alias("t")
    ).agg(
        F.sum(F.when(F.col(event_col).cast("int") == 1, 1).otherwise(0)).alias(
            "d"
        ),
        F.count(F.lit(1)).alias("exits"),
    )
    # suffix sum (at-risk = everyone exiting at or after t) expressed
    # as total − prefix-before-current: prefix frames update
    # incrementally, while ANY [current, unbounded following] frame
    # re-aggregates per row (the nearest_join O(n²) lesson — it is the
    # frame type, not the function, that drives Spark's strategy)
    w_before = (
        Window.partitionBy(*g)
        .orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    total = F.sum("exits").over(
        Window.partitionBy(*g) if g else Window.partitionBy()
    )
    at_risk = per_t.withColumn(
        "n",
        total - F.coalesce(F.sum("exits").over(w_before), F.lit(0)),
    )
    # a time where everyone at risk dies sends the curve exactly to 0;
    # ln(0) is not a number either engine should touch — flag it and
    # emit 0.0 downstream of that point instead
    lnf = F.when(
        F.col("d") < F.col("n"),
        F.round(
            F.log(
                (F.col("n").cast("double") - F.col("d"))
                / F.col("n").cast("double")
            ),
            9,
        ),
    ).otherwise(F.lit(0.0)).cast("decimal(19,9)")
    w_run = (
        Window.partitionBy(*g)
        .orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = (
        at_risk.withColumn("__dead", F.when(F.col("d") == F.col("n"), 1).otherwise(0))
        .withColumn("__lnf", lnf)
        .withColumn("__lns", F.sum("__lnf").over(w_run))
        .withColumn("__killed", F.max("__dead").over(w_run))
        .where(F.col("d") > 0)
    )
    return curve.select(
        *g,
        F.col("t"),
        F.col("d").cast("bigint").alias("deaths"),
        F.col("n").cast("bigint").alias("at_risk"),
        F.when(F.col("__killed") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("__lns").cast("double")), 6))
        .alias("survival"),
    )


def ewma(
    df: DataFrame,
    series_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
    horizon: int = 8,
    out_col: str = "ewma",
) -> DataFrame:
    """Finite-horizon exponentially-weighted moving average per series —
    the time-decayed feature backfill (pandas ``ewm(adjust=True)``
    semantics truncated at ``horizon`` lags):

        y_t = Σ_{k=0..min(t,K)} c_k·x_{t-k} / Σ_{k=0..min(t,K)} c_k,
        c_k = α·(1−α)^k.

    Reference parity: none (the reference has no time-series surface);
    extension-layer operator, same family as gapfill/scd2 above.

    Determinism: the recursive EWMA would accumulate floating error in
    engine-specific order; here every weight c_k AND every partial
    denominator Σc_0..c_i is a PYTHON-PRECOMPUTED double literal
    (bit-identical constants in both engines), the numerator is a fixed
    left-associated chain of K+1 fused lag terms, and the denominator is
    one literal-array element_at — so both engines replay the identical
    IEEE op sequence. Truncation at K lags is what makes per-row cost
    bounded AND the arithmetic exactly reproducible; with
    (1−α)^(K+1) ≤ 1e-3-ish the truncated tail is statistically
    negligible (choose horizon accordingly).

    Scale: ONE window pass per series partition computes all K lags
    (Spark evaluates same-window functions together); series_cols must
    be data-proportional (users, docs), same rule as autocorr. Rows
    with NULL values are excluded BEFORE windowing so lag distances
    count observed points only and the available-term count equals
    row_number.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if horizon < 0:
        raise ValueError(f"horizon must be >= 0, got {horizon}")
    weights = [alpha * (1.0 - alpha) ** k for k in range(horizon + 1)]
    denoms = []
    acc = 0.0
    for c in weights:
        acc += c
        denoms.append(acc)
    w = Window.partitionBy(*series_cols).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    filtered = df.where(F.col(value_col).isNotNull())
    num = F.lit(weights[0]) * F.col(value_col).cast("double")
    for k in range(1, horizon + 1):
        num = num + F.lit(weights[k]) * F.coalesce(
            F.lag(F.col(value_col).cast("double"), k).over(w), F.lit(0.0)
        )
    n_avail = F.least(F.row_number().over(w), F.lit(horizon + 1))
    denom = F.element_at(F.array(*[F.lit(d) for d in denoms]), n_avail)
    return filtered.withColumn(out_col, num / denom)


def ewma_sql(
    table: str,
    series_cols: list[str],
    order_by: str,
    value_col: str,
    alpha: float = 0.5,
    horizon: int = 8,
    out_col: str = "ewma",
    select: str = "*",
) -> str:
    """DuckDB oracle twin of :func:`ewma` — identical precomputed
    literals (full-precision repr), identical left-associated term
    order, identical 1-based literal-list denominator lookup.

    FMA barrier: DuckDB's expression executor CONTRACTS a ``w·x + acc``
    chain into fused multiply-adds (one rounding instead of two), which
    diverges from Spark's JVM-spec strict arithmetic in the last ULP —
    observed on every row with all K+1 terms live. Each product is
    therefore materialized as its own column in the windowed CTE and
    only plain column ADDS remain in the outer projection; the window
    operator between the two projections is a hard optimizer boundary,
    so the products can never be re-inlined into the add chain.

    The default ``select='*'`` excludes the internal ``__t0..__tK`` /
    ``__den`` helper columns (DuckDB ``* EXCLUDE``), so the twin's
    column set matches the Spark operator's without callers having to
    enumerate a select list (r8 ADVICE)."""
    weights = [alpha * (1.0 - alpha) ** k for k in range(horizon + 1)]
    denoms = []
    acc = 0.0
    for c in weights:
        acc += c
        denoms.append(acc)
    part = ", ".join(series_cols)
    over = f"OVER (PARTITION BY {part} ORDER BY {order_by})"

    # String-parse every float literal: a bare decimal literal is typed
    # DECIMAL, and both hazards bite — the division routes through
    # DECIMAL, and literals whose unscaled digits exceed 2^53 (any
    # 16-17-significant-digit repr, e.g. the accumulated denominators)
    # take DuckDB's double-rounding DECIMAL->DOUBLE cast and land one
    # ULP off the Python/Spark double. CAST('…' AS DOUBLE) is a direct
    # correctly-rounded strtod, which round-trips repr exactly.
    def _dlit(v: float) -> str:
        return f"CAST('{v!r}' AS DOUBLE)"

    tcols = [f"{_dlit(weights[0])} * CAST({value_col} AS DOUBLE) AS __t0"]
    for k in range(1, horizon + 1):
        tcols.append(
            f"{_dlit(weights[k])} * coalesce("
            f"lag(CAST({value_col} AS DOUBLE), {k}) {over}, 0.0) AS __t{k}"
        )
    tcols_sql = ",\n    ".join(tcols)
    addchain = " + ".join(f"__t{k}" for k in range(horizon + 1))
    dlist = "[" + ", ".join(_dlit(d) for d in denoms) + "]"
    if select == "*":
        helpers = ", ".join(
            [f"__t{k}" for k in range(horizon + 1)] + ["__den"]
        )
        select = f"* EXCLUDE ({helpers})"
    return f"""WITH s AS (
  SELECT *, {tcols_sql},
    {dlist}[LEAST(row_number() {over}, {horizon + 1})] AS __den
  FROM {table} WHERE {value_col} IS NOT NULL
)
SELECT {select}, ({addchain}) / __den AS {out_col} FROM s"""


def rolling_quantile(
    df: DataFrame,
    series_cols: list[str],
    order_cols: list[str],
    value_col: str,
    q: float = 0.5,
    window_rows: int = 7,
    out_col: str = "rq",
) -> DataFrame:
    """Exact rolling discrete quantile per series: for each row, the
    type-1 quantile (inverse ECDF — DuckDB's ``quantile_disc``
    convention, 1-based rank ``max(1, ceil(q·n))``) of the value over
    the trailing ``window_rows`` observed rows, itself included.

    The rolling-median/percentile feature is the robust sibling of
    :func:`ewma` — outlier-insensitive smoothing and the basis of
    rolling-MAD anomaly bands. Reference parity: none (no time-series
    surface in the reference); extension-layer, same family as ewma.

    Scale shape: identical to ewma — ONE window pass per series
    partition (series_cols must be data-proportional), bounded
    per-row cost: the frame holds at most ``window_rows`` values, so
    the collect+sort is O(W log W) per row with W a SMALL CONSTANT
    (this is NOT the unbounded-frame collect_list anti-pattern; the
    rows-frame bound is what licenses it, exactly like ewma's K lags).
    No join, no second shuffle.

    Determinism: the result is a data ELEMENT, not arithmetic — the
    frame's values are sorted (doubles: total order over the frame
    because both NULL and NaN are filtered out — NaN is NOT NULL and
    would otherwise pass ``isNotNull`` into the frame, leaving the
    cross-engine claim resting on unstated NaN-sort conventions; r9
    ADVICE) and the element at the exact integer rank is returned;
    the only float op is the single multiply inside ``ceil(q·n)``,
    the same two operands in both engines. Rows with NULL or NaN
    values are excluded BEFORE windowing (rank statistics of observed
    values) — which also matches the streaming twin, whose pandas
    ``notna()`` pre-filter always dropped NaN.
    """
    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0, 1), got {q}")
    if window_rows < 1:
        raise ValueError(f"window_rows must be >= 1, got {window_rows}")
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    filtered = df.where(
        F.col(value_col).isNotNull()
        & ~F.isnan(F.col(value_col).cast("double"))
    )
    vals = F.sort_array(
        F.collect_list(F.col(value_col).cast("double")).over(w)
    )
    n = F.size(vals)
    rank = F.greatest(
        F.lit(1),
        F.ceil(F.lit(float(q)) * n.cast("double")).cast("int"),
    )
    return filtered.withColumn(out_col, F.element_at(vals, rank))


def rolling_quantile_sql(
    table: str,
    series_cols: list[str],
    order_by: str,
    value_col: str,
    q: float = 0.5,
    window_rows: int = 7,
    out_col: str = "rq",
    select: str = "*",
) -> str:
    """DuckDB oracle twin of :func:`rolling_quantile` — the same
    trailing rows frame, the same explicit list-sort + 1-based
    ``max(1, ceil(q·n))`` element selection (NOT the engine's windowed
    ``quantile_disc``, whose internal rank arithmetic is unspecified),
    the same NULL+NaN pre-filter, and the same ``CAST('repr' AS
    DOUBLE)`` q literal so the single float multiply sees identical
    operands."""
    part = ", ".join(series_cols)
    over = (
        f"OVER (PARTITION BY {part} ORDER BY {order_by} "
        f"ROWS BETWEEN {window_rows - 1} PRECEDING AND CURRENT ROW)"
    )
    lst = f"list_sort(list(CAST({value_col} AS DOUBLE)) {over})"
    rank = (
        f"CAST(greatest(1, ceil(CAST('{float(q)!r}' AS DOUBLE) * "
        f"CAST(len({lst}) AS DOUBLE))) AS BIGINT)"
    )
    return f"""SELECT {select}, ({lst})[{rank}] AS {out_col}
FROM {table}
WHERE {value_col} IS NOT NULL AND NOT isnan(CAST({value_col} AS DOUBLE))"""


def seasonal_profile(
    df: DataFrame,
    tus_col: str,
    value_col: str,
) -> DataFrame:
    """Day-of-week × hour-of-day seasonal profile: per calendar cell,
    the observation count, the decimal-exact mean value, and the
    seasonal index (cell mean / grand mean — >1 means the cell runs
    hot). The one-pass seasonal-decomposition readout behind load
    forecasting, anomaly baselines ("is Tuesday 3am supposed to be
    this quiet?"), and crawl scheduling.

    Calendar arithmetic is PURE INTEGER on the epoch-microsecond
    column — ``dow = (tus div 86400e6 + 4) % 7`` (epoch day 0 was a
    Thursday; 0 = Sunday to match both engines' dayofweek-free
    convention here) and ``hod = (tus div 3600e6) % 24`` — identical
    in both engines and independent of any session timezone or date
    library (UTC by construction).

    Scale: ONE data-proportional hash aggregation (map-side partials)
    to at most 168 cells; the grand totals come from a window over
    those ≤168 rows — the fact table is scanned exactly once and
    nothing bigger than the calendar grid is ever re-shuffled.
    Determinism: exact decimal sums; mean and index go through
    split_cast_double and a fixed 9-decimal-rounded IEEE op sequence.
    """
    from shaha_spark.operators.profile import split_cast_double

    f = df.where(F.col(value_col).isNotNull())
    cells = (
        f.select(
            F.expr(f"(({tus_col} div 86400000000) + 4) % 7").alias("dow"),
            F.expr(f"({tus_col} div 3600000000) % 24").alias("hod"),
            F.col(value_col),
        )
        .groupBy("dow", "hod")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.round(F.col(value_col), 6).cast("decimal(28,6)")
            ).alias("__s"),
        )
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    with_tot = cells.select(
        "dow",
        "hod",
        "n",
        "__s",
        F.sum("n").over(w_all).alias("__gn"),
        F.sum("__s").over(w_all).alias("__gs"),
    )
    cell_mean = split_cast_double(F.col("__s"), 6) / F.col("n").cast("double")
    grand_mean = split_cast_double(F.col("__gs"), 6) / F.col("__gn").cast(
        "double"
    )
    return with_tot.select(
        "dow",
        "hod",
        "n",
        F.round(cell_mean, 9).alias("mean_value"),
        F.round(cell_mean / grand_mean, 9).alias("seasonal_index"),
    )


def seasonal_profile_sql(
    table: str,
    tus_expr: str,
    value_col: str,
) -> str:
    """DuckDB oracle twin of :func:`seasonal_profile` — the same
    integer calendar arithmetic (`//` matches Spark's ``div`` on the
    non-negative epoch domain), the same decimal sums, the same
    split-cast + single-division + round-9 IEEE sequence for mean and
    index."""
    from shaha_spark.operators.profile import split_cast_double_sql

    cm = f"({split_cast_double_sql('s', 6)} / CAST(n AS DOUBLE))"
    gm = f"({split_cast_double_sql('gs', 6)} / CAST(gn AS DOUBLE))"
    return f"""WITH cells AS (
  SELECT (({tus_expr}) // 86400000000 + 4) % 7 AS dow,
         (({tus_expr}) // 3600000000) % 24 AS hod,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(round({value_col}, 6) AS DECIMAL(28,6))) AS s
  FROM {table} WHERE {value_col} IS NOT NULL
  GROUP BY 1, 2
),
tot AS (
  SELECT dow, hod, n, s,
         CAST(SUM(n) OVER () AS BIGINT) AS gn,
         CAST(SUM(s) OVER () AS DECIMAL(38,6)) AS gs
  FROM cells
)
SELECT dow, hod, n,
  round({cm}, 9) AS mean_value,
  round({cm} / {gm}, 9) AS seasonal_index
FROM tot"""
