"""Time-series joins the DataFrame API lacks as primitives: as-of join
and interval (range) join, both shaped for the 100 TB case.

The reference engine has no time-series join surface; these belong to
the training-data-pipeline extension set (event logs, feature
backfills, session attribution).

As-of join — "for each left row, the most recent right row at or
before it, per key" — is NOT expressed as a join at all: a join on
``l.t >= r.t`` explodes quadratically per key before a window would
prune it. Instead both sides are union-tagged and a single
``last(..., ignorenulls)`` running window per key resolves every left
row in one shuffle, one sort, zero joins — the plan scales linearly in
rows regardless of how many right rows precede each left row.

Interval join uses the bucket trick: every interval [start, end) with
``end - start <= W`` overlaps at most two width-W buckets, so
exploding intervals to their covered buckets and equi-joining events on
(key, bucket) bounds the candidate set per event by the true overlap
degree plus one bucket's worth — never O(n_left × n_right). The
equi-join is an ordinary shuffle/broadcast hash join Catalyst can
optimize; the exact range predicate refines candidates afterwards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_latest(
    df: DataFrame, key_cols: list[str], tie_col: str
) -> DataFrame:
    """One row per key, keeping the arg-max of ``tie_col`` — the
    deterministic tiebreak both the Spark and oracle sides share.

    Rows tying on (key, tie_col) are further ordered by every
    remaining column (as a struct): without the full-row tiebreak,
    row_number would keep whichever tied row the shuffle delivered
    first — nondeterministic across runs and engines, exactly what
    this helper exists to prevent."""
    rest = [
        c for c in df.columns if c not in key_cols and c != tie_col
    ]
    order = [F.col(tie_col).desc()]
    if rest:
        order.append(F.struct(*[F.col(c) for c in rest]).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    time_col: str,
    right_value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: attach to each left row the right row with the
    greatest ``time_col`` <= the left row's, within ``key_col``.

    ``right`` must be unique per (key, time) — pre-apply
    :func:`dedup_keep_latest` otherwise. Matched columns come from ONE
    right row (packed in a struct before the window, so per-column
    ``last(ignorenulls)`` can never mix rows whose own fields are null).

    Plan: union both sides → one hash shuffle on ``key_col`` → one sort
    by (time, side) → running ``last`` — linear at any key density, and
    an equal-timestamp right row sorts before the left row so the match
    is inclusive.

    Right rows with a NULL ``time_col`` are dropped: NULL sorts first,
    so the running last would otherwise hand their payload to every
    left row with no genuine predecessor — a match at asof_time=NULL
    that ``right.time <= left.time`` semantics can never produce. A
    left row with NULL time matches nothing (its window prefix is
    empty of real right rows).
    """
    right = right.where(F.col(time_col).isNotNull())
    lcols = [c for c in left.columns]
    payload = F.struct(
        F.col(time_col).alias(f"{prefix}{time_col}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_value_cols],
    )
    r_tagged = right.select(
        F.col(key_col),
        F.col(time_col),
        F.lit(0).alias("_side"),
        payload.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    l_tagged = left.select(
        F.col(key_col),
        F.col(time_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_r"].dataType).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(time_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out_cols: list[Column] = [F.col(f"_l_{c}").alias(c) for c in lcols]
    out_cols.append(F.col(f"_m.{prefix}{time_col}").alias(f"{prefix}{time_col}"))
    out_cols.extend(
        F.col(f"_m.{prefix}{c}").alias(f"{prefix}{c}") for c in right_value_cols
    )
    return matched.select(*out_cols)


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    key_col: str,
    time_col: str,
    start_col: str = "start_us",
    end_col: str = "end_us",
    max_len: int | None = None,
) -> DataFrame:
    """Join events to half-open intervals [start, end) per key without a
    quadratic range join.

    ``max_len`` is the EXPECTED maximum interval length (same unit as
    ``time_col``); it is the bucket width W, so a conforming interval
    covers at most two buckets and the candidate equi-join on
    (key, bucket) stays linear. Returns events ⨝ intervals rows (all
    columns of both sides); aggregate afterwards as needed.

    Intervals LONGER than ``max_len`` remain correct: each interval
    explodes to every bucket it overlaps (``sequence(start DIV W,
    (end-1) DIV W)``), not just its first and last — an over-long
    interval costs extra candidate rows instead of silently losing
    every match in its middle buckets.
    """
    if max_len is None:
        raise ValueError("interval_join requires max_len (the bucket width)")
    w = int(max_len)
    # integer DIV, not `/`: double division truncation can misplace a
    # boundary timestamp by one bucket at large epoch values
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} DIV {w}"),
                F.expr(f"({end_col} - 1) DIV {w}"),
            )
        ),
    )
    ev = events.withColumn("_bucket", F.expr(f"{time_col} DIV {w}"))
    joined = ev.join(iv, on=[key_col, "_bucket"]).filter(
        (F.col(time_col) >= F.col(start_col)) & (F.col(time_col) < F.col(end_col))
    )
    return joined.drop("_bucket")


def point_in_time_join(
    facts: DataFrame,
    dim_history: DataFrame,
    key_col: str,
    time_col: str,
    attr_cols: list[str],
    valid_from_col: str = "valid_from_us",
    valid_to_col: str = "valid_to_us",
    prefix: str = "pit_",
) -> DataFrame:
    """Point-in-time (temporal) join: attach to each fact row the
    dimension attributes valid AT ITS TIMESTAMP — ``valid_from <= t``
    and (``valid_to`` NULL or ``t < valid_to``) — the correct way to
    join an SCD2 history (see
    :func:`shaha_spark.operators.timeseries.scd2_intervals`) without
    leaking future attribute values into training features.

    NOT an interval range join: the history's ``valid_from`` rows are
    as-of anchors, so the whole match is :func:`asof_join`'s
    union + running-last window — one shuffle, one sort, zero joins,
    linear in rows. The ``valid_to`` refinement afterwards only
    matters for GAPPED histories (a tiling SCD2 output never triggers
    it); an expired match nulls out exactly like SQL's failed left
    join.
    """
    right = dim_history.select(
        F.col(key_col),
        F.col(valid_from_col).alias(time_col),
        F.col(valid_to_col),
        *[F.col(c) for c in attr_cols],
    )
    out = asof_join(
        facts, right, key_col, time_col, [valid_to_col, *attr_cols], prefix
    )
    vt = F.col(f"{prefix}{valid_to_col}")
    live = vt.isNull() | (F.col(time_col) < vt)
    keep = [F.col(c) for c in facts.columns]
    keep.append(
        F.when(live, F.col(f"{prefix}{time_col}")).alias(f"{prefix}{valid_from_col}")
    )
    keep.extend(
        F.when(live, F.col(f"{prefix}{c}")).alias(f"{prefix}{c}")
        for c in attr_cols
    )
    return out.select(*keep)


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    time_col: str,
    tolerance: int,
    right_value_cols: list[str],
    prefix: str = "near_",
    order_col: str | None = None,
) -> DataFrame:
    """Nearest-event join: attach to each left row the right row whose
    ``time_col`` is CLOSEST (either direction) within ``tolerance``,
    per ``key_col``; ties between an equally-near earlier and later
    right row resolve to the earlier one. Left rows with no right row
    in tolerance are dropped.

    Same zero-join construction as :func:`asof_join`, run in both
    directions over ONE union: tag sides, one hash shuffle on the key,
    one sort by (time, side, order), then a backward running
    ``last(ignorenulls)`` gives the at-or-before candidate and a
    forward running ``first(ignorenulls)`` gives the strictly-after
    candidate (an equal-time right row sorts before the left row, so
    it is exactly the backward match — never double-counted). Linear
    in rows per key at any density; no range join ever materializes.

    ``order_col`` breaks ordering ties among same-timestamp rows
    deterministically (defaults to the first right value column).
    Numeric (or numeric-string) order columns sort numerically —
    matching the oracle recipe; any other type falls back to a
    deterministic hash order via try_cast + xxhash64, instead of the
    ANSI-mode cast error a hard bigint cast would raise on e.g. a
    status string.

    Right rows with a NULL ``time_col`` are dropped (same argument as
    :func:`asof_join`: NULL sorts first and would pollute the running
    backward candidate with a match no distance can be computed to).
    The match-distance column is ``{prefix}delta`` — prefixed like
    every other attached column, so it cannot collide with a left
    column named ``delta``.
    """
    right = right.where(F.col(time_col).isNotNull())

    def _ord_of(col):
        return F.coalesce(
            F.expr(f"try_cast(cast({col} as string) as bigint)"),
            F.xxhash64(F.col(col).cast("string")),
        )

    ocol = order_col or right_value_cols[0]
    lcols = list(left.columns)
    payload = F.struct(
        F.col(time_col).alias(f"{prefix}{time_col}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_value_cols],
    )
    r_tagged = right.select(
        F.col(key_col),
        F.col(time_col),
        F.lit(0).alias("_side"),
        _ord_of(ocol).alias("_ord"),
        payload.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    l_tagged = left.select(
        F.col(key_col),
        F.col(time_col),
        F.lit(1).alias("_side"),
        _ord_of(ocol if ocol in left.columns else lcols[0]).alias("_ord"),
        F.lit(None).cast(r_tagged.schema["_r"].dataType).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    both = l_tagged.unionByName(r_tagged)
    wb = (
        Window.partitionBy(key_col)
        .orderBy(time_col, "_side", "_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the forward pass runs as a RUNNING window over the REVERSED sort
    # order, not first(...) over [current, unbounded following]: Spark
    # evaluates unbounded-FOLLOWING frames by rescanning to partition
    # end for every row — O(n²) per key (measured 57× blowup on a 10%
    # hot key in test_skew) — while frames ending at CURRENT ROW update
    # incrementally. The sort keys are a strict total order, so the
    # descending window visits exactly the ascending-forward row set.
    wf_rev = (
        Window.partitionBy(key_col)
        .orderBy(
            F.col(time_col).desc(), F.col("_side").desc(), F.col("_ord").desc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.col(time_col)
    prev = F.last("_r", ignorenulls=True).over(wb)
    nxt = F.last("_r", ignorenulls=True).over(wf_rev)
    resolved = (
        both.withColumn("_prev", prev)
        .withColumn("_next", nxt)
        .filter(F.col("_side") == 1)
    )
    d_prev = t - F.col(f"_prev.{prefix}{time_col}")
    d_next = F.col(f"_next.{prefix}{time_col}") - t
    use_prev = F.col("_prev").isNotNull() & (
        F.col("_next").isNull() | (d_prev <= d_next)
    )
    chosen = F.when(use_prev, F.col("_prev")).otherwise(F.col("_next"))
    delta = F.when(use_prev, d_prev).otherwise(d_next)
    out_cols = [F.col(f"_l_{c}").alias(c) for c in lcols]
    out_cols.append(F.col(f"_chosen.{prefix}{time_col}").alias(f"{prefix}{time_col}"))
    out_cols.extend(
        F.col(f"_chosen.{prefix}{c}").alias(f"{prefix}{c}")
        for c in right_value_cols
    )
    out_cols.append(F.col("_delta").cast("bigint").alias(f"{prefix}delta"))
    return (
        resolved.withColumn("_chosen", chosen)
        .withColumn("_delta", delta)
        .filter(F.col("_chosen").isNotNull() & (F.col("_delta") <= tolerance))
        .select(*out_cols)
    )
