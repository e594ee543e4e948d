"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the arbitrary-state API Spark offers where built-in
windowed aggregation can't express the semantics: per-key state lives
in the state store across micro-batches, updated by an Arrow-batched
Python function. The example operator maintains running per-key totals
(count + value sum) — the kernel a production pipeline would extend
with e.g. per-source ingestion quotas or dedup-seen sets.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n_events bigint, sum_value double"
STATE_SCHEMA = "n bigint, total double"


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"key": [key[0]], "n_events": [n], "sum_value": [total]})


def running_totals(events: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Emits one updated row per key per micro-batch (output mode
    'update'); state persists in the checkpointed state store, so
    totals accumulate across restarts exactly-once.
    """
    return events.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_ewma(
    events: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.25,
    horizon: int = 8,
) -> DataFrame:
    """Streaming twin of :func:`shaha_spark.operators.timeseries.ewma` —
    per-key time-decayed features computed online as events arrive.

    State per key is the ring of the last ``horizon + 1`` observed
    values (bounded regardless of stream length — the same truncation
    that makes the batch operator's arithmetic reproducible makes the
    streaming state O(K)). Each micro-batch sorts its rows by
    ``order_col``, extends the ring, and emits one
    (key, order, ewma) row per input row using the IDENTICAL
    precomputed weights, left-associated term order, and
    available-term denominators as the batch operator — so on the
    same inputs in the same order the streamed values are
    bit-identical to the batch backfill (pinned in
    tests/test_streaming.py).

    Ordering contract: rows are assumed to arrive in ``order_col``
    order ACROSS micro-batches (a monotone source, e.g. a log tail);
    within a batch they are sorted explicitly. Out-of-order arrivals
    across batches would need watermark-based resequencing upstream —
    out of scope for this operator, same as the batch twin's
    requirement that (order_col) be a total order.

    Rows with NULL values are dropped before the state update, exactly
    like the batch twin's pre-filter.
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
    keep = horizon + 1

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        hist: list[float] = list(state.get[0]) if state.exists else []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch[batch[value_col].notna()].sort_values(order_col)
        orders, outs = [], []
        for _, row in batch.iterrows():
            hist.append(float(row[value_col]))
            if len(hist) > keep:
                hist = hist[-keep:]
            # identical IEEE sequence to the batch operator: k=0..K
            # left-associated, absent lags contribute w_k * 0.0
            num = weights[0] * hist[-1]
            for k in range(1, horizon + 1):
                v = hist[-1 - k] if k < len(hist) else 0.0
                num = num + weights[k] * v
            outs.append(num / denoms[min(len(hist), keep) - 1])
            orders.append(row[order_col])
        state.update((hist,))
        if orders:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(orders),
                    "order_id": orders,
                    "ewma": outs,
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType="key bigint, order_id bigint, ewma double",
        stateStructType="vals array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
