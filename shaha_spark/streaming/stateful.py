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

    Output columns are ``key`` / ``order_id`` / ``ewma``; the key and
    order field TYPES are taken from the input schema, so string user
    keys or timestamp order columns work the same as bigints.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if horizon < 0:
        raise ValueError(f"horizon must be >= 0, got {horizon}")
    import numpy as np
    from pyspark.sql.types import (
        ArrayType, DoubleType, StructField, StructType,
    )

    weights = [alpha * (1.0 - alpha) ** k for k in range(horizon + 1)]
    denoms = []
    acc = 0.0
    for c in weights:
        acc += c
        denoms.append(acc)
    keep = horizon + 1
    den_by_count = np.asarray(denoms, dtype=np.float64)
    w = [np.float64(c) for c in weights]

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        prev: list[float] = list(state.get[0]) if state.exists else []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch[batch[value_col].notna()].sort_values(order_col)
        vals = batch[value_col].to_numpy(dtype=np.float64)
        m = len(vals)
        if m:
            # Shifted-column formulation, bit-identical to the scalar
            # loop: row i's lag-k value is full[K + n_prev + i - k] in
            # the zero-left-padded history (absent lags are the same
            # w_k * 0.0 terms), and the k=0..K accumulation below is
            # elementwise float64, preserving the left-associated IEEE
            # sequence per row.
            n_prev = len(prev)
            full = np.concatenate(
                [np.zeros(horizon, dtype=np.float64), prev, vals]
            )
            base = horizon + n_prev
            num = w[0] * full[base : base + m]
            for k in range(1, horizon + 1):
                num = num + w[k] * full[base - k : base - k + m]
            counts = np.minimum(n_prev + np.arange(1, m + 1), keep)
            out = num / den_by_count[counts - 1]
        hist = [float(v) for v in np.concatenate([prev, vals])[-keep:]]
        state.update((hist,))
        if m:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * m,
                    "order_id": batch[order_col].to_numpy(),
                    "ewma": out,
                }
            )

    out_type = StructType(
        [
            StructField("key", events.schema[key_col].dataType),
            StructField("order_id", events.schema[order_col].dataType),
            StructField("ewma", DoubleType()),
        ]
    )
    state_type = StructType(
        [StructField("vals", ArrayType(DoubleType()))]
    )
    return events.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=out_type,
        stateStructType=state_type,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_rolling_quantile(
    events: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
    q: float = 0.5,
    window_rows: int = 7,
) -> DataFrame:
    """Streaming twin of
    :func:`shaha_spark.operators.timeseries.rolling_quantile` — the
    per-key trailing-window type-1 quantile computed online.

    State per key is the ring of the last ``window_rows - 1`` observed
    values (bounded regardless of stream length — the rows-frame bound
    that makes the batch operator cheap makes the streaming state
    O(W)). Each micro-batch sorts its rows by ``order_col``, prepends
    the ring, and emits one (key, order, rq) row per input row using
    the IDENTICAL rank convention — 1-based ``max(1, ceil(q·n))`` over
    the sorted frame, a data ELEMENT, so batch/stream equality is
    exact by construction; the only float op is the same single
    multiply. Pinned bit-identical across micro-batch and checkpoint
    boundaries in tests/test_streaming.py.

    Same ordering contract and NULL pre-filter as :func:`stream_ewma`;
    key/order output field types are taken from the input schema.

    Execution shape: the steady-state rows vectorize as a
    numpy sliding-window sort (m × W per key-batch); only a key's
    first ``window_rows - 1`` LIFETIME rows take the short-frame path.
    """
    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0, 1), got {q}")
    if window_rows < 1:
        raise ValueError(f"window_rows must be >= 1, got {window_rows}")
    import math

    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view
    from pyspark.sql.types import (
        ArrayType, DoubleType, StructField, StructType,
    )

    keep = window_rows - 1
    # rank index per possible frame length (1..W), precomputed once:
    # the same ceil(q*n) double multiply the batch operator runs
    rank_ix = np.asarray(
        [max(1, math.ceil(q * float(n))) - 1 for n in range(1, window_rows + 1)],
        dtype=np.int64,
    )

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        prev: list[float] = list(state.get[0]) if state.exists else []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch[batch[value_col].notna()].sort_values(order_col)
        vals = batch[value_col].to_numpy(dtype=np.float64)
        m = len(vals)
        if m:
            n_prev = len(prev)
            full = np.concatenate([np.asarray(prev, dtype=np.float64), vals])
            counts = np.minimum(n_prev + np.arange(1, m + 1), window_rows)
            out = np.empty(m, dtype=np.float64)
            warm = max(0, min(m, window_rows - 1 - n_prev))
            for i in range(warm):  # a key's first W-1 lifetime rows only
                frame = np.sort(full[: n_prev + i + 1])
                out[i] = frame[rank_ix[counts[i] - 1]]
            if warm < m:
                frames = sliding_window_view(full, window_rows)[
                    n_prev + warm - (window_rows - 1) :
                ]
                out[warm:] = np.sort(frames, axis=1)[
                    :, rank_ix[window_rows - 1]
                ]
        combined = np.concatenate([np.asarray(prev, dtype=np.float64), vals])
        hist = [float(v) for v in combined[-keep:]] if keep else []
        state.update((hist,))
        if m:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * m,
                    "order_id": batch[order_col].to_numpy(),
                    "rq": out,
                }
            )

    out_type = StructType(
        [
            StructField("key", events.schema[key_col].dataType),
            StructField("order_id", events.schema[order_col].dataType),
            StructField("rq", DoubleType()),
        ]
    )
    state_type = StructType([StructField("vals", ArrayType(DoubleType()))])
    return events.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=out_type,
        stateStructType=state_type,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
