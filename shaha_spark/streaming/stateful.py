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
