"""Stateful streaming debounce: keep an event only if at least
``min_gap_us`` has passed since the last KEPT event of the same key.

This is the sequential "previous retained" rule — stricter than the
LAG formulation in :mod:`shaha_spark.operators.timeseries` (there, a
burst a…b…c with 40 s gaps keeps a and c; here only a, because b was
dropped and c is still within the gap of a). The rule is inherently
sequential per key, which SQL windows cannot express — exactly the
case for `applyInPandasWithState`: per-key last-kept timestamp lives
in the checkpointed state store, batches arrive Arrow-vectorized, and
the scan inside a batch is a tight single pass.

Scale: state is ONE long per key, the minimum possible; keys shard
across the cluster by the stream's groupBy. The batch twin
:func:`debounce_retained_batch` runs the same kernel under
`applyInPandas` for backfills, so stream and batch agree exactly —
asserted differentially in tests/test_streaming_debounce.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, ts_us bigint"
)
STATE_SCHEMA = "last_kept bigint"


def _kept_mask(pdf: pd.DataFrame, last_kept: int | None, min_gap_us: int):
    """Single sequential pass over a (ts_us, event_id)-sorted frame;
    returns (boolean keep-mask, new last_kept)."""
    keep = []
    for t in pdf["ts_us"]:
        t = int(t)
        if last_kept is None or t - last_kept >= min_gap_us:
            keep.append(True)
            last_kept = t
        else:
            keep.append(False)
    return keep, last_kept


def _make_update(min_gap_us: int):
    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state,  # GroupState
    ) -> Iterator[pd.DataFrame]:
        last_kept = state.get[0] if state.exists else None
        # CONCAT before sorting: a group larger than the Arrow batch
        # size arrives as multiple chunks in arbitrary order, and a
        # per-chunk sort would feed the sequential kernel events out of
        # global time order — silently diverging from the batch twin
        whole = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts_us", "event_id"], kind="mergesort"
        )
        keep, last_kept = _kept_mask(whole, last_kept, min_gap_us)
        out = whole.loc[keep, ["event_id", "user_id", "event_type", "ts_us"]]
        if len(out):
            yield out
        if last_kept is not None:
            state.update((int(last_kept),))

    return _update


def stream_debounce(
    events: DataFrame,
    min_gap_us: int = 60_000_000,
) -> DataFrame:
    """Streaming previous-retained debounce over micro-batches.

    ``events`` needs columns (event_id, user_id, event_type, ts_us);
    keys are (user_id, event_type). Within a micro-batch events are
    processed in (ts_us, event_id) order; across batches the state
    store carries the last kept timestamp, so a restart resumes
    exactly where it left off.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _make_update(min_gap_us),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def debounce_retained_batch(
    events: DataFrame,
    min_gap_us: int = 60_000_000,
) -> DataFrame:
    """Batch twin: the same sequential kernel per (user_id, event_type)
    group via `applyInPandas` — for backfills and for differential
    tests against the stream. One shuffle on the key; the per-group
    pass is linear."""

    def _per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
        keep, _ = _kept_mask(pdf, None, min_gap_us)
        return pdf.loc[keep, ["event_id", "user_id", "event_type", "ts_us"]]

    return events.groupBy("user_id", "event_type").applyInPandas(
        _per_group, schema=OUTPUT_SCHEMA
    )
