"""Cache lifecycle for operators that persist() an intermediate.

Several operators pin a multi-consumer intermediate with ``persist()``
rather than ``localCheckpoint`` — under AQE even a lazy localCheckpoint
materializes the subtree's shuffle stages at DataFrame-CONSTRUCTION
time (getFinalPhysicalPlan runs the exchanges), violating the
no-work-at-plan-build contract, and the checkpoint boundary also
truncates rendered plans so the rescan lint goes blind above it
(ROUND9.md §7b). ``persist()`` keeps both properties — but the
InMemoryRelation it registers stays in the session CacheManager until
someone unpersists it, accumulating executor memory across calls and
letting plan-equal cached fragments substitute into unrelated later
plans (r9 ADVICE, basket.py).

This module is the release half of that contract: operators attach
their persisted intermediates to the DataFrame they return via
:func:`registers`, and callers that are done with the result (it has
been written/collected and will not be recomputed) call
:func:`release` to drop the cache entries. Results remain USABLE after
release — unpersist only removes the cache registration; the plan
recomputes from source on the next action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_shaha_persisted"


def registers(result: DataFrame, *persisted: DataFrame) -> DataFrame:
    """Attach the operator's persisted intermediates to its result so
    :func:`release` can unpersist them later. Returns ``result``.

    The registration lives as a Python attribute on THIS DataFrame
    object — any further transformation (``.select``/``.filter``/…)
    returns a NEW DataFrame without it, silently orphaning the cache
    entries (r10 ADVICE). Consume the returned DataFrame as-is and
    release it, or re-register after wrapping::

        wrapped = registers(result.select(...), *result._shaha_persisted)

    Harnesses that run MANY operators in one session (the bench, the
    correctness sweep) should also ``spark.catalog.clearCache()``
    between entries — orphaned or unreleased entries otherwise
    accumulate in the session CacheManager for the session's lifetime
    (tests/test_plan_lint.py does exactly this)."""
    existing = list(getattr(result, _ATTR, []))
    setattr(result, _ATTR, existing + list(persisted))
    return result


def release(result: DataFrame, blocking: bool = False) -> int:
    """Unpersist every intermediate registered on ``result`` (and
    clear the registration). Call once the result has been
    materialized (written or collected) and no further action will
    re-run its plan. Returns the number of cache entries dropped."""
    persisted = list(getattr(result, _ATTR, []))
    for df in persisted:
        df.unpersist(blocking)
    if persisted:
        setattr(result, _ATTR, [])
    return len(persisted)
