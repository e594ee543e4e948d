"""Partitioning-invariance sweep: every registered query is bit-identical
under deliberately different partitioning regimes.

The 100 TB claim behind every operator in this repo is that results do
not depend on HOW the data happens to be split: a 1000-executor cluster
re-partitions scans by HDFS block, AQE re-coalesces shuffles at runtime,
and speculative execution reorders partial aggregation — none of which
may change a single output bit. The cross-engine oracle suite
(test_oracle.py) already implies order-invariance for the oracled
queries (DuckDB's single-threaded evaluation order shares nothing with
Spark's); this sweep enforces the same property *within* Spark,
mechanically, for the whole registry:

  regime A: many tiny scan splits (64 KiB), 3 shuffle partitions,
            AQE partition coalescing OFF (the 3 stay 3);
  regime B: the suite default (128 MiB splits, 32 shuffle partitions,
            AQE coalescing on).

Any query whose floats are summed as raw doubles (order-sensitive), or
whose sampling/init depends on partition boundaries, fails here even if
it happens to match DuckDB under one particular partitioning. The
decimal-exact aggregation discipline (round-to-scale -> DECIMAL sum) is
what makes this pass; see SCALE.md.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest

import __spark_entry__ as entry_mod
from test_oracle import _sorted_rows

QUERIES = entry_mod.queries()

# Many splits, few reducers, no runtime re-coalescing: the partitioning
# a small cluster under memory pressure would pick.
REGIME_A = {
    "spark.sql.shuffle.partitions": "3",
    "spark.sql.files.maxPartitionBytes": str(64 * 1024),
    "spark.sql.files.openCostInBytes": "0",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}

# Few big splits, many reducers, AQE coalescing on: the wide-cluster
# shape (and the suite/driver default).
REGIME_B = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.files.openCostInBytes": str(4 * 1024 * 1024),
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
}


# slow tier (pytest.ini): the full-registry invariance sweep is ~4.5 min of the default lane's budget; run via `make test-slow` (VERDICT r12 #2)
pytestmark = pytest.mark.slow


@contextmanager
def _conf(spark, overrides):
    old = {}
    for k in overrides:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _run(spark, sf_dir, name, regime):
    with _conf(spark, regime):
        sdf = QUERIES[name](spark, sf_dir)
        cols = sdf.columns
        rows = [tuple(r) for r in sdf.collect()]
    return _sorted_rows(rows, cols), cols


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_partitioning_invariant(spark, sf_dir, name):
    rows_a, cols_a = _run(spark, sf_dir, name, REGIME_A)
    rows_b, cols_b = _run(spark, sf_dir, name, REGIME_B)
    assert cols_a == cols_b
    assert len(rows_a) == len(rows_b), (
        f"{name}: {len(rows_a)} rows under regime A vs {len(rows_b)} under B"
    )
    mismatches = [(a, b) for a, b in zip(rows_a, rows_b) if a != b]
    assert not mismatches, (
        f"{name}: partitioning-sensitive values; first diffs {mismatches[:3]}"
    )
