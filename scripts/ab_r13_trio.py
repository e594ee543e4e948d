"""Interleaved A/B for the three r13 second-session rewrites, one warm
session, alternating reps so machine drift cancels (noop sink per guide
§1.4):

  * events_rollup_incremental — merge_rollup full-outer join vs
    union+re-aggregation
  * events_bootstrap_ci — four 28-bit conv() per digest vs two 56-bit
    conv() + shift/mask
  * dq_referential — one join+agg subtree per relation vs one pass per
    shared child

Legacy builders are the executable specs pinned in
tests/test_optimization_r13.py (imported from there — single source).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from pyspark.sql import functions as F

from shaha_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "7"))

spark = get_spark(app_name="ab-r13-trio", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry
from test_optimization_r13 import (
    _legacy_bootstrap_mean_ci,
    _legacy_merge_rollup,
    _legacy_referential_check,
)

_t = entry._t
_events = entry._events


def new_rollup():
    return entry.queries()["events_rollup_incremental"](spark, SF_DIR)


def old_rollup():
    from shaha_spark.operators.incremental import (
        finalize_rollup,
        rollup_increment,
    )

    ev = _events(spark, SF_DIR)
    state = rollup_increment(ev.where(F.col("event_id") % 3 == 0))
    for m in (1, 2):
        state = _legacy_merge_rollup(
            state, rollup_increment(ev.where(F.col("event_id") % 3 == m))
        )
    return finalize_rollup(state)


def new_boot():
    return entry.queries()["events_bootstrap_ci"](spark, SF_DIR)


def old_boot():
    return _legacy_bootstrap_mean_ci(
        _t(spark, SF_DIR, "events"), "value", "event_id"
    )


def _rels():
    return [
        ("orders->customer", _t(spark, SF_DIR, "orders"), "o_custkey",
         _t(spark, SF_DIR, "customer"), "c_custkey"),
        ("lineitem->orders", _t(spark, SF_DIR, "lineitem"), "l_orderkey",
         _t(spark, SF_DIR, "orders"), "o_orderkey"),
        ("lineitem->part", _t(spark, SF_DIR, "lineitem"), "l_partkey",
         _t(spark, SF_DIR, "part"), "p_partkey"),
        ("lineitem->supplier", _t(spark, SF_DIR, "lineitem"), "l_suppkey",
         _t(spark, SF_DIR, "supplier"), "s_suppkey"),
    ]


def new_dq():
    return entry.queries()["dq_referential"](spark, SF_DIR)


def old_dq():
    return _legacy_referential_check(_rels())


PAIRS = {
    "rollup_incremental": (old_rollup, new_rollup),
    "bootstrap_ci": (old_boot, new_boot),
    "dq_referential": (old_dq, new_dq),
}


def run(fn):
    t0 = time.perf_counter()
    df = fn()
    t_construct = time.perf_counter() - t0
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t_action = time.perf_counter() - t0
    spark.catalog.clearCache()
    return t_construct, t_action


for name, (old, new) in PAIRS.items():
    # result identity spot check first
    spark.sparkContext.setJobDescription(f"ab {name}: identity")
    k = lambda t: tuple((v is None, str(v)) for v in t)
    got = sorted((tuple(r) for r in new().collect()), key=k)
    want = sorted((tuple(r) for r in old().collect()), key=k)
    assert got == want, f"{name}: results differ!"
    olds, news = [], []
    run(old), run(new)  # warm both plans once
    for rep in range(REPS):
        spark.sparkContext.setJobDescription(f"ab {name}: old rep{rep}")
        olds.append(run(old))
        spark.sparkContext.setJobDescription(f"ab {name}: new rep{rep}")
        news.append(run(new))
    om_c = statistics.median(c for c, _ in olds)
    om_a = statistics.median(a for _, a in olds)
    nm_c = statistics.median(c for c, _ in news)
    nm_a = statistics.median(a for _, a in news)
    print(
        f"{name}: old construct {om_c:.3f} action {om_a:.3f} | "
        f"new construct {nm_c:.3f} action {nm_a:.3f} | "
        f"total {om_c + om_a:.3f} -> {nm_c + nm_a:.3f} "
        f"({(om_c + om_a) / (nm_c + nm_a):.2f}x)"
    )

spark.stop()
