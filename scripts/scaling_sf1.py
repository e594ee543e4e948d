"""VERDICT r12 item 4 evidence: 8-vs-32-core scaling at sf1 (the
bench's sf0.1 tables are single-file/single-row-group — read-only, so
scans are single-task there regardless of cores; sf1 inputs built by
scripts/make_sf1.py are 10x the volume and exercise the size-derived
ensure_parallelism targets).

Usage: python scripts/scaling_sf1.py <cores> <sf1_dir>
Prints per-query medians (noop sink, 3 warm reps after 1 discard).
Run alternately at 8 and 32 cores so machine drift cancels.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shaha_spark.session import get_spark

CORES = sys.argv[1]
SF1 = sys.argv[2]
QUERIES = [
    "tpch_q5", "events_sessionize", "dedup_simhash", "text_quality",
    "dedup_minhash_pairs",
]

spark = get_spark(app_name=f"scaling-sf1-{CORES}", master=f"local[{CORES}]")
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry

qs = entry.queries()
out = {}
for name in QUERIES:
    reps = []
    for rep in range(4):
        spark.sparkContext.setJobDescription(f"scaling {name} c{CORES} r{rep}")
        t0 = time.perf_counter()
        qs[name](spark, SF1).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if rep:  # discard the cold rep (janino compile)
            reps.append(dt)
        spark.catalog.clearCache()
    out[name] = round(statistics.median(reps), 3)
print(f"cores={CORES} sf1 medians: {out}")
spark.stop()
