"""Warm-median timing for registry entries: one session, N reps of
construct + noop action per entry (fresh plan each rep), median of the
warm reps (2..N). Usage:

  python scripts/warm_entries.py sf_dir entry[,entry...] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from shaha_spark.session import get_spark

    import __spark_entry__ as entry

    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="shaha-warm", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in names:
        cts, ats = [], []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"warm:{name}:{i}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            cts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ats.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(
            f"{name}: construct_warm={statistics.median(cts[1:]):.3f} "
            f"action_warm={statistics.median(ats[1:]):.3f} "
            f"c={[round(t, 2) for t in cts]} a={[round(t, 2) for t in ats]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
