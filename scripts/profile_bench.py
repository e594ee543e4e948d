"""Per-query profiling for the optimization round (guide §1).

For every headline bench query: DataFrame-construction time (Python +
analysis), the bench's own action time, and a noop-sink time (computes
every column, excludes collect/driver cost), over N reps. Also dumps
explain('formatted') to plans/r12/<name>_before.txt (or _after.txt with
PROFILE_TAG=after) and counts Exchange / BatchEvalPython nodes.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python scripts/profile_bench.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("PROFILE_REPS", "3"))
TAG = os.environ.get("PROFILE_TAG", "before")

BENCH_QUERIES = [
    "tpch_q1", "tpch_q3", "tpch_q5", "events_salted_agg",
    "events_sessionize", "dedup_minhash_pairs", "dedup_simhash",
    "similarity_topk", "text_quality", "dedup_exact",
]


def main() -> None:
    from pyspark.sql import functions as F

    from shaha_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="shaha-profile", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    only = sys.argv[1:]
    names = only or BENCH_QUERIES
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(plans_dir, exist_ok=True)

    actions = {
        "tpch_q1": lambda df: df.collect(),
        "tpch_q3": lambda df: df.collect(),
        "tpch_q5": lambda df: df.collect(),
        "events_salted_agg": lambda df: df.collect(),
        "events_sessionize": lambda df: df.count(),
        "dedup_minhash_pairs": lambda df: df.count(),
        "dedup_simhash": lambda df: df.count(),
        "similarity_topk": lambda df: df.collect(),
        "text_quality": lambda df: df.count(),
        "dedup_exact": lambda df: df.count(),
    }

    # warm codegen same as bench.py
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs_small = docs.limit(50)
    from shaha_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures, simhash

    lsh_candidate_pairs(minhash_signatures(docs_small)).count()
    simhash(docs_small).count()

    print(f"{'query':25s} {'construct':>9s} {'action':>8s} {'noop':>8s}  exch  pyeval")
    for name in names:
        fn = qs.get(name) or getattr(entry, f"q_{name}", None)
        if fn is None:
            print(f"{name}: NOT FOUND"); continue
        act = actions.get(name, lambda df: df.count())
        cts, ats, nts = [], [], []
        plan_txt = ""
        for rep in range(REPS):
            spark.sparkContext.setJobDescription(f"profile:{name}:rep{rep}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            cts.append(time.perf_counter() - t0)
            if rep == 0:
                plan_txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            t0 = time.perf_counter()
            act(df)
            ats.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            # noop sink on a FRESH plan (avoid shuffle reuse)
            df2 = fn(spark, SF_DIR)
            t0 = time.perf_counter()
            df2.write.format("noop").mode("overwrite").save()
            nts.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        n_exch = plan_txt.count("Exchange")
        n_py = plan_txt.count("EvalPython") + plan_txt.count("MapInPandas") + plan_txt.count("MapInArrow")
        with open(os.path.join(plans_dir, f"{name}_{TAG}.txt"), "w") as fh:
            fh.write(plan_txt)
        import statistics as st
        print(
            f"{name:25s} {st.median(cts):9.3f} {st.median(ats):8.3f} "
            f"{st.median(nts):8.3f}  {n_exch:4d}  {n_py:5d}"
            f"   reps_action={[round(x,2) for x in ats]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
