"""Dump explain('formatted') for named registry entries to plans/<round>/.

Usage: python scripts/dump_plans.py <tag> <name> [name ...]
Writes plans/$SHAHA_PLANS_ROUND/<name>_<tag>.txt (default round: r13)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from shaha_spark.session import get_spark

    import __spark_entry__ as entry

    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name="shaha-plans", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SHAHA_PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(txt)
        print(f"{name}: exchanges={txt.count('Exchange')} -> {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
