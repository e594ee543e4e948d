"""Registry-wide measurement sweep (optimization guide §1): for every
``queries()`` entry at a small SF, record

  * construct seconds — ``qs[name](spark, sf_dir)`` wall time (driver-
    side plan building, py4j chatter, any in-plan training jobs);
  * action seconds — noop-sink write of a FRESH plan (guide §1.4);
  * Exchange count and Python-eval node count from
    ``explain('formatted')``.

Writes one JSON file ranked by construct+action. Methodology matches
the r12 first-leg sweep (OPTIMIZATION_r12.md §"Second measurement
pass"); rerunnable for before/after comparisons.

Usage: python scripts/sweep_registry.py out.json [sf_dir] [only,names]
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep.json"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None


def main() -> None:
    from shaha_spark.session import get_spark

    import __spark_entry__ as entry

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="shaha-sweep", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    rows = {}
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        spark.sparkContext.setJobDescription(f"sweep construct: {name}")
        t0 = time.perf_counter()
        try:
            df = fn(spark, SF_DIR)
        except Exception as e:  # noqa: BLE001 — record and move on
            rows[name] = {"err": f"construct: {e}"[:200]}
            spark.catalog.clearCache()
            continue
        construct = time.perf_counter() - t0

        buf = io.StringIO()
        try:
            with redirect_stdout(buf):
                df.explain("formatted")
        except Exception as e:  # noqa: BLE001
            buf.write(f"explain failed: {e}")
        plan = buf.getvalue()
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        n_py = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas", plan)
        )

        spark.sparkContext.setJobDescription(f"sweep action: {name}")
        t0 = time.perf_counter()
        try:
            # fresh plan so shuffle reuse from the explain/construct
            # phase can't hide the action cost
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            rows[name] = {
                "construct": round(construct, 3),
                "err": f"action: {e}"[:200],
            }
            spark.catalog.clearCache()
            continue
        action = time.perf_counter() - t0
        rows[name] = {
            "construct": round(construct, 3),
            "action": round(action, 3),
            "total": round(construct + action, 3),
            "exchanges": n_exchange,
            "py_nodes": n_py,
        }
        spark.catalog.clearCache()
        print(
            f"{name}: construct={construct:.2f} action={action:.2f} "
            f"ex={n_exchange} py={n_py}",
            file=sys.stderr,
        )

    ranked = dict(
        sorted(rows.items(), key=lambda kv: -(kv[1].get("total") or 0))
    )
    with open(OUT, "w") as fh:
        json.dump(
            {"sf_dir": SF_DIR, "n": len(ranked), "rows": ranked}, fh, indent=1
        )
    total = sum(v.get("total") or 0 for v in rows.values())
    print(f"TOTAL construct+action: {total:.1f} s over {len(rows)} entries")
    spark.stop()


if __name__ == "__main__":
    main()
