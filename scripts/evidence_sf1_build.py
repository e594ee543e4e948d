"""VERDICT r12 item 8 evidence: at sf1 the hashdb build's sort+write
leg splits into MULTIPLE range partitions — each one a parallel
sort+write task producing one part-file — so the single-task sort seen
at sf0.1 is the 128 MB-file-sizing floor, not a scaling defect.

One warm session: build sf0.1 words and sf1 words (scripts/make_sf1.py
replication, same generator the bench's sf1 gate uses), record build
seconds, output part-file count (== sort/write task count: the
within-partition sort and the parquet write run in the same stage, one
task per range partition), and bytes.
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from pyspark.sql import functions as F

from shaha_spark.pipeline.build import build
from shaha_spark.session import get_spark

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(
    app_name="evidence-sf1-build",
    master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
)
spark.sparkContext.setLogLevel("ERROR")


def words_of(sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(
            F.posexplode(F.split("text", " ")).alias("pos", "w"),
            F.col("doc_id"),
        )
        .filter(F.col("w") != "")
        .select(
            F.concat_ws(
                "_", "w", F.col("doc_id").cast("string"),
                F.col("pos").cast("string"),
            ).alias("word")
        )
    )


def one(tag, sf_dir, tmp):
    w = words_of(sf_dir)
    n = w.count()
    db = os.path.join(tmp, f"db_{tag}")
    spark.sparkContext.setJobDescription(f"evidence build {tag}")
    t0 = time.perf_counter()
    build(spark, w, ["sha256", "md5"], db, source_name=tag)
    dt = time.perf_counter() - t0
    parts = sorted(glob.glob(os.path.join(db, "**", "part-*.parquet"), recursive=True))
    sizes = [os.path.getsize(p) for p in parts]
    print(
        f"{tag}: words={n} build={dt:.2f}s part_files={len(parts)} "
        f"(== parallel sort+write tasks) "
        f"sizes_mb={[round(s / 1048576, 1) for s in sizes]}"
    )
    return n, dt


with tempfile.TemporaryDirectory() as tmp:
    from make_sf1 import make_sf1

    sf1_dir = make_sf1(os.path.join(tmp, "sf1"), k=10, src=SF01)
    n01, t01 = one("sf0.1", SF01, tmp)
    n1, t1 = one("sf1", sf1_dir, tmp)
    print(
        f"slope: {n1 / n01:.1f}x words -> {t1 / t01:.2f}x build seconds "
        f"(sublinear == fixed costs amortize; parallel sort engaged at sf1)"
    )

spark.stop()
