"""Phase-level profiling of the build_hashdb bench query (guide §1).

Breaks build() into its phases and times each separately over reps:
  words-count (bench setup, untimed by bench), dedup+fanout to noop,
  full sorted pipeline to noop (adds range shuffle + window dedup +
  sort), actual parquet write (adds zstd+bloom encode), sidecar
  (tree_size listing + JSON write), and the end-to-end build() the
  bench times.
"""

from __future__ import annotations

import os
import shutil
import statistics as st
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("PROFILE_REPS", "3"))


def main() -> None:
    from pyspark.sql import functions as F

    from shaha_spark.session import get_spark

    spark = get_spark(app_name="shaha-profile-build", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    from shaha_spark.pipeline.build import (
        build, dedup_words, hash_fanout, sort_for_write, write_hashdb,
        write_sidecar,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    words = (
        docs.select(F.posexplode(F.split("text", " ")).alias("pos", "w"), F.col("doc_id"))
        .filter(F.col("w") != "")
        .select(
            F.concat_ws("_", "w", F.col("doc_id").cast("string"), F.col("pos").cast("string")).alias("word")
        )
    )
    n = words.count()
    print(f"n_words={n}")
    tmp = tempfile.mkdtemp(prefix="shaha_profile_build_")

    def timed(label, fn):
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(f"{label:35s} med={st.median(ts):6.3f}  reps={[round(x,2) for x in ts]}")
        return st.median(ts)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    w = words.select(F.col("word").alias("word")).filter(F.length("word") > 0)

    timed("words scan+explode (noop)", lambda: noop(w))
    timed("dedup_words (noop)", lambda: noop(dedup_words(w)))
    timed(
        "dedup+fanout (noop)",
        lambda: noop(
            hash_fanout(dedup_words(w), ["sha256", "md5"]).withColumn(
                "sources", F.array(F.lit("bench"))
            )
        ),
    )
    timed(
        "dedup+fanout+sort_for_write (noop)",
        lambda: noop(
            sort_for_write(
                hash_fanout(dedup_words(w), ["sha256", "md5"]).withColumn(
                    "sources", F.array(F.lit("bench"))
                ),
                dedup=True,
            )
        ),
    )

    i = [0]

    def wr():
        p = os.path.join(tmp, f"wr{i[0]}")
        i[0] += 1
        write_hashdb(
            sort_for_write(
                hash_fanout(dedup_words(w), ["sha256", "md5"]).withColumn(
                    "sources", F.array(F.lit("bench"))
                ),
                dedup=True,
            ),
            p,
        )

    timed("... + parquet write", wr)

    def sc():
        write_sidecar(
            spark, os.path.join(tmp, "wr0"),
            total_records=n, algorithms=["sha256", "md5"],
            sources=["bench"], source_hashes=[],
        )

    timed("sidecar alone (tree_size+write)", sc)

    def full():
        p = os.path.join(tmp, f"db{i[0]}")
        i[0] += 1
        build(spark, words, ["sha256", "md5"], p, source_name="bench")

    timed("full build() e2e", full)

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
