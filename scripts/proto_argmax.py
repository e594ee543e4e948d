"""Prototype A/B: per-vector argmax assignment forms (guide §2.3/§2.4).

Forms:
  window    — current: crossJoin(broadcast cents) + row_number window
  aggmax    — groupBy(id).agg(max(struct(sim, -cid, cid, vec)))
  arraymax  — one-row broadcast centroid array + array_max(transform)
              (zero shuffle: assignment is a pure projection)

Checks bit-identity of (id, centroid_id) and times each with a noop
sink at a replicated corpus size.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from shaha_spark.operators.similarity import cosine_sim_hoisted, dot, norm2
from shaha_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPL = int(os.environ.get("PROTO_REPL", "10"))
K = int(os.environ.get("PROTO_K", "16"))
REPS = int(os.environ.get("PROTO_REPS", "5"))

spark = get_spark(app_name="proto-argmax", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")

embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
# replicate corpus REPL x with distinct ids for measurable volume
corpus = (
    embs.crossJoin(F.broadcast(spark.range(REPL).select(F.col("id").alias("__r"))))
    .select(
        (F.col("vec_id") * REPL + F.col("__r")).alias("vec_id"), "embedding"
    )
    .repartition(32)
    .localCheckpoint(eager=True)
)
n = corpus.count()
print(f"corpus rows: {n}")

from shaha_spark.operators.kmeans import kmeans_fit

cents = kmeans_fit(embs, k=K, iters=1).localCheckpoint(eager=True)

c = F.broadcast(
    cents.select(
        "centroid_id", "centroid", norm2(F.col("centroid")).alias("__ctn2")
    )
)


def form_window():
    scored = corpus.withColumn("__vn2", norm2(F.col("embedding"))).crossJoin(
        c
    ).select(
        F.col("vec_id"),
        F.col("embedding"),
        F.col("centroid_id"),
        cosine_sim_hoisted(
            dot(F.col("embedding"), F.col("centroid")),
            F.col("__vn2"),
            F.col("__ctn2"),
        ).alias("__sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )


def form_aggmax():
    scored = corpus.withColumn("__vn2", norm2(F.col("embedding"))).crossJoin(
        c
    ).select(
        F.col("vec_id"),
        F.col("embedding"),
        F.col("centroid_id"),
        cosine_sim_hoisted(
            dot(F.col("embedding"), F.col("centroid")),
            F.col("__vn2"),
            F.col("__ctn2"),
        ).alias("__sim"),
    )
    best = scored.groupBy("vec_id").agg(
        F.max(
            F.struct(
                F.col("__sim").alias("s"),
                (-F.col("centroid_id")).alias("nc"),
                F.col("centroid_id").alias("cid"),
                F.col("embedding").alias("v"),
            )
        ).alias("__b")
    )
    return best.select(
        "vec_id",
        F.col("__b.v").alias("embedding"),
        F.col("__b.cid").alias("centroid_id"),
    )


def form_arraymax():
    carr = F.broadcast(
        cents.select(
            "centroid_id",
            "centroid",
            norm2(F.col("centroid")).alias("__ctn2"),
        )
        .select(
            F.struct("centroid_id", "centroid", "__ctn2").alias("__c")
        )
        .agg(F.array_sort(F.collect_list("__c")).alias("__cents"))
    )
    scored = corpus.crossJoin(carr).withColumn(
        "__vn2", norm2(F.col("embedding"))
    )
    best = F.array_max(
        F.transform(
            F.col("__cents"),
            lambda cc: F.struct(
                cosine_sim_hoisted(
                    dot(F.col("embedding"), cc["centroid"]),
                    F.col("__vn2"),
                    cc["__ctn2"],
                ).alias("s"),
                (-cc["centroid_id"]).alias("nc"),
                cc["centroid_id"].alias("cid"),
            ),
        )
    )
    return scored.select(
        "vec_id",
        "embedding",
        best["cid"].alias("centroid_id"),
    )


forms = {"window": form_window, "aggmax": form_aggmax, "arraymax": form_arraymax}

# identity check
ref = {(r[0], r[2]) for r in form_window().select("vec_id", "embedding", "centroid_id").collect()}
for name, fn in forms.items():
    got = {(r[0], r[2]) for r in fn().collect()}
    print(f"{name}: identical={got == ref} rows={len(got)}")

for name, fn in forms.items():
    ts = []
    for _ in range(REPS):
        df = fn()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    import statistics

    print(
        f"{name}: median={statistics.median(ts):.3f} reps={[round(t,2) for t in ts]}"
    )
    ex = fn()._jdf.queryExecution().executedPlan().toString()
    print(f"  exchanges={ex.count('Exchange')}")

spark.stop()
