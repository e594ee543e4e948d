"""Interleaved A/B: legacy window argmax vs shipped max(struct) argmax
for the assignment kernel, at a replicated corpus (one warm session,
alternating reps so machine drift cancels). Also verifies identical
output assignments.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from shaha_spark.operators.kmeans import kmeans_fit
from shaha_spark.operators.similarity import (
    cosine_sim_hoisted,
    dot,
    ivf_assign,
    norm2,
)
from shaha_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPL = int(os.environ.get("PROTO_REPL", "50"))
K = int(os.environ.get("PROTO_K", "16"))
REPS = int(os.environ.get("PROTO_REPS", "7"))

spark = get_spark(app_name="ab-argmax", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")

embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
corpus = (
    embs.crossJoin(F.broadcast(spark.range(REPL).select(F.col("id").alias("__r"))))
    .select((F.col("vec_id") * REPL + F.col("__r")).alias("vec_id"), "embedding")
    .repartition(32)
    .localCheckpoint(eager=True)
)
print(f"corpus rows: {corpus.count()}")
cents = kmeans_fit(embs, k=K, iters=1).localCheckpoint(eager=True)


def legacy_assign(corpus, centroids, vec_col="embedding", id_col="vec_id"):
    c = F.broadcast(
        centroids.select(
            "centroid_id", "centroid", norm2(F.col("centroid")).alias("__ctn2")
        )
    )
    scored = corpus.withColumn("__vn2", norm2(F.col(vec_col))).crossJoin(
        c
    ).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        cosine_sim_hoisted(
            dot(F.col(vec_col), F.col("centroid")),
            F.col("__vn2"),
            F.col("__ctn2"),
        ).alias("__sim"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .drop("__r", "__sim")
    )


ref = {(r[0], r[2]) for r in legacy_assign(corpus, cents).collect()}
new = {(r[0], r[2]) for r in ivf_assign(corpus, cents).collect()}
print(f"assignments identical: {ref == new} ({len(ref)} rows)")

old_t, new_t = [], []
for _ in range(REPS):
    t0 = time.perf_counter()
    legacy_assign(corpus, cents).write.format("noop").mode("overwrite").save()
    old_t.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    ivf_assign(corpus, cents).write.format("noop").mode("overwrite").save()
    new_t.append(time.perf_counter() - t0)

print(f"legacy window : median={statistics.median(old_t):.3f} {[round(t,2) for t in old_t]}")
print(f"max(struct)   : median={statistics.median(new_t):.3f} {[round(t,2) for t in new_t]}")

# kmeans_fit end-to-end on the replicated corpus (new path only; the
# legacy loop differs only in the assignment kernel measured above)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    kmeans_fit(corpus, k=K, iters=2).count()
    ts.append(time.perf_counter() - t0)
print(f"kmeans_fit k={K} iters=2: median={statistics.median(ts):.3f} {[round(t,2) for t in ts]}")
spark.stop()
