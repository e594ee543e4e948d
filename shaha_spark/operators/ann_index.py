"""Persistent IVF index: write-time centroid assignment, read-time
partition-pruned probing.

The in-plan IVF operators (operators/similarity.py ivf_topk) derive
the assignment inside every query, which is right for the oracle gate
but wrong for production: at 100 TB you pay the k-means scan once at
ingest, store each vector under its coarse bucket, and every query
touches only the nprobe/k fraction of the data — AT THE SCAN LAYER,
not as a post-read filter. This module is that write path:

* :func:`build_ivf_index` fits the deterministic k-means
  (operators/kmeans.py), assigns vectors (broadcast argmax,
  shuffle-free), and writes the corpus ``partitionBy(centroid_id)``
  with a driver-side JSON centroid sidecar (k · d floats — model-
  sized, the same materialization budget as the k-means loop itself).
* :func:`ivf_index_topk` probes: per-query top-``nprobe`` centroids
  (k-row broadcast), then reads the index with a STATIC
  ``centroid_id IN (...)`` predicate built from the union of probed
  buckets — at most k values — so Spark's partition pruning skips
  every unprobed directory before any file is opened
  (``PartitionFilters`` in the plan; asserted in tests). Candidates
  then join the (query → bucket) probe table so each query scores
  only ITS buckets, and exact cosine re-ranks.

Same determinism recipe as the rest of the ANN family: deterministic
k-means, (sim DESC, id ASC) tiebreaks everywhere, cosine rounded to 6
— the index round trip returns bit-identical results to the in-plan
``ivf_topk`` under the same parameters, which is exactly what the
tests assert.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io_util
from .kmeans import kmeans_fit
from .similarity import cosine_sim, cosine_sim_hoisted, dot, ivf_assign, norm2

CENTROID_SIDECAR = "_ivf_centroids.json"


def build_ivf_index(
    df: DataFrame,
    path: str,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict[str, Any]:
    """Fit, assign, and write the bucketed index; returns a summary."""
    spark = df.sparkSession
    cents = kmeans_fit(df, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
    cent_rows = [
        {"centroid_id": int(r.centroid_id), "centroid": [float(x) for x in r.centroid]}
        for r in cents.collect()
    ]
    assigned = ivf_assign(df, cents, vec_col=vec_col, id_col=id_col)
    (
        assigned.write.mode("overwrite")
        .option("compression", "zstd")
        .partitionBy("centroid_id")
        .parquet(path)
    )
    io_util.write_text(
        spark,
        path.rstrip("/") + "/" + CENTROID_SIDECAR,
        json.dumps(cent_rows, sort_keys=True),
    )
    return {
        "path": path,
        "k": len(cent_rows),
        "n_vectors": spark.read.parquet(path).count(),
    }


def load_ivf_centroids(spark: SparkSession, path: str) -> DataFrame:
    """The k-row centroid table from the sidecar."""
    txt = io_util.read_text(spark, path.rstrip("/") + "/" + CENTROID_SIDECAR)
    if txt is None:
        raise FileNotFoundError(f"no {CENTROID_SIDECAR} under {path}")
    rows = json.loads(txt)
    return spark.createDataFrame(
        [(r["centroid_id"], r["centroid"]) for r in rows],
        "centroid_id int, centroid array<float>",
    )


def ivf_index_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    nprobe: int = 2,
    k_neighbors: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Probe the persisted index: per-query nprobe buckets, partition-
    pruned scan, exact-cosine re-rank within probed buckets."""
    cents = F.broadcast(load_ivf_centroids(spark, path))
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    probe_scored = q.crossJoin(cents).select(
        query_id_col,
        "__qvec",
        "centroid_id",
        cosine_sim(F.col("__qvec"), F.col("centroid")).alias("__csim"),
    )
    wp = Window.partitionBy(query_id_col).orderBy(
        F.col("__csim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        probe_scored.withColumn("__r", F.row_number().over(wp))
        .where(F.col("__r") <= nprobe)
        .select(
            query_id_col,
            "__qvec",
            norm2(F.col("__qvec")).alias("__qn2"),
            "centroid_id",
        )
        # materialized once: the plan is consumed twice (the IN-list
        # collect below AND the candidate join), and without the
        # checkpoint the queries-side crossJoin + window would run
        # twice — expensive when `queries` is itself derived
        .localCheckpoint(eager=True)
    )
    # static IN-list from the union of probed buckets (<= k values —
    # model-sized) so the scan prunes partition DIRECTORIES, not rows
    probed_ids = sorted(
        r.centroid_id for r in probes.select("centroid_id").distinct().collect()
    )
    index = spark.read.parquet(path).filter(
        F.col("centroid_id").isin(probed_ids)
    )
    cands = index.withColumn("__vn2", norm2(F.col(vec_col))).join(
        F.broadcast(probes), "centroid_id"
    ).select(
        query_id_col,
        id_col,
        F.round(
            cosine_sim_hoisted(
                dot(F.col(vec_col), F.col("__qvec")),
                F.col("__vn2"),
                F.col("__qn2"),
            ),
            6,
        ).alias("approx_cosine"),
    )
    wk = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_cosine").desc(), F.col(id_col).asc()
    )
    return (
        cands.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k_neighbors)
        .select(
            query_id_col,
            id_col,
            "approx_cosine",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


PQ_CODEBOOK_SIDECAR = "_pq_codebooks.json"


def build_ivf_pq_index(
    df: DataFrame,
    path: str,
    k_coarse: int = 8,
    m: int = 4,
    k_sub: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict[str, Any]:
    """Fit coarse centroids + PQ codebooks, encode, and write the
    CODES-ONLY index partitioned by coarse bucket — the full write-time
    product of the IVF-PQ composition (operators/pq.py ivf_pq_topk
    derives all of this inside every query; at 100 TB you pay it once
    at ingest).

    What lands on disk per vector is ``(id, codes array<int>, vnorm)``
    — m small ints and one double instead of ``dim`` floats, a 10-50×
    scan-width cut on top of the nprobe/k partition pruning. The two
    model-sized artifacts (k_coarse coarse centroids, m×k_sub
    sub-centroids) go in JSON sidecars; both round-trip exactly
    (float32 → Python float → float32 is lossless through JSON repr),
    so the probe path is bit-identical to the in-plan operator —
    asserted in tests and by the driver oracle (the index entry reuses
    the in-plan chain's oracle verbatim).
    """
    from .pq import pq_encode, pq_train

    spark = df.sparkSession
    cents = kmeans_fit(df, k=k_coarse, iters=iters, vec_col=vec_col, id_col=id_col)
    books = pq_train(df, m=m, k=k_sub, iters=iters, vec_col=vec_col, id_col=id_col)
    cent_rows = [
        {"centroid_id": int(r.centroid_id), "centroid": [float(x) for x in r.centroid]}
        for r in cents.collect()
    ]
    book_rows = [
        {
            "sub_id": int(r.sub_id),
            "centroid_id": int(r.centroid_id),
            "centroid": [float(x) for x in r.centroid],
        }
        for r in books.collect()
    ]
    assigned = ivf_assign(df, cents, vec_col=vec_col, id_col=id_col)
    coded = pq_encode(df, books, vec_col=vec_col, id_col=id_col).join(
        assigned.select(id_col, "centroid_id"), id_col
    )
    (
        # co-locate each bucket before the partitioned write: without
        # the repartition every task writes a file into every bucket
        # directory (tasks × k_coarse files — millions at cluster
        # scale). The extra shuffle moves only the NARROW coded rows
        # (m ints + a double), which is exactly the width PQ saved;
        # values are partitioning-invariant so this is layout-only.
        coded.repartition("centroid_id")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .partitionBy("centroid_id")
        .parquet(path)
    )
    io_util.write_text(
        spark,
        path.rstrip("/") + "/" + CENTROID_SIDECAR,
        json.dumps(cent_rows, sort_keys=True),
    )
    io_util.write_text(
        spark,
        path.rstrip("/") + "/" + PQ_CODEBOOK_SIDECAR,
        json.dumps(book_rows, sort_keys=True),
    )
    return {
        "path": path,
        "k_coarse": len(cent_rows),
        "m": m,
        "k_sub": k_sub,
        "n_vectors": spark.read.parquet(path).count(),
    }


def load_pq_codebooks(spark: SparkSession, path: str) -> DataFrame:
    """The m×k_sub codebook table from the sidecar."""
    txt = io_util.read_text(
        spark, path.rstrip("/") + "/" + PQ_CODEBOOK_SIDECAR
    )
    if txt is None:
        raise FileNotFoundError(f"no {PQ_CODEBOOK_SIDECAR} under {path}")
    rows = json.loads(txt)
    return spark.createDataFrame(
        [(r["sub_id"], r["centroid_id"], r["centroid"]) for r in rows],
        "sub_id int, centroid_id int, centroid array<float>",
    )


def ivf_pq_index_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    nprobe: int = 2,
    k_neighbors: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Probe the persisted IVF-PQ index: per-query nprobe coarse
    buckets (broadcast k_coarse-row sidecar table), a partition-pruned
    scan that reads ONLY ``(id, codes, vnorm)`` from the probed
    directories (the scan never touches a full vector — PQ's whole
    point made visible in ReadSchema), then the shared broadcast-ADC
    scorer. Bit-identical to the in-plan
    :func:`~shaha_spark.operators.pq.ivf_pq_topk` under the same
    artifacts — the disk round trip changes the scan shape, never a
    value."""
    from .pq import _adc_score

    cents = F.broadcast(load_ivf_centroids(spark, path))
    books = load_pq_codebooks(spark, path)
    q = queries.select(F.col(query_id_col), F.col(vec_col))
    probe_scored = q.crossJoin(cents).select(
        query_id_col,
        "centroid_id",
        cosine_sim(F.col(vec_col), F.col("centroid")).alias("__csim"),
    )
    wp = Window.partitionBy(query_id_col).orderBy(
        F.col("__csim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        probe_scored.withColumn("__r", F.row_number().over(wp))
        .where(F.col("__r") <= nprobe)
        .select(query_id_col, "centroid_id")
        # consumed twice (IN-list collect + candidate join); queries
        # may itself be derived — same boundary as ivf_index_topk
        .localCheckpoint(eager=True)
    )
    probed_ids = sorted(
        r.centroid_id for r in probes.select("centroid_id").distinct().collect()
    )
    index = spark.read.parquet(path).filter(
        F.col("centroid_id").isin(probed_ids)
    )
    coded = index.join(F.broadcast(probes), "centroid_id").select(
        query_id_col, id_col, "codes", "vnorm"
    )
    return _adc_score(
        coded, books, queries, k_neighbors, vec_col, id_col, query_id_col,
        per_query_codes=True,
    )
