"""Persistent IVF index (operators/ann_index.py): the write-time
bucketed layout must (a) return bit-identical results to the in-plan
ivf_topk under the same parameters, and (b) actually PRUNE — the
probed read's plan carries a PartitionFilters predicate on
centroid_id and unprobed bucket directories contribute no files.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from shaha_spark.operators.ann_index import (
    build_ivf_index,
    ivf_index_topk,
    load_ivf_centroids,
)
from shaha_spark.operators.kmeans import kmeans_fit
from shaha_spark.operators.similarity import ivf_topk


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _queries(emb):
    return emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_index_roundtrip_matches_inplan_ivf(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ivf")
    summary = build_ivf_index(emb, path, k=4, iters=2)
    assert summary["k"] == 4 and summary["n_vectors"] == emb.count()

    got = {
        (r.query_id, r.vec_id): (r.approx_cosine, r.rank)
        for r in ivf_index_topk(
            spark, path, _queries(emb), nprobe=2, k_neighbors=5
        ).collect()
    }
    cents = kmeans_fit(emb, k=4, iters=2)
    expect = {
        (r.query_id, r.vec_id): (r.cosine, r.rank)
        for r in ivf_topk(emb, _queries(emb), cents, k=5, nprobe=2).collect()
    }
    assert got == expect  # bit-identical to the in-plan operator


def test_probed_read_prunes_partitions(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, k=4, iters=2)
    # all 4 bucket dirs exist on disk
    dirs = {d for d in os.listdir(path) if d.startswith("centroid_id=")}
    assert len(dirs) >= 2

    probed = spark.read.parquet(path).filter(F.col("centroid_id").isin([1]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan, plan
    # the pruned scan opens files only under the probed directory
    files = probed.select(F.input_file_name().alias("f")).distinct().collect()
    assert files
    assert all("centroid_id=1" in r.f for r in files)


def test_centroid_sidecar_roundtrip_exact(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, k=4, iters=2)
    fit = {r.centroid_id: list(r.centroid)
           for r in kmeans_fit(emb, k=4, iters=2).collect()}
    loaded = {r.centroid_id: list(r.centroid)
              for r in load_ivf_centroids(spark, path).collect()}
    assert loaded == fit  # JSON float round trip is exact for float32


# ---------------------------------------------------- IVF-PQ index (r9)

def test_pq_index_roundtrip_matches_inplan_ivf_pq(spark, sf_dir, tmp_path):
    from shaha_spark.operators.ann_index import (
        build_ivf_pq_index,
        ivf_pq_index_topk,
        load_pq_codebooks,
    )
    from shaha_spark.operators.pq import ivf_pq_topk, pq_train

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ivfpq")
    summary = build_ivf_pq_index(emb, path, k_coarse=4, m=4, k_sub=4, iters=2)
    assert summary["k_coarse"] == 4 and summary["n_vectors"] == emb.count()

    got = {
        (r.query_id, r.vec_id): (r.approx_cosine, r.rank)
        for r in ivf_pq_index_topk(
            spark, path, _queries(emb), nprobe=2, k_neighbors=5
        ).collect()
    }
    cents = kmeans_fit(emb, k=4, iters=2)
    books = pq_train(emb, m=4, k=4, iters=2)
    expect = {
        (r.query_id, r.vec_id): (r.approx_cosine, r.rank)
        for r in ivf_pq_topk(
            emb, _queries(emb), cents, books, k=5, nprobe=2
        ).collect()
    }
    assert got == expect  # disk round trip changes scan shape, not values

    # codebook sidecar round trip is exact (float32 -> JSON -> float32)
    fit = {(r.sub_id, r.centroid_id): list(r.centroid) for r in books.collect()}
    loaded = {
        (r.sub_id, r.centroid_id): list(r.centroid)
        for r in load_pq_codebooks(spark, path).collect()
    }
    assert loaded == fit


def test_pq_index_scan_reads_codes_not_vectors(spark, sf_dir, tmp_path):
    """The PQ payoff made visible: the probed scan's ReadSchema carries
    the m-int codes + norm, never the full embedding column (which is
    not even on disk), and partition pruning holds."""
    from shaha_spark.operators.ann_index import build_ivf_pq_index

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ivfpq")
    build_ivf_pq_index(emb, path, k_coarse=4, m=4, k_sub=4, iters=2)

    probed = spark.read.parquet(path).filter(F.col("centroid_id").isin([1]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan, plan
    assert "codes" in plan and "vnorm" in plan
    assert "embedding" not in plan
    files = probed.select(F.input_file_name().alias("f")).distinct().collect()
    assert files and all("centroid_id=1" in r.f for r in files)
