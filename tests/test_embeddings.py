"""Embedding operators: quantization, bucket dedup, top PC.

Correctness against numpy (an independent oracle, complementing the
DuckDB twins in __spark_entry__), plus the determinism guarantees the
module's docstrings promise.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from shaha_spark.operators.embeddings import (
    GRID,
    dedup_by_bucket,
    dim_stats,
    quantize_int8,
    top_principal_component,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def matrix(emb):
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    return np.array([r.embedding for r in rows], dtype=np.float32)


def test_quantize_codes_match_numpy(emb, matrix):
    x = matrix.astype(np.float64)
    mn = x.min(axis=0)
    mx = x.max(axis=0)
    span = mx - mn
    span[span == 0] = 1.0
    expected = np.minimum(255, np.floor((x - mn) / span * 256.0)).astype(np.int64)
    got = {
        (r.vec_id, r.pos): r.code
        for r in quantize_int8(emb).collect()
    }
    n, d = x.shape
    assert len(got) == n * d
    for i in range(n):
        for p in range(d):
            assert got[(i, p)] == expected[i, p], (i, p)


def test_quantize_is_deterministic(emb):
    a = sorted(map(tuple, quantize_int8(emb).collect()))
    b = sorted(map(tuple, quantize_int8(emb.repartition(7)).collect()))
    assert a == b


def test_bucket_dedup_keeps_min_id_and_partitions_rows(emb):
    out = dedup_by_bucket(emb).collect()
    total = sum(r.n_members for r in out)
    assert total == emb.count()
    # keep_id must be a member mapping to its own bucket
    from shaha_spark.operators.embeddings import bucket_signature

    sig = {r.vec_id: r.bucket for r in bucket_signature(emb).collect()}
    for r in out:
        assert sig[r.keep_id] == r.bucket


def test_dim_stats_match_numpy(emb, matrix):
    stats = dim_stats(emb)
    mn = matrix.min(axis=0)
    mx = matrix.max(axis=0)
    for p, (lo, hi) in enumerate(stats):
        assert lo == pytest.approx(float(mn[p]), abs=0)
        assert hi == pytest.approx(float(mx[p]), abs=0)


def test_top_pc_aligns_with_numpy_eigenvector(emb, matrix):
    """2 exact power rounds from all-ones must land close to the true
    dominant eigenvector of the quantized centered Gram matrix."""
    x = matrix.astype(np.float64)
    m = x.mean(axis=0).astype(np.float32).astype(np.float64)
    xq = np.floor((x - m) * GRID)
    gram = xq.T @ xq
    v = gram @ (gram @ np.ones(x.shape[1]))
    v = v / np.abs(v).max()

    got = top_principal_component(emb, iters=2).collect()
    got_v = np.zeros(x.shape[1])
    for r in got:
        got_v[r.pos] = r.comp
    cos = float(v @ got_v / (np.linalg.norm(v) * np.linalg.norm(got_v)))
    assert cos > 0.999999, cos
    assert np.abs(got_v).max() == pytest.approx(1.0)


def test_top_pc_is_deterministic_across_partitionings(emb):
    a = sorted(map(tuple, top_principal_component(emb, iters=2).collect()))
    b = sorted(
        map(tuple, top_principal_component(emb.repartition(13), iters=2).collect())
    )
    assert a == b


def test_topk_recall_counts_overlap_per_query(spark):
    from shaha_spark.operators.similarity import topk_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], "query_id bigint, vec_id bigint"
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 20), (2, 21), (2, 98)],
        "query_id bigint, vec_id bigint",
    )
    out = {r.query_id: (r.n_hits, r.recall) for r in
           topk_recall(exact, approx, k=2).collect()}
    assert out == {1: (1, 0.5), 2: (2, 1.0)}


def test_hard_negatives_excludes_same_label_and_ranks_k(emb):
    from shaha_spark.operators.similarity import hard_negatives

    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    out = hard_negatives(emb, queries, k=5).collect()
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    qlabels = {r.query_id: labels[r.query_id] for r in out}
    per_q = {}
    for r in out:
        # a hard negative must carry a different label than its query
        assert r.neg_label == labels[r.vec_id]
        assert r.neg_label != qlabels[r.query_id]
        per_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == [1, 2, 3, 4, 5]


def test_knn_label_accuracy_probe_partition(emb):
    from shaha_spark.operators.similarity import knn_label_accuracy

    probes = emb.filter(F.col("vec_id") % 20 == 0)
    out = knn_label_accuracy(emb, probes, k=5).collect()
    # every probe is classified exactly once: per-label probe counts
    # partition the probe sample, and accuracy = n_correct / n_probes
    assert sum(r.n_probes for r in out) == probes.count()
    for r in out:
        assert 0 <= r.n_correct <= r.n_probes
        assert r.accuracy == r.n_correct / r.n_probes


def test_hoisted_cosine_is_bit_identical_to_inline(spark):
    """The norm-hoisted scoring form must be the SAME double as the
    inline cosine on every pair: dot/sqrt(na2*nb2) with precomputed
    norms is the identical 3-op IEEE sequence, so equality is exact
    (==), not approximate. Random mixed-magnitude vectors, fixed seed."""
    import random

    from shaha_spark.operators.similarity import (
        cosine_sim,
        cosine_sim_hoisted,
        dot,
        norm2,
    )

    rng = random.Random(20260815)
    rows = [
        (
            i,
            [rng.uniform(-1e3, 1e3) * (10 ** rng.randint(-6, 6)) for _ in range(17)],
            [rng.uniform(-1e3, 1e3) * (10 ** rng.randint(-6, 6)) for _ in range(17)],
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "id bigint, a array<double>, b array<double>"
    )
    out = df.select(
        cosine_sim(F.col("a"), F.col("b")).alias("inline"),
        cosine_sim_hoisted(
            dot(F.col("a"), F.col("b")),
            norm2(F.col("a")),
            norm2(F.col("b")),
        ).alias("hoisted"),
    ).collect()
    assert all(r.inline == r.hoisted for r in out)
