"""IVF-PQ on the CLUSTERED fixture: the hard recall gate.

VERDICT r8 #1: the driver's near-uniform random embeddings are the
adversarial worst case for quantized search — PQ's ADC error exceeds
their tiny top-5 cosine margins by construction, so no shipped fixture
demonstrated PQ ever being the right choice. The deterministic
product-structured mixture (scripts/make_clustered_emb.py) is the data
shape PQ exists for: groups of exactly k_neighbors points sharing a
sub-center combo, inter-tier margins two orders above the ADC error.
On it, IVF-PQ must reach recall@5 >= 0.9 while probing only 2 of 16
coarse buckets — pruning 7/8 of the corpus AND scanning m ints instead
of dim floats per candidate.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as papq
import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)
from make_clustered_emb import make_clustered_emb  # noqa: E402

from shaha_spark.operators.kmeans import kmeans_fit
from shaha_spark.operators.pq import ivf_pq_topk, pq_train
from shaha_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    topk_recall,
)

N = 400  # 80 groups of 5 — small enough for CI, >= 16 groups for seeds


@pytest.fixture(scope="module")
def clus_path(tmp_path_factory):
    return make_clustered_emb(
        str(tmp_path_factory.mktemp("clus") / "emb.parquet"), n=N
    )


def test_fixture_geometry(clus_path):
    """The fixture's own contract: every point's true top-5 is exactly
    its group (min in-group cosine far above max out-group), ids are
    dense 0..n-1, and ids 0..15 cover 16 distinct groups (so the
    lowest-id kmeans seeds start from 16 distinct locations)."""
    t = papq.read_table(clus_path)
    ids = np.array(t["vec_id"])
    labels = np.array(t["label"])
    vecs = np.array([np.asarray(v) for v in t["embedding"].to_pylist()])
    assert (ids == np.arange(N)).all()
    assert len(set(labels[:16].tolist())) == 16
    normed = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for probe in (0, 7, 123, N - 1):
        sims = normed @ normed[probe]
        own = labels == labels[probe]
        assert own.sum() == 5
        assert sims[own].min() > sims[~own].max() + 0.2


def test_fixture_growth_superset(clus_path, tmp_path):
    """Doubling n extends the corpus without touching shared rows —
    the property that makes the bench's sf1 slope measure data growth
    and nothing else."""
    big = make_clustered_emb(str(tmp_path / "emb2.parquet"), n=2 * N)
    a = papq.read_table(clus_path)
    b = papq.read_table(big).slice(0, N)
    assert a["embedding"].to_pylist() == b["embedding"].to_pylist()
    assert a["label"].to_pylist() == b["label"].to_pylist()


def test_ivf_pq_recall_gate_clustered(spark, clus_path):
    """THE gate: IVF-PQ recall@5 >= 0.9 at nprobe=2 of k_coarse=16 on
    clustered data (plain IVF must also clear it — PQ's compression
    may not cost recall where margins are real)."""
    embs = spark.read.parquet(clus_path)
    cents = kmeans_fit(embs, k=16, iters=2).localCheckpoint(eager=True)
    books = pq_train(embs, m=4, k=16, iters=2)
    queries = (
        embs.filter(F.col("vec_id") % 40 == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .localCheckpoint(eager=True)
    )
    exact = brute_force_topk(embs, queries, k=5).localCheckpoint(eager=True)

    pq5 = ivf_pq_topk(embs, queries, cents, books, k=5, nprobe=2)
    pq_recall = topk_recall(exact, pq5, k=5).agg(F.avg("recall")).first()[0]
    assert pq_recall >= 0.9, f"IVF-PQ recall@5 {pq_recall} < 0.9 on clustered data"

    iv5 = ivf_topk(embs, queries, cents, k=5, nprobe=2)
    iv_recall = topk_recall(exact, iv5, k=5).agg(F.avg("recall")).first()[0]
    assert iv_recall >= 0.9, f"IVF recall@5 {iv_recall} < 0.9 on clustered data"
