"""Deterministic CLUSTERED embedding fixture — the data shape where
product quantization earns its keep (VERDICT r8 #1).

The driver's synthetic embeddings are near-uniform random — the
adversarial worst case for ANY clustering index: recall tracks the
probed fraction for IVF, and PQ's ADC quantization error exceeds the
corpus's tiny top-5 cosine margins by construction (r8 measured 0.23
recall@5). Real embedding corpora are nothing like that: they have
cluster structure, and the pruned/quantized paths exist precisely for
them. This generator produces such a corpus, deterministically:

  * Each of ``m`` contiguous subspaces (PQ's decomposition) carries
    ``k`` ORTHONORMAL sub-centers (QR of a seeded Gaussian — exact
    separation, pairwise sub-cosine 0).
  * Points come in groups of exactly ``group_size``; group ``g`` is
    assigned a distinct m-digit base-k combo of sub-centers, and every
    member is that concatenated base direction plus N(0, sigma) noise.
    Same-group cosine ~= 1 - O(m*d*sigma^2); the best distractor
    shares m-1 sub-centers at cosine (m-1)/m. With the defaults
    (m=4, sigma=0.01) the margin is ~0.24 — two orders of magnitude
    above the ADC error, so the TRUE top-``group_size`` of any member
    is exactly its own group, and a correct PQ pipeline must find it.
  * Groups 0..k-1 are planted on the diagonal combos (j,j,..,j) and
    one member of each is swapped into vec_ids 0..k-1, so the
    engine's deterministic lowest-id kmeans seeding starts from k
    DISTINCT locations in every subspace (no collapsed codebooks) —
    the fixture tests the operator, not the seeder's luck.
  * Growth-stable: the combo permutation and per-group RNG draws
    depend only on (seed, group index), so a 10x corpus is a strict
    superset of the base corpus with the same vec_ids for shared rows
    — the sf1 slope measures data growth, nothing else.

Schema matches /root/testdata/*/embeddings.parquet:
    vec_id bigint, embedding array<float>, label int (= group id).

No Spark dependency: numpy -> pyarrow parquet (single file), so tests
and bench can call it before a session exists.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def make_clustered_emb(
    path: str,
    n: int = 2000,
    dim: int = 64,
    m: int = 4,
    k: int = 16,
    group_size: int = 5,
    sigma: float = 0.01,
    seed: int = 94,
) -> str:
    """Write ``n`` clustered vectors to ``path`` (parquet file).

    n must be a multiple of group_size; n/group_size groups must fit
    in k**m distinct combos (minus the k planted diagonals).
    """
    if n % group_size:
        raise ValueError(f"n={n} not a multiple of group_size={group_size}")
    n_groups = n // group_size
    if n_groups > k**m - k:
        raise ValueError(f"{n_groups} groups > {k**m - k} available combos")
    if n_groups < k:
        raise ValueError(f"need >= {k} groups to plant all diagonal combos")
    sub_dim = dim // m
    if sub_dim < k:
        raise ValueError(f"sub_dim {sub_dim} < k {k}: cannot orthonormalize")

    rng = np.random.Generator(np.random.PCG64(seed))
    # k orthonormal sub-centers per subspace: QR of a seeded Gaussian.
    subcenters = np.empty((m, k, sub_dim))
    for s in range(m):
        q, _ = np.linalg.qr(rng.normal(size=(sub_dim, k)))
        subcenters[s] = q.T  # rows orthonormal

    # Distinct combos: diagonals (j,..,j) for groups 0..k-1, then a
    # seeded permutation of the remaining combo ids. The permutation is
    # drawn over the FULL combo space once, so prefix-stability holds
    # for any n.
    diag = np.array([sum(j * k**p for p in range(m)) for j in range(k)])
    perm = rng.permutation(k**m)
    rest = perm[~np.isin(perm, diag)]
    combo_ids = np.concatenate([diag, rest[: n_groups - k]])

    # Per-group member noise: an independent seeded stream per group so
    # rows depend only on (seed, group) — superset-stable under growth.
    vecs = np.empty((n, dim), dtype=np.float64)
    labels = np.empty(n, dtype=np.int32)
    for g in range(n_groups):
        digits = [(combo_ids[g] // k**p) % k for p in range(m)]
        base = np.concatenate([subcenters[s, digits[s]] for s in range(m)])
        grng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + g))
        block = base + grng.normal(scale=sigma, size=(group_size, dim))
        vecs[g * group_size : (g + 1) * group_size] = block
        labels[g * group_size : (g + 1) * group_size] = g

    # vec_id = row index, except within the first k groups: member-0 of
    # diagonal group j gets id j (distinct per-subspace locations for
    # the engine's lowest-id kmeans seeds), and the displaced ids k..
    # k*group_size-1 fill the remaining first-block rows in row order.
    # Only rows < k*group_size are touched, so growth keeps shared ids.
    vec_ids = np.arange(n, dtype=np.int64)
    head = k * group_size
    spare = iter(range(k, head))
    for r in range(head):
        vec_ids[r] = r // group_size if r % group_size == 0 else next(spare)

    order = np.argsort(vec_ids)
    table = pa.table(
        {
            "vec_id": pa.array(vec_ids[order], pa.int64()),
            "embedding": pa.array(
                list(vecs[order].astype(np.float32)), pa.list_(pa.float32())
            ),
            "label": pa.array(labels[order], pa.int32()),
        }
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(table, path)
    return path


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/clustered_emb.parquet"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    print(make_clustered_emb(out, n=n))
