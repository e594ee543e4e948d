"""Connected components over a candidate-pair edge list, and the
transitive (component-wise) near-dup dedup built on it.

``minhash_dedup`` is the standard large-scale greedy shortcut: a doc is
dropped iff it has a direct near-dup edge to a LOWER-id doc. In a star
1—3, 2—3 (hub = highest id, no 1—2 edge) greedy drops only the hub and
keeps BOTH satellites, although they sit in one near-dup component. The
component pass closes that gap: every doc in a connected component of
the near-dup graph except the component's minimum id is dropped.

Shape for scale: label propagation runs on the EDGE LIST (LSH candidate
pairs — sparse by construction), never on the corpus; one iteration is
one join + one partial-agg groupBy plus a pointer-doubling join, labels
materialize between iterations (localCheckpoint) so the plan stays
one-hop deep; the loop exits on a converged fixpoint (count of changed
labels = 0, a cheap aggregate over the label table). Plain min-label
propagation needs O(component diameter) rounds; the pointer-doubling
step (comp(v) ← comp(comp(v)), the MapReduce-CC / Shiloach-Vishkin
shortcut from the public literature) compounds the reach each round,
so convergence is O(log diameter) — the difference between ~25 rounds
and ~5 on a deep component, and the reason a pathological long-chain
graph no longer exhausts max_iters (optimization round 13).

The fixpoint is engine-independent — label(v) = min id reachable from
v — so the DuckDB oracle states it directly as a recursive CTE, with no
iteration-count coupling to the Spark loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iters: int = 25, return_rounds: bool = False
) -> DataFrame:
    """[id_a, id_b] undirected edges → [id, comp] with comp = min id in
    the node's component. Nodes are those appearing in edges; isolated
    documents (no edges) are simply absent — their component is
    themselves by definition.

    ``return_rounds=True`` returns ``(labels, rounds)`` so tests can
    assert the O(log diameter) round count of the pointer-doubling
    loop.
    """
    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(
        edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        nbr = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # propagation is monotone (labels only ever decrease), so
        # "changed" is computable from the new frame alone: flag rows
        # whose label strictly dropped, checkpoint WITH the flag, and
        # count the flags off the local blocks — the old form joined
        # the new labels back against the previous round's table every
        # iteration just to find differences (optimization round 12)
        prop = F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp")))
        stepped = labels.join(nbr, labels.id == nbr.src, "left").select(
            "id", prop.alias("comp1"), F.col("comp").alias("__old")
        )
        # pointer doubling (optimization round 13): follow the label
        # one more hop through the PREVIOUS round's materialized table
        # — comp2 = min(comp1, prev_comp(comp1)). Every comp value is
        # itself a node id of the same component (initially comp=id;
        # propagation adopts a neighbor's comp, doubling adopts the
        # comp OF a same-component node), and prev_comp(u) <= u, so
        # the invariants (same-component, monotone non-increasing)
        # are preserved while the round's reach compounds:
        # f(r) = 2 f(r-1) + 1 instead of f(r) = r — O(log diameter)
        # rounds to the identical fixpoint. Cost: one extra
        # labels-sized join per round; saving: exponentially fewer
        # rounds on deep components (each round is a full job with a
        # checkpoint barrier, so rounds are the scale cost).
        ptr = labels.select(
            F.col("id").alias("__pid"), F.col("comp").alias("__pcomp")
        )
        dbl = F.least(F.col("comp1"), F.coalesce("__pcomp", F.col("comp1")))
        new_labels = (
            stepped.join(ptr, stepped.comp1 == ptr.__pid, "left")
            .select(
                "id",
                dbl.alias("comp"),
                (dbl < F.col("__old")).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("__chg")).count()
        labels = new_labels.select("id", "comp")
        if changed == 0:
            break
    if changed != 0:
        # returning silently would hand dedup a graph where distant
        # members of one component carry different labels — duplicate
        # copies would survive, presented as a converged result
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            f"iterations ({changed} labels still changing). Component "
            "diameter exceeds the budget — raise max_iters (the "
            "pointer-doubling loop needs O(log diameter) rounds)."
        )
    if return_rounds:
        return labels, rounds
    return labels


def minhash_dedup_cc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
) -> DataFrame:
    """Transitive MinHash near-dup removal: connected components of the
    est-Jaccard ≥ threshold graph; each component keeps only its
    minimum id. Returns surviving [id_col] rows.

    Strictly stronger than minhash_dedup's greedy edge rule — a star
    1—3, 2—3 collapses to {1} here, {1, 2} there.
    """
    from shaha_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        minhash_similarity,
    )

    sigs = minhash_signatures(df, text_col, id_col).cache()
    pairs = lsh_candidate_pairs(sigs, id_col)
    edges = minhash_similarity(sigs, pairs, id_col).where(
        F.col("est_jaccard") >= threshold
    ).select("id_a", "id_b")
    comps = connected_components(edges)  # materialized at fixpoint
    sigs.unpersist()
    losers = comps.where(F.col("comp") != F.col("id")).select(
        F.col("id").alias(id_col)
    )
    return df.select(id_col).join(losers, id_col, "left_anti")


def keep_best_per_component(
    df: DataFrame,
    score: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "quality",
    threshold: float = 0.7,
) -> DataFrame:
    """Quality-aware transitive near-dup removal: within each connected
    component of the est-Jaccard ≥ threshold graph, keep the HIGHEST-
    scoring member (ties broken by lowest id) instead of the arbitrary
    minimum id — the curation-pipeline survivor rule ("of N mirrored
    copies, keep the cleanest").

    ``score`` is any [id_col, score_col] frame (e.g.
    textops.quality_score output); only component members join against
    it, so the score pass can be lazy/pre-filtered. Isolated documents
    (no near-dup edge) always survive. Members MISSING from the score
    table still count as members — they join LEFT and rank below every
    scored member (score desc NULLS LAST, id asc), so an unscored
    near-dup copy loses to any scored one instead of silently
    surviving alongside the winner; a fully-unscored component keeps
    its lowest id.

    Scale shape: component labels come from the same label-propagation
    pass as :func:`minhash_dedup_cc`; the survivor choice is one
    row_number window over (component), whose partitions are component-
    sized — at 100 TB mega-components are the thing to cap upstream
    (see SCALE.md), not the window.
    """
    from pyspark.sql import Window

    from shaha_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        minhash_similarity,
    )

    sigs = minhash_signatures(df, text_col, id_col).cache()
    pairs = lsh_candidate_pairs(sigs, id_col)
    edges = minhash_similarity(sigs, pairs, id_col).where(
        F.col("est_jaccard") >= threshold
    ).select("id_a", "id_b")
    comps = connected_components(edges)  # materialized at fixpoint
    sigs.unpersist()

    w = Window.partitionBy("comp").orderBy(
        F.col(score_col).desc_nulls_last(), F.col("id").asc()
    )
    member_losers = (
        comps.join(
            score.select(F.col(id_col).alias("id"), score_col), "id", "left"
        )
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") > 1)
        .select(F.col("id").alias(id_col))
    )
    return df.select(id_col).join(member_losers, id_col, "left_anti")
