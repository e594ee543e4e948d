"""Optimization round 13: legacy-form equivalence pins.

Same contract as tests/test_optimization_r12.py: every structural
rewrite this round keeps the OLD builder in here as an executable
specification and proves the new form produces identical results —
so "optimized" can never silently mean "different".
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# connected_components: pointer doubling reaches the identical min-id
# fixpoint in O(log diameter) rounds (VERDICT r12 item 6)
# ---------------------------------------------------------------------------


def _legacy_label_propagation(edges, max_iters=200):
    """The pre-r13 propagation-only loop (O(diameter) rounds), kept as
    the executable spec for the min-id fixpoint."""
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
    for _ in range(max_iters):
        nbr = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        prop = F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp")))
        new_labels = (
            labels.join(nbr, labels.id == nbr.src, "left")
            .select("id", prop.alias("comp"), (prop < F.col("comp")).alias("__chg"))
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("__chg")).count()
        labels = new_labels.select("id", "comp")
        if changed == 0:
            return labels
    raise AssertionError("legacy spec did not converge")


def test_cc_pointer_doubling_matches_legacy_on_deep_chain(spark):
    """A 64-node chain (diameter 63) — the worst case for propagation.
    The legacy loop needs 63 rounds; pointer doubling must reach the
    IDENTICAL fixpoint within O(log d): reach f(r) = 2 f(r-1) + 1 puts
    convergence at round 6 (2^6-1 >= 63) plus one round to observe
    changed == 0."""
    from shaha_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 64)], "id_a long, id_b long"
    )
    expected = {
        (r.id, r.comp) for r in _legacy_label_propagation(edges).collect()
    }
    labels, rounds = connected_components(edges, return_rounds=True)
    got = {(r.id, r.comp) for r in labels.collect()}
    assert got == expected
    assert all(c == 1 for _, c in got)
    assert rounds <= 8, (
        f"pointer doubling took {rounds} rounds on a diameter-63 chain — "
        "expected O(log d) (<= 8); the doubling step is not engaging"
    )


def test_cc_pointer_doubling_matches_legacy_on_random_graph(spark):
    """Mixed shapes: several components, stars, triangles, isolated
    pairs, high-id hubs — fixpoint identical to the legacy spec."""
    from shaha_spark.operators.components import connected_components

    eds = (
        [(1, 2), (2, 3), (3, 7)]          # chain with a high-id tail
        + [(5, 6)]                          # isolated pair
        + [(10, 30), (20, 30)]              # star, hub = highest id
        + [(40, 41), (41, 42), (40, 42)]    # triangle
        + [(50, 100), (100, 51), (51, 99), (99, 52)]  # zigzag chain
    )
    edges = spark.createDataFrame(eds, "id_a long, id_b long")
    expected = {
        (r.id, r.comp) for r in _legacy_label_propagation(edges).collect()
    }
    got = {
        (r.id, r.comp)
        for r in connected_components(edges).collect()
    }
    assert got == expected


def test_cc_still_raises_when_budget_truly_exhausted(spark):
    """The unconverged guard survives the speedup: a 4096-node chain
    needs ~12 doubling rounds; max_iters=2 must still raise."""
    from shaha_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iters=2)


# ---------------------------------------------------------------------------
# split_balance_sql twin: NULL-key groups survive (ADVICE r12)
# ---------------------------------------------------------------------------


def test_split_balance_sql_twin_keeps_null_split_groups(spark):
    """The old twin joined the max-cluster CTE back with
    JOIN ... USING (keys), which drops NULL-key rows (SQL joins never
    match NULLs) while Spark's groupBy keeps NULL groups. The twin is
    now the same two-level aggregation as the Spark form; a fixture
    with NULL splits AND NULL domains must agree row-for-row."""
    import duckdb

    from shaha_spark.operators.sampling import split_balance, split_balance_sql

    rows = [
        (1, "a", 10, "train"), (2, "a", 10, "train"), (3, "a", 11, "eval"),
        (4, "b", 12, None), (5, "b", 12, None), (6, None, 13, "train"),
        (7, None, 14, None), (8, "a", 10, "eval"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, domain string, cluster_rep bigint, split string"
    )
    weights = {"train": 0.6, "eval": 0.4}
    got = sorted(
        (
            tuple(r)
            for r in split_balance(
                df, weights, domain_col="domain", cluster_col="cluster_rep"
            ).collect()
        ),
        key=repr,
    )
    vals = ", ".join(
        "({}, {}, {}, {})".format(
            r[0],
            "NULL" if r[1] is None else f"'{r[1]}'",
            r[2],
            "NULL" if r[3] is None else f"'{r[3]}'",
        )
        for r in rows
    )
    want = sorted(
        (
            tuple(r)
            for r in duckdb.connect().execute(
                split_balance_sql(
                    f"SELECT * FROM (VALUES {vals}) AS v(doc_id, domain, cluster_rep, split)",
                    weights, domain_col="domain", cluster_col="cluster_rep",
                )
            ).fetchall()
        ),
        key=repr,
    )
    assert got == want
    # the NULL-split and NULL-domain groups are present on both sides
    assert any(r[1] is None for r in got), "NULL split group missing"
    assert any(r[0] is None for r in got), "NULL domain group missing"


# ---------------------------------------------------------------------------
# basket pair expansion: Generates instead of interpreted HOF lambdas
# ---------------------------------------------------------------------------


def _legacy_pairs_from_baskets(baskets):
    """The pre-r13 nested-transform pair expansion (interpreted HOF
    lambdas), kept as the executable spec for the pair multiset."""
    arr = F.col("__items")
    pairs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.size(arr)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("item_a"), F.col("p.b").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )


def test_basket_pair_expansion_matches_legacy_hof_form(spark):
    """posexplode+slice emits the identical (item_a, item_b, n_pair)
    set as the nested-transform form — including singleton baskets
    (no pairs), duplicate items (collapsed upstream by collect_set),
    and an empty frame."""
    from shaha_spark.operators.basket import _baskets, _pairs_from_baskets

    rows = (
        [(1, f"i{k}") for k in range(5)]          # 5-item basket
        + [(2, "x")]                                 # singleton
        + [(3, "a"), (3, "b"), (3, "a")]             # dup item
        + [(4, "m"), (4, "n"), (4, "o"), (4, "p")]
        + [(None, "ghost")]                          # null basket key
    )
    df = spark.createDataFrame(rows, "basket bigint, item string")
    baskets = _baskets(df, "basket", "item")
    got = sorted(tuple(r) for r in _pairs_from_baskets(baskets).collect())
    want = sorted(
        tuple(r) for r in _legacy_pairs_from_baskets(baskets).collect()
    )
    assert got == want
    assert (5 * 4) // 2 + 1 + (4 * 3) // 2 == sum(n for *_, n in got)
    empty = _baskets(
        spark.createDataFrame([], "basket bigint, item string"),
        "basket", "item",
    )
    assert _pairs_from_baskets(empty).count() == 0
