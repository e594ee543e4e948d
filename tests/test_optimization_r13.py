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


# ---------------------------------------------------------------------------
# merge_rollup: union + re-aggregation replaces the full-outer join
# (VERDICT r12 item 7 family sweep — events_rollup_incremental)
# ---------------------------------------------------------------------------


def _legacy_merge_rollup(existing, increment):
    """The pre-r13 null-safe full-outer-join merge, kept as the
    executable spec for the fold."""
    key_cols = [c for c in existing.columns if c not in ("n", "sv")]
    a = existing.select(
        *[F.col(k).alias(f"__ka{i}") for i, k in enumerate(key_cols)],
        F.col("n").alias("__na"),
        F.col("sv").alias("__sa"),
    )
    b = increment.select(
        *[F.col(k).alias(f"__kb{i}") for i, k in enumerate(key_cols)],
        F.col("n").alias("__nb"),
        F.col("sv").alias("__sb"),
    )
    zero = F.lit(0).cast("decimal(38,2)")
    cond = None
    for i in range(len(key_cols)):
        c = F.col(f"__ka{i}").eqNullSafe(F.col(f"__kb{i}"))
        cond = c if cond is None else cond & c
    joined = a.join(b, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__ka{i}"), F.col(f"__kb{i}")).alias(k)
            for i, k in enumerate(key_cols)
        ],
        "__na", "__sa", "__nb", "__sb",
    )
    return joined.select(
        *key_cols,
        (F.coalesce(F.col("__na"), F.lit(0)) + F.coalesce(F.col("__nb"), F.lit(0)))
        .cast("bigint")
        .alias("n"),
        (F.coalesce(F.col("__sa"), zero) + F.coalesce(F.col("__sb"), zero))
        .cast("decimal(38,2)")
        .alias("sv"),
    )


def test_merge_rollup_union_agg_matches_legacy_full_outer(spark):
    """Union+groupBy must fold identically to the old null-safe
    full-outer join: overlapping buckets add, one-sided buckets pass
    through, NULL keys collapse into one bucket, and the state type
    stays decimal(38,2)."""
    from shaha_spark.operators.incremental import merge_rollup, rollup_increment

    rows_a = [
        ("buy", 10, 1.25), ("buy", 20, 2.50), ("view", 30, 4.00),
        (None, 40, 8.00), ("only_a", 3_600_000_000, 16.00),
    ]
    rows_b = [
        ("buy", 50, 32.00), (None, 60, 64.00),
        ("only_b", 7_200_000_000, 128.00),
    ]
    schema = "event_type string, tus long, value double"
    a = rollup_increment(spark.createDataFrame(rows_a, schema))
    b = rollup_increment(spark.createDataFrame(rows_b, schema))
    def _key(t):
        # NULL bucket keys sort apart from strings
        return tuple((v is None, str(v)) for v in t)

    got = sorted((tuple(r) for r in merge_rollup(a, b).collect()), key=_key)
    want = sorted(
        (tuple(r) for r in _legacy_merge_rollup(a, b).collect()), key=_key
    )
    assert got == want
    assert dict(merge_rollup(a, b).dtypes)["sv"] == "decimal(38,2)"
    # empty-increment identity survives the rewrite
    empty = rollup_increment(
        spark.createDataFrame([], schema).where(F.lit(False))
    )
    got_id = sorted(
        (tuple(r) for r in merge_rollup(a, empty).collect()), key=_key
    )
    assert got_id == sorted((tuple(r) for r in a.collect()), key=_key)


# ---------------------------------------------------------------------------
# bootstrap_mean_ci: two 56-bit conv() parses per digest replace four
# 28-bit ones (VERDICT r12 item 5 — events_bootstrap_ci residual)
# ---------------------------------------------------------------------------


def _legacy_bootstrap_mean_ci(df, value_col, key_col, n_reps=40,
                              alpha=0.05, salt="boot",
                              precision="decimal(12,2)"):
    """The pre-r13 uniform derivation (one conv per 7-hex-char slice),
    kept as the executable spec; aggregation identical to production."""
    from shaha_spark.operators.profile import (
        _POIS1_CUTS,
        _dec_scale,
        split_cast_double_spark_sql,
    )

    sc = _dec_scale(precision)
    filtered = df.where(F.col(value_col).isNotNull())
    lit_salt = salt.replace("'", "\\'")
    n_groups = (n_reps + 3) // 4
    digests = filtered.select(
        F.col(value_col),
        *[
            F.expr(
                f"md5(concat(cast(`{key_col}` as string), '|{g}|{lit_salt}'))"
            ).alias(f"__d_{g}")
            for g in range(n_groups)
        ],
    )
    uniforms = digests.select(
        F.col(value_col),
        *[
            F.expr(
                f"cast(conv(substring(__d_{b // 4}, {1 + 7 * (b % 4)}, 7),"
                " 16, 10) as long)"
            ).alias(f"__u_{b}")
            for b in range(n_reps)
        ],
    )

    def _w_sql(b):
        branches = " ".join(
            f"WHEN __u_{b} < {cut} THEN {k}"
            for k, cut in enumerate(_POIS1_CUTS)
        )
        return f"(CASE {branches} ELSE 5 END)"

    weighted = uniforms.select(
        F.col(value_col),
        *[F.expr(_w_sql(b)).alias(f"__w_{b}") for b in range(n_reps)],
    )
    x_txt = f"cast(`{value_col}` as {precision})"
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.expr(f"sum({x_txt})").alias("__sx"),
    ]
    for b in range(n_reps):
        aggs.append(F.expr(f"sum({x_txt} * __w_{b})").alias(f"__sxw_{b}"))
        aggs.append(F.expr(f"sum(__w_{b})").alias(f"__sw_{b}"))
    mean_txt = f"({split_cast_double_spark_sql('__sx', sc)} / n)"
    one = weighted.agg(*aggs).select(
        "n",
        F.expr(mean_txt).alias("mean_value"),
        *[
            F.expr(
                f"(CASE WHEN __sw_{b} > 0 THEN "
                f"({split_cast_double_spark_sql(f'__sxw_{b}', sc)}"
                f" / cast(__sw_{b} as double)) END)"
            ).alias(f"__m_{b}")
            for b in range(n_reps)
        ],
    )
    reps = F.sort_array(
        F.array(
            *[
                F.coalesce(F.col(f"__m_{b}"), F.col("mean_value"))
                for b in range(n_reps)
            ]
        )
    )
    k = int((alpha / 2.0) * n_reps)
    return one.select(
        "n",
        "mean_value",
        F.element_at(reps, k + 1).alias("ci_lo"),
        F.element_at(reps, n_reps - k).alias("ci_hi"),
        F.lit(n_reps).cast("int").alias("n_reps"),
    )


def test_bootstrap_conv_halving_matches_legacy(spark, sf_dir):
    """shiftright/mask over a 56-bit conv must reproduce the legacy
    7-hex-char slices bit-for-bit (base-16 positional value:
    conv(d[1:14]) == u0 * 2^28 + u1), so the full CI output — weights,
    replicate means, order statistics — is identical, including at
    n_reps not divisible by 4 (a trailing half-digest)."""
    from shaha_spark.operators.profile import bootstrap_mean_ci

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(2000)
    for n_reps in (40, 6):
        got = bootstrap_mean_ci(
            ev, "value", "event_id", n_reps=n_reps
        ).collect()
        want = _legacy_bootstrap_mean_ci(
            ev, "value", "event_id", n_reps=n_reps
        ).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]


# ---------------------------------------------------------------------------
# referential_check: one pass per shared child table
# (VERDICT r12 item 7 family sweep — dq_referential)
# ---------------------------------------------------------------------------


def _legacy_referential_check(relations):
    """The pre-r13 one-subtree-per-relation form, kept as the
    executable spec for the FK orphan report."""
    outs = []
    for name, child, ckey, parent, pkey in relations:
        pk = (
            parent.select(F.col(pkey).alias(ckey))
            .distinct()
            .withColumn("__parent", F.lit(1))
        )
        joined = child.select(ckey).join(pk, ckey, "left")
        outs.append(
            joined.agg(
                F.count(F.lit(1)).alias("n_child_rows"),
                F.coalesce(
                    F.sum(
                        F.when(F.col("__parent").isNull(), 1).otherwise(0)
                    ),
                    F.lit(0),
                ).alias("n_orphans"),
            ).select(
                F.lit(name).alias("relation"),
                F.col("n_child_rows").cast("bigint").alias("n_child_rows"),
                F.col("n_orphans").cast("bigint").alias("n_orphans"),
                (F.col("n_orphans") == 0).alias("passed"),
            )
        )
    report = outs[0]
    for o in outs[1:]:
        report = report.unionByName(o)
    return report


def test_referential_check_grouped_matches_legacy(spark):
    """The shared-child single-pass form must reproduce the legacy
    per-relation report exactly: multiple FKs out of one child (the
    lineitem shape), the same FK column checked against TWO parents,
    NULL child keys counted as orphans, an interleaved relation list
    (grouping must not lose or duplicate rows), and an empty child."""
    from shaha_spark.operators.checks import referential_check

    cust = spark.createDataFrame([(1,), (2,)], "c bigint")
    part = spark.createDataFrame([(10,), (11,)], "p bigint")
    li = spark.createDataFrame(
        [(1, 10), (2, 99), (None, 11), (3, None)], "fk_c bigint, fk_p bigint"
    )
    empty = spark.createDataFrame([], "fk_c bigint")
    rels = [
        ("li->cust", li, "fk_c", cust, "c"),
        ("empty->cust", empty, "fk_c", cust, "c"),
        ("li->part", li, "fk_p", part, "p"),          # interleaved: regroups with li->cust
        ("li->cust2", li, "fk_c", part.select(F.col("p").alias("c")), "c"),  # same ckey, other parent
    ]
    got = sorted(tuple(r) for r in referential_check(rels).collect())
    want = sorted(tuple(r) for r in _legacy_referential_check(rels).collect())
    assert got == want
    # the schema contract is unchanged
    assert referential_check(rels).columns == [
        "relation", "n_child_rows", "n_orphans", "passed"
    ]
