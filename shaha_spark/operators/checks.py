"""Data-quality expectations: declarative rule checks in ONE pass.

A training-data pipeline gates every ingest on invariants (no nulls in
keys, domains, ranges); evaluating each rule as its own query re-scans
the table per rule. Here all rules fold into a single aggregation —
one scan, one job, whatever the rule count — and the per-rule report
is exploded from that one row, mirroring ``table_profile``'s shape.

A row violates a rule when the rule's predicate is NOT satisfied —
including when the predicate evaluates to NULL (an unknown is a
failure, the conservative gate a pipeline wants).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per rule: [rule, n_rows, n_violations, passed].

    ``rules`` maps rule name → boolean Column; iteration is sorted by
    name so the plan (and any cached result) is stable across runs.
    """
    if not rules:
        raise ValueError("check_rules requires at least one rule")
    names = sorted(rules)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, name in enumerate(names):
        aggs.append(
            F.sum(F.when(rules[name], 0).otherwise(1)).alias(f"_v{i}")
        )
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("_n").alias("n_rows"),
            F.col(f"_v{i}").alias("n_violations"),
            (F.col(f"_v{i}") == 0).cast("int").alias("passed"),
        )
        for i, name in enumerate(names)
    ]
    return one.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def check_rules_sql(table: str, rules: dict[str, str]) -> str:
    """DuckDB oracle twin: the same one-pass aggregation (FILTER
    clauses) exploded by UNION ALL arms. Rule SQL must evaluate NULL
    predicates as violations, matching the Spark side — wrap nullable
    predicates in ``coalesce(pred, FALSE)`` semantics, which the
    generated ``NOT coalesce(...)`` here applies uniformly.
    """
    names = sorted(rules)
    viol_cols = ",\n    ".join(
        f"count(*) FILTER (WHERE NOT coalesce(({rules[name]}), FALSE)) AS v{i}"
        for i, name in enumerate(names)
    )
    arms = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS rule, n AS n_rows, v{i} AS n_violations, "
        f"CAST(v{i} = 0 AS INTEGER) AS passed FROM s"
        for i, name in enumerate(names)
    )
    return f"""WITH s AS (
  SELECT count(*) AS n,
    {viol_cols}
  FROM {table}
)
{arms}"""


def referential_check(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key orphan report: one row per relation
    [relation, n_child_rows, n_orphans, passed].

    ``relations`` is [(name, child_df, child_key, parent_df,
    parent_key)]. Each check is ONE pass over the child: a LEFT join
    against the parent's DISTINCT key projection (no fan-out — the
    build side is distinct; column-pruned at the scan, broadcast by
    Catalyst when small) feeding a single aggregate that counts rows
    and unmatched rows together. The previous two-pass form (separate
    count + anti-join) scanned every child table twice. Results union
    into one report; each relation's subtree stays independent, so
    Spark runs them as parallel stages of one job.
    """
    if not relations:
        raise ValueError("referential_check requires at least one relation")
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
                # coalesce: SUM over an empty child is NULL, but the
                # report's contract (and the old anti-join count) is 0
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
