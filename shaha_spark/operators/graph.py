"""Iterative graph analytics: deterministic fixed-point PageRank.

Complements the connected-components pass (components.py): CC tells
you WHICH documents form a near-duplicate cluster, PageRank scores how
CENTRAL each document is in the candidate graph — a useful signal for
choosing cluster representatives (keep the hub, drop satellites).

Determinism is the hard part of distributed PageRank: float
contributions summed in shuffle order drift run-to-run and
engine-to-engine. Here ranks live in 64-bit FIXED-POINT (units of
1e-12): contributions divide with integer DIV, damping applies as
``(85 * x) DIV 100``, and sums are exact integer sums — bit-identical
on any engine, any partitioning, making the whole iterative
computation oracle-checkable with chained CTEs.

Scale shape per iteration: one shuffle to aggregate contributions by
target plus one join back to the node list (both hash, map-side
partials); plans stay one-iteration-deep via localCheckpoint, exactly
like the k-means loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: 1.0 == 10^12 units
PR_SCALE = 1_000_000_000_000

#: damping factor as an integer percentage (0.85)
PR_DAMP_PCT = 85


def pagerank_fixed(
    edges: DataFrame,
    iterations: int = 3,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """PageRank over the UNDIRECTED graph of ``edges`` (each input pair
    contributes both directions), restricted to nodes with at least one
    edge. Returns [node, rank_fp] with rank_fp in PR_SCALE units; ranks
    of isolated documents are undefined here by construction (score
    them 1/N downstream if needed).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    directed = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = directed.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = outdeg.select(F.col("src").alias("node"), "outdeg")
    n_nodes = nodes.count()
    if n_nodes == 0:
        # no edges -> no ranked nodes; an empty frame with the output
        # schema, not a ZeroDivisionError in the driver
        return nodes.select("node", F.lit(0).cast("long").alias("rank_fp")).limit(0)
    base = PR_SCALE // n_nodes
    teleport = (15 * base) // 100
    ranks = nodes.select(
        "node", "outdeg", F.lit(base).cast("long").alias("rank_fp")
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        contrib = (
            ranks.join(directed, ranks.node == directed.src)
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_fp DIV outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                "outdeg",
                (
                    F.lit(teleport)
                    + F.expr(f"({PR_DAMP_PCT} * coalesce(in_sum, 0)) DIV 100")
                ).cast("long").alias("rank_fp"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "rank_fp")


def pagerank_fixed_sql(edges_cte: str, iterations: int = 3) -> str:
    """DuckDB oracle twin: the same fixed-point iterations as chained
    CTEs. ``edges_cte`` must define ``pr_edges(id_a, id_b)``."""
    parts = [
        edges_cte,
        """directed AS (
  SELECT id_a AS src, id_b AS dst FROM pr_edges
  UNION
  SELECT id_b AS src, id_a AS dst FROM pr_edges
)""",
        "outdeg AS (SELECT src AS node, count(*) AS outdeg FROM directed GROUP BY 1)",
        "nn AS (SELECT count(*) AS n FROM outdeg)",
        f"r0 AS (SELECT node, outdeg, CAST({PR_SCALE} // nn.n AS BIGINT) AS rank_fp FROM outdeg, nn)",
    ]
    for i in range(iterations):
        parts.append(f"""c{i} AS (
  SELECT d.dst AS node, SUM(r.rank_fp // r.outdeg) AS in_sum
  FROM r{i} r JOIN directed d ON r.node = d.src
  GROUP BY 1
)""")
        parts.append(f"""r{i + 1} AS (
  SELECT o.node, o.outdeg,
    CAST((15 * ({PR_SCALE} // nn.n)) // 100
         + ({PR_DAMP_PCT} * coalesce(c.in_sum, 0)) // 100 AS BIGINT) AS rank_fp
  FROM outdeg o LEFT JOIN c{i} c ON o.node = c.node CROSS JOIN nn
)""")
    body = ",\n".join(parts)
    return f"WITH {body}\nSELECT node, rank_fp FROM r{iterations}"


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle count of an undirected graph — one row
    [n_triangles, n_nodes, n_edges].

    Classic degree-ORIENTED enumeration: every undirected edge is
    directed from its lower-(degree, id) endpoint to the higher one,
    which makes the oriented out-degree of ANY node O(√m) on graphs
    with bounded arboricity — so the wedge join (e1.dst = e2.src)
    generates O(m^1.5) candidates worst case instead of the
    Σ degree² blowup a hub node causes in the naive direction. Each
    triangle is then counted exactly once by the closing-edge
    semi-join. Three shuffles total (degree agg, wedge join, closing
    join) — the textbook distributed plan (cf. Suri & Vassilvitskii's
    MapReduce formulation).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        # consumed by deg, keyed, and the final edge count: without
        # materialization the scan + dedup shuffle re-runs per branch
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionByName(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    keyed = e.join(da, "a").join(db, "b")
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = keyed.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        # three consumers (both wedge legs + the closing semi-join)
    ).localCheckpoint(eager=True)
    w1 = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    w2 = oriented.select(F.col("u").alias("y"), F.col("v").alias("z"))
    wedges = w1.join(w2, "y").select("x", "y", "z")
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tris = wedges.join(closing, ["x", "z"], "left_semi")
    return (
        tris.agg(F.count(F.lit(1)).alias("n_triangles"))
        .crossJoin(deg.agg(F.count(F.lit(1)).alias("n_nodes")))
        .crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))
        .select(
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("n_edges").cast("bigint").alias("n_edges"),
        )
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
) -> DataFrame:
    """Nodes of the k-core: the maximal subgraph where every node has
    degree ≥ k WITHIN the subgraph — the web-graph quality/spam screen
    (low-core pages are link-poor periphery; dense cores are link
    farms or genuine hubs worth separate treatment).

    Iterative peeling, same driver-loop shape as connected_components:
    drop nodes below degree k, recompute degrees on the induced
    subgraph, repeat to fixpoint (localCheckpoint per iteration keeps
    lineages shallow); each iteration is one degree aggregation + two
    semi-joins. Correctness contract: the exact bounded-recursion
    DuckDB oracle :func:`k_core_peel_sql` (a recursive CTE peeling the
    same fixpoint with a poison-row guard — driver-verified green in
    r06), plus the invariant pair asserted in tests: every surviving
    node has ≥ k surviving neighbors, and no dropped node would have
    ≥ k inside the survivor set.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # carry the previous round's edge count instead of re-counting the
    # old checkpoint every iteration (optimization round 12: one count
    # job per round, not two; pruned ⊆ e, so count equality is set
    # equality)
    n_e = e.count()
    for _ in range(max_iters):
        deg = (
            e.select(F.col("a").alias("n"))
            .unionByName(e.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("n")
        pruned = (
            e.join(keep.select(F.col("n").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("n").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
        n_p = pruned.count()
        if n_p == n_e:
            e = pruned
            break
        e = pruned
        n_e = n_p
    else:
        # falling through the loop means the last pass still removed
        # edges: the survivor set is NOT a k-core, and returning it as
        # one would violate the documented invariant silently
        raise RuntimeError(
            f"k_core did not reach the peeling fixpoint in {max_iters} "
            "iterations; raise max_iters (cascading peels need up to "
            "O(nodes) rounds on path-like graphs)"
        )
    return (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )


def k_core_peel_sql(edges_cte: str, k: int, max_iters: int = 40) -> str:
    """DuckDB twin of :func:`k_core`: bounded recursive peeling with a
    LOUD fixpoint guard.

    The peel's iteration count is data-dependent, but a recursive CTE
    carries the FULL survivor set per iteration (DuckDB's working
    table is exactly the previous iteration's rows), so a bounded
    recursion reaches any fixpoint within ``max_iters`` — and when it
    does NOT converge, the guard emits an impossible ``node = -1`` row
    so the cross-engine hash comparison fails loudly instead of
    silently blessing a non-core (the same contract as the Spark
    side's RuntimeError). An EMPTY survivor set is always a fixpoint
    of peeling (peeling nothing yields nothing), so an empty
    ``last_set`` converges by definition even when ``prev_set`` was
    nonempty — the guard must not poison that case. ``edges_cte``
    must define ``e(a, b)`` with ``a < b``, deduplicated.

    Cost note: each iteration re-emits the full survivor set (the
    working table never empties once a stable core exists), so the
    recursion always runs all ``max_iters`` iterations even after
    early convergence. Each iteration is one hash join + group-by
    over the survivor set — acceptable for an ORACLE (driver runs it
    at sf0.01); the production path is :func:`k_core`, which stops at
    the data-dependent fixpoint.
    """
    return f"""WITH RECURSIVE {edges_cte},
und AS (SELECT a AS n, b AS m FROM e UNION ALL SELECT b, a FROM e),
peel(iter, node) AS (
  SELECT 0, n FROM (SELECT a AS n FROM e UNION SELECT b FROM e)
  UNION ALL
  SELECT p.iter + 1, d.n
  FROM (
    SELECT x.n, count(*) AS deg
    FROM und x
    JOIN peel pp ON pp.node = x.n
    JOIN peel p2 ON p2.node = x.m
    GROUP BY x.n
  ) d, (SELECT max(iter) AS iter FROM peel) p
  WHERE d.deg >= {k} AND p.iter < {max_iters}
),
last_set AS (SELECT node FROM peel WHERE iter = {max_iters}),
prev_set AS (SELECT node FROM peel WHERE iter = {max_iters - 1}),
unconverged AS (
  SELECT count(*) AS c FROM (
    (SELECT node FROM last_set EXCEPT SELECT node FROM prev_set)
    UNION ALL
    (SELECT node FROM prev_set EXCEPT SELECT node FROM last_set)
  )
)
SELECT CAST(node AS BIGINT) AS node FROM last_set
UNION ALL
SELECT CAST(-1 AS BIGINT) AS node FROM unconverged
WHERE c > 0 AND EXISTS (SELECT 1 FROM last_set)"""
