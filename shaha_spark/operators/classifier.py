"""Distributed quality-classifier training: logistic regression over
hashed bag-of-words features (the fastText-style quality filter used to
select web documents against a high-quality seed corpus).

Training-data-pipeline extension (no reference counterpart). The whole
data plane is declarative DataFrame ops, shaped for Spark:

  * features are a one-pass hashed projection — tokens hash to
    ``h28 % dim`` (the same cross-engine md5 primitive as the dedup
    family), tf-normalized per document, carried as a sorted sparse
    ``array<struct<idx,val>>`` so each row stays one record regardless
    of ``dim``;
  * each training iteration = one corpus scan: the margin ``w·x`` is an
    ``F.aggregate`` over the sparse pairs against the weight vector
    embedded as a broadcast literal (pure codegen, no join), and the
    gradient is an explode → per-feature hash-agg with map-side
    partials — one shuffle of at most ``dim`` groups per iteration;
  * the driver holds only the model (``dim + 1`` floats per iteration —
    the same model-sized materialization as kmeans centroids), never
    data rows;
  * determinism: per-row gradient contributions are rounded to 9
    decimals and summed as DECIMAL (order-free exact addition), so the
    fitted weights are bit-stable across partitionings, retries, and
    cluster sizes.

Scoring is a single shuffle-free projection; at 100 TB the scorer is
the hot path and it is whole-stage-codegen'd end to end.

Dim ceiling: the weight vector rides in the plan as a literal array,
which is the right call up to ~10^5 features (the plan ships once per
stage, not per row). For fastText-scale bucket counts (10^6+), switch
the margin to an exploded broadcast-join against a weights DataFrame —
that trades one extra doc-keyed shuffle per pass for an O(1)-size plan;
the gradient path needs no change (it already explodes).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shaha_spark.functions.text import h28, tokens


def hashed_features(
    docs: DataFrame,
    dim: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Sparse hashed tf features: one row per input doc with
    ``feats: array<struct<idx:int, val:double>>`` (idx-sorted, val =
    token count / doc length). Empty documents get an empty array.

    One explode + one (doc, idx) hash-agg + one doc hash-agg — two
    shuffles on the doc id, both with map-side combine.
    """
    if dim < 2:
        raise ValueError(f"dim must be >= 2, got {dim}")
    toks = docs.select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        F.explode(tokens(F.col(text_col))).alias("w"),
    ).withColumn("idx", (h28(F.col("w")) % dim).cast("int"))
    per_feat = toks.groupBy(id_col, *keep_cols, "idx").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = per_feat.groupBy(id_col, *keep_cols).agg(
        F.sum("c").alias("__n"),
        F.array_sort(F.collect_list(F.struct("idx", "c"))).alias("__pairs"),
    )
    feats = per_doc.select(
        id_col,
        *keep_cols,
        F.transform(
            "__pairs",
            lambda s: F.struct(
                s.getField("idx").alias("idx"),
                (s.getField("c").cast("double") / F.col("__n").cast("double")).alias(
                    "val"
                ),
            ),
        ).alias("feats"),
    )
    empty = F.expr("CAST(array() AS array<struct<idx:int,val:double>>)")
    return (
        docs.select(id_col, *keep_cols)
        .join(feats.select(id_col, "feats"), id_col, "left")
        .select(
            id_col, *keep_cols, F.coalesce(F.col("feats"), empty).alias("feats")
        )
    )


def _margin(feats_col: Column, weights: list[float], bias: float) -> Column:
    w_lit = F.lit([float(x) for x in weights])
    return (
        F.aggregate(
            feats_col,
            F.lit(0.0),
            lambda acc, s: acc
            + s.getField("val") * F.element_at(w_lit, s.getField("idx") + 1),
        )
        + F.lit(float(bias))
    )


def logreg_train(
    feat_df: DataFrame,
    dim: int,
    label_col: str = "label",
    feats_col: str = "feats",
    iters: int = 20,
    lr: float = 1.0,
    l2: float = 0.0,
) -> tuple[list[float], float]:
    """Full-batch gradient descent; returns ``(weights, bias)``.

    ``label_col`` must be 0/1. Each iteration runs ONE distributed job:
    margin + sigmoid in codegen, gradient contributions
    ``val * (sigma - y)`` rounded to 9 decimals, decimal-exact sum per
    feature index (plus the bias row at idx = -1), collected as at most
    ``dim + 1`` rows. The caller should cache ``feat_df`` — it is
    scanned once per iteration.
    """
    n = feat_df.count()
    if n == 0:
        raise ValueError("empty training set")
    w = [0.0] * dim
    b = 0.0
    for _ in range(iters):
        err = (
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-_margin(F.col(feats_col), w, b)))
            - F.col(label_col).cast("double")
        )
        rows = (
            feat_df.select(
                err.alias("__err"),
                F.explode(
                    F.concat(
                        F.array(
                            F.struct(
                                F.lit(-1).alias("idx"), F.lit(1.0).alias("val")
                            )
                        ),
                        F.col(feats_col),
                    )
                ).alias("p"),
            )
            .select(
                F.col("p.idx").alias("idx"),
                F.round(F.col("p.val") * F.col("__err"), 9)
                .cast("decimal(28,9)")
                .alias("g"),
            )
            .groupBy("idx")
            .agg(F.sum("g").cast("double").alias("g"))
            .collect()
        )
        grad = {r["idx"]: r["g"] for r in rows}
        b -= lr * (grad.get(-1, 0.0) / n)
        for i in range(dim):
            g = grad.get(i, 0.0) / n + l2 * w[i]
            if g:
                w[i] -= lr * g
    return w, b


def logreg_score(
    feat_df: DataFrame,
    weights: list[float],
    bias: float,
    feats_col: str = "feats",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append the model probability — a single shuffle-free codegen'd
    projection (the 100 TB hot path)."""
    prob = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-_margin(F.col(feats_col), weights, bias))
    )
    return feat_df.withColumn(out_col, prob)


def logreg_train_local(
    rows: list[tuple[list[tuple[int, float]], int]],
    dim: int,
    iters: int = 20,
    lr: float = 1.0,
    l2: float = 0.0,
) -> tuple[list[float], float]:
    """Pure-Python twin of :func:`logreg_train` for differential tests:
    identical update rule, including the 9-decimal contribution rounding
    (summed as exact integers of 1e-9 units)."""
    n = len(rows)
    w = [0.0] * dim
    b = 0.0
    for _ in range(iters):
        acc: dict[int, int] = {}
        for feats, y in rows:
            # accumulate in idx order then add the bias LAST — the exact
            # float-addition order of the Spark aggregate expression
            m = 0.0
            for i, v in sorted(feats):
                m += v * w[i]
            m += b
            err = 1.0 / (1.0 + math.exp(-m)) - y
            for i, v in [(-1, 1.0)] + list(feats):
                q = round(v * err, 9)
                acc[i] = acc.get(i, 0) + int(round(q * 1e9))
        b -= lr * (acc.get(-1, 0) / 1e9 / n)
        for i in range(dim):
            g = acc.get(i, 0) / 1e9 / n + l2 * w[i]
            if g:
                w[i] -= lr * g
    return w, b
