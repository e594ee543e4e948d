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

Two trainer tiers by feature dimension:

  * :func:`logreg_train` — the weight vector rides in the plan as a
    literal array and the model collects to the driver per iteration.
    Right up to ~10^5 features (the plan ships once per stage, not per
    row).
  * :func:`logreg_train_distributed` / :func:`logreg_score_joined` —
    the model stays a ``[idx, w]`` DataFrame end to end (fastText-scale
    bucket counts, 10^6+): margins and gradients are idx/doc-keyed
    joins + hash-aggs, the update is a model-sized join, and NOTHING
    model-sized ever crosses to the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from shaha_spark.functions.text import h28, tokens
from shaha_spark.operators.profile import split_cast_double


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
    from shaha_spark.util import ensure_parallelism

    if dim < 2:
        raise ValueError(f"dim must be >= 2, got {dim}")
    docs = ensure_parallelism(docs)
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
            # gradient sums grow with n: unscaled (scale 9) crosses
            # 2^53 near n ~ 9e6 docs — split-cast keeps the collected
            # model bit-stable against any decimal->double path
            .agg(split_cast_double(F.sum("g"), 9).alias("g"))
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


def _exploded(feat_df, label_col: str, feats_col: str, id_col: str):
    """(id, label, idx, val) rows with the bias term prepended as
    idx = -1, val = 1 — the shared input of both distributed passes."""
    return feat_df.select(
        F.col(id_col),
        F.col(label_col).cast("double").alias("__y"),
        F.explode(
            F.concat(
                F.array(
                    F.struct(F.lit(-1).alias("idx"), F.lit(1.0).alias("val"))
                ),
                F.col(feats_col),
            )
        ).alias("__p"),
    ).select(
        id_col, "__y", F.col("__p.idx").alias("idx"), F.col("__p.val").alias("val")
    )


def logreg_train_distributed(
    feat_df: DataFrame,
    dim: int,
    label_col: str = "label",
    feats_col: str = "feats",
    id_col: str = "doc_id",
    iters: int = 20,
    lr: float = 1.0,
    l2: float = 0.0,
) -> DataFrame:
    """The fastText-bucket-scale trainer: the model LIVES as a
    DataFrame ``[idx, w]`` (bias at idx = -1) for the whole run —
    nothing model-sized ever crosses to the driver, so ``dim`` can be
    millions of hashed buckets. Returns the weights DataFrame.

    Per iteration (the kmeans execution pattern — driver holds loop
    control only, weights localCheckpoint between steps so plan depth
    stays constant):

      1. margins: exploded features join the weight table on idx (AQE
         broadcasts it while it fits, shuffles on idx beyond that),
         then one doc-keyed hash-agg;
      2. gradient: per-doc errors join back to the exploded features on
         the doc id, then one idx-keyed hash-agg of at most dim + 1
         groups;
      3. update: weights left-join the gradient — a model-sized join,
         never a collect.

    Determinism: BOTH reductions sum 9-decimal-rounded DECIMAL
    contributions (margins too — unlike :func:`logreg_train`, whose
    margin is a per-row sequential fold and needs no rounding), so the
    trained model is bit-stable under any partitioning. The two
    trainers therefore agree to float tolerance, not bit-exactly.

    The exploded feature table is checkpointed once up front: it is
    scanned twice per iteration and its lineage must not deepen.
    """
    spark = feat_df.sparkSession
    n = feat_df.count()
    if n == 0:
        raise ValueError("empty training set")
    ex = _exploded(feat_df, label_col, feats_col, id_col).localCheckpoint(
        eager=True
    )
    w = (
        spark.range(dim)
        .select((F.col("id").cast("int") ).alias("idx"), F.lit(0.0).alias("w"))
        .unionByName(
            spark.createDataFrame([(-1, 0.0)], "idx int, w double")
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        margins = (
            ex.join(w, "idx")
            .select(
                id_col,
                "__y",
                F.round(F.col("val") * F.col("w"), 9)
                .cast("decimal(28,9)")
                .alias("__c"),
            )
            .groupBy(id_col, "__y")
            .agg(split_cast_double(F.sum("__c"), 9).alias("__m"))
        )
        errs = margins.select(
            id_col,
            (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__m"))) - F.col("__y")
            ).alias("__err"),
        )
        grad = (
            ex.join(errs, id_col)
            .select(
                "idx",
                F.round(F.col("val") * F.col("__err"), 9)
                .cast("decimal(28,9)")
                .alias("__g"),
            )
            .groupBy("idx")
            .agg(
                (split_cast_double(F.sum("__g"), 9) / F.lit(float(n))).alias(
                    "__g"
                )
            )
        )
        w = (
            w.join(grad, "idx", "left")
            .select(
                "idx",
                (
                    F.col("w")
                    - F.lit(lr)
                    * (
                        F.coalesce(F.col("__g"), F.lit(0.0))
                        + F.lit(l2)
                        * F.when(F.col("idx") >= 0, F.col("w")).otherwise(0.0)
                    )
                ).alias("w"),
            )
            .localCheckpoint(eager=True)
        )
    return w


def logreg_score_joined(
    feat_df: DataFrame,
    weights: DataFrame,
    feats_col: str = "feats",
    id_col: str = "doc_id",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Score against a DataFrame model (the huge-dim companion of
    :func:`logreg_score`): exploded features join the weight table,
    decimal-summed per doc, sigmoid at the end. Docs with no features
    still score (bias-only)."""
    ex = feat_df.select(
        F.col(id_col),
        F.explode(
            F.concat(
                F.array(
                    F.struct(F.lit(-1).alias("idx"), F.lit(1.0).alias("val"))
                ),
                F.col(feats_col),
            )
        ).alias("__p"),
    ).select(id_col, F.col("__p.idx").alias("idx"), F.col("__p.val").alias("val"))
    margins = (
        ex.join(weights, "idx")
        .select(
            id_col,
            F.round(F.col("val") * F.col("w"), 9)
            .cast("decimal(28,9)")
            .alias("__c"),
        )
        .groupBy(id_col)
        .agg(split_cast_double(F.sum("__c"), 9).alias("__m"))
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__m")))
    return feat_df.join(margins, id_col, "left").withColumn(
        out_col, prob
    ).drop("__m")


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


def classification_report(
    scored: DataFrame,
    label_col: str,
    prob_col: str = "quality_prob",
    threshold: float = 0.5,
) -> DataFrame:
    """Confusion matrix + precision/recall/F1 at a decision threshold —
    one row, one aggregation pass (the counts are conditional sums, so
    the whole report is a single map-side-combining hash-agg over the
    scored table; no per-class scans).

    Counts are exact integers; each ratio is one correctly-rounded
    division of exact integers (F1 uses the 2·TP/(2·TP+FP+FN) form —
    a SINGLE division, unlike the harmonic-mean-of-ratios form whose
    intermediate roundings engines could order differently), rounded
    to 9 decimals. Empty denominators report 0.0, not NULL.
    """
    pred = F.col(prob_col) >= F.lit(threshold)
    lab = F.col(label_col).cast("boolean")
    agg = scored.agg(
        F.sum(F.when(pred & lab, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(pred & ~lab, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~pred & lab, 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~pred & ~lab, 1).otherwise(0)).alias("tn"),
    )

    def ratio(num, den):
        return F.when(den == 0, F.lit(0.0)).otherwise(
            F.round(num.cast("double") / den.cast("double"), 9)
        )

    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return agg.select(
        tp.cast("bigint").alias("tp"),
        fp.cast("bigint").alias("fp"),
        fn.cast("bigint").alias("fn"),
        tn.cast("bigint").alias("tn"),
        ratio(tp, tp + fp).alias("precision"),
        ratio(tp, tp + fn).alias("recall"),
        ratio(F.lit(2) * tp, F.lit(2) * tp + fp + fn).alias("f1"),
        ratio(tp + tn, tp + fp + fn + tn).alias("accuracy"),
    )


def calibration_bins(
    scored: DataFrame,
    label_col: str,
    prob_col: str = "quality_prob",
    bins: int = 10,
) -> DataFrame:
    """Reliability-diagram table: equal-WIDTH probability bins
    (bin = floor(p·bins), clamped) with mean predicted probability vs
    observed positive rate per bin — the calibration check every
    quality-classifier gate needs before its threshold means anything.

    Equal-width (not equal-population/ntile) is deliberate: an ntile
    needs a GLOBAL sort through one partition — a scale wall — while
    the width bin is a codegen'd projection and the only shuffle is
    the |bins|-key aggregation. Determinism: floor of an exact-input
    multiply, decimal-exact sums of the scorer's already-rounded
    probabilities, one division per ratio.
    """
    binned = scored.select(
        F.col(prob_col),
        F.col(label_col).cast("boolean").alias("__lab"),
        F.least(
            F.lit(bins - 1),
            F.floor(F.col(prob_col) * F.lit(float(bins))).cast("int"),
        ).alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.col(prob_col), 6).cast("decimal(16,6)")
            ).alias("__psum"),
            F.sum(F.when(F.col("__lab"), 1).otherwise(0)).alias("__pos"),
        )
        .select(
            F.col("bin").cast("bigint").alias("bin"),
            F.col("n").cast("bigint").alias("n"),
            F.round(
                split_cast_double(F.col("__psum"), 6) / F.col("n"), 9
            ).alias("mean_prob"),
            F.round(
                F.col("__pos").cast("double") / F.col("n").cast("double"), 9
            ).alias("pos_rate"),
        )
    )


def roc_auc(
    scored: DataFrame,
    label_col: str,
    prob_col: str = "quality_prob",
) -> DataFrame:
    """EXACT area under the ROC curve (probability a random positive
    outranks a random negative, ties at half credit) — one row
    [auc, n_pos, n_neg].

    Scale shape: the rank-sum formulation needs global ranks, which a
    naive window computes in ONE partition — a scale wall. Instead
    scores are ROUNDED TO 6 DECIMALS HERE (not trusted to be pre-
    rounded — full-precision doubles would make the bucket table ~one
    row per distinct margin, i.e. O(n), defeating the design) and
    aggregate to per-distinct-score buckets, capping the bucket table
    at ~2·10^6 rows regardless of input size; the cumulative negative
    count then runs over the BUCKET table, exactly like
    cumulative_distinct's calendar-sized window. AUC is recovered as

        auc = Σ_b n_pos_b · (2·cumneg_below_b + n_neg_b) / (2·P·N)

    — every term an exact integer (the ×2 absorbs the half-credit tie
    term), accumulated as DECIMAL(38,0) (the bigint bound 2·P·N
    overflows int64 once P·N > 4.6·10^18 — reachable at the 10^10-row
    scale this operator targets), with ONE final correctly-rounded
    division, rounded to 9 decimals. Bit-deterministic at any
    partitioning; degenerate inputs (no positives or no negatives)
    report auc = 0.0 rather than null.
    """
    lab = F.col(label_col).cast("boolean")
    buckets = scored.groupBy(F.round(F.col(prob_col), 6).alias("__p")).agg(
        F.sum(F.when(lab, 1).otherwise(0)).alias("__np"),
        F.sum(F.when(~lab, 1).otherwise(0)).alias("__nn"),
    )
    w = (
        Window.orderBy("__p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    contrib = buckets.select(
        "__np",
        "__nn",
        (
            F.col("__np").cast("decimal(19,0)")
            * (
                F.lit(2) * (F.sum("__nn").over(w) - F.col("__nn"))
                + F.col("__nn")
            ).cast("decimal(19,0)")
        ).alias("__num2"),
    )
    return contrib.agg(
        F.sum("__num2").alias("__num"),
        F.sum("__np").alias("__P"),
        F.sum("__nn").alias("__N"),
    ).select(
        F.when(
            (F.col("__P") == 0) | (F.col("__N") == 0), F.lit(0.0)
        )
        .otherwise(
            F.round(
                F.col("__num").cast("double")
                / (F.lit(2.0) * F.col("__P") * F.col("__N")).cast("double"),
                9,
            )
        )
        .alias("auc"),
        F.col("__P").cast("bigint").alias("n_pos"),
        F.col("__N").cast("bigint").alias("n_neg"),
    )


def isotonic_fit(
    scored: DataFrame,
    label_col: str,
    prob_col: str = "quality_prob",
    bins: int = 64,
) -> DataFrame:
    """Isotonic calibration (PAV) of a classifier score against a
    binary label, over equal-width score bins: per bin, the count,
    decimal-exact mean predicted probability, raw positive rate, and
    the ISOTONIC fit — the best monotone-non-decreasing approximation
    of the positive rate in weighted least squares. The standard
    calibration map when Platt's sigmoid is too rigid; `iso_fit`
    replaces the raw (possibly non-monotone) reliability curve of
    :func:`calibration_bins` as the score→probability lookup.

    Pool-adjacent-violators is an inherently sequential sweep — a
    driver loop at best, a scale wall at worst. This implementation
    uses the CLOSED FORM instead (Barlow-Bartholomew-Bremner-Brunk
    minimax characterization):

        fit_i = max_{j<=i} min_{k>=i} avg(pos rate over bins j..k)

    which is pure relational algebra over the BIN table. Binning
    first is what makes that affordable AND distributed: the fact
    table contributes ONE data-proportional hash aggregation (map-side
    partials, same shape as calibration_bins), and the minimax runs
    over at most ``bins`` rows — the O(bins³) candidate triples
    (≤ 64³ ≈ 2.6e5) are a broadcast-sized self-join, constant in the
    data size. No driver loop, no iteration, no global sort.

    Determinism: interval averages are single IEEE divisions of EXACT
    integer prefix sums (counts and 0/1-label sums, both < 2^53 by
    the bigint domain), so every candidate value is bit-identical
    across engines and min/max pick identical elements; the output
    rounds through the fixed 9-decimal recipe. NULL probabilities are
    excluded; empty bins simply don't appear (the fit is over observed
    bins — the same convention as calibration_bins).
    """
    lab = F.col(label_col).cast("boolean")
    binned = scored.where(F.col(prob_col).isNotNull()).select(
        F.col(prob_col),
        lab.alias("__lab"),
        F.least(
            F.lit(bins - 1),
            F.floor(F.col(prob_col) * F.lit(float(bins))).cast("int"),
        ).alias("bin"),
    )
    b = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("__lab"), 1).otherwise(0))
        .cast("bigint")
        .alias("__pos"),
        F.sum(F.round(F.col(prob_col), 6).cast("decimal(16,6)")).alias(
            "__psum"
        ),
    )
    w_pre = Window.orderBy(F.col("bin").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # ≤ bins rows from here on: the single-partition window and the
    # nested-loop self-joins below are bounded by the bin count, never
    # by the data (the documented small-n escape hatch, cf. dedup.py)
    # persist, NOT localCheckpoint: under AQE even a lazy
    # localCheckpoint materializes the subtree's shuffle stages at
    # DataFrame-construction time (getFinalPhysicalPlan runs the
    # exchanges), so building the fit would eagerly run the full
    # data-proportional scorer aggregation even if never consumed —
    # and the checkpoint boundary blinds the rescan lint (ROUND9.md
    # §7b; r9 ADVICE). The ≤`bins`-row table is trivially cache-sized;
    # the registration is released via shaha_spark.caching.release.
    pre = b.select(
        "bin",
        "n",
        "__pos",
        "__psum",
        F.sum("n").over(w_pre).cast("bigint").alias("__cumn"),
        F.sum("__pos").over(w_pre).cast("bigint").alias("__cump"),
    ).persist()
    j = pre.select(
        F.col("bin").alias("__bj"),
        (F.col("__cumn") - F.col("n")).alias("__lon"),
        (F.col("__cump") - F.col("__pos")).alias("__lop"),
    )
    k = pre.select(
        F.col("bin").alias("__bk"),
        F.col("__cumn").alias("__hin"),
        F.col("__cump").alias("__hip"),
    )
    pairs = j.join(F.broadcast(k), F.col("__bj") <= F.col("__bk")).select(
        "__bj",
        "__bk",
        (
            (F.col("__hip") - F.col("__lop")).cast("double")
            / (F.col("__hin") - F.col("__lon")).cast("double")
        ).alias("__a"),
    )
    mins = (
        pre.select(F.col("bin"))
        .join(
            F.broadcast(pairs),
            (F.col("__bj") <= F.col("bin")) & (F.col("__bk") >= F.col("bin")),
        )
        .groupBy("bin", "__bj")
        .agg(F.min("__a").alias("__m"))
    )
    iso = mins.groupBy("bin").agg(F.max("__m").alias("__fit"))
    from shaha_spark.caching import registers

    return registers(
        # iso is ≤ bins rows (the same boundedness argument as the
        # enrolled pairs/k broadcasts); without the hint the equi-join
        # plans sort-merge — two exchanges + sorts for a ≤64-row join
        # (optimization round 12)
        pre.join(F.broadcast(iso), "bin")
        .select(
            F.col("bin").cast("bigint").alias("bin"),
            "n",
            F.round(
                split_cast_double(F.col("__psum"), 6) / F.col("n"), 9
            ).alias("mean_prob"),
            F.round(
                F.col("__pos").cast("double") / F.col("n").cast("double"), 9
            ).alias("pos_rate"),
            F.round(F.col("__fit"), 9).alias("iso_fit"),
        ),
        pre,
    )


def isotonic_fit_sql(
    scored_table: str,
    label_col: str = "lab",
    prob_col: str = "p",
    bins: int = 64,
    prelude_ctes: str = "",
) -> str:
    """DuckDB oracle twin of :func:`isotonic_fit` — the same binning,
    the same exact integer prefix sums, the same minimax join shape,
    and the same single-division + round-9 IEEE sequence per
    candidate, so min/max select identical bit patterns.
    ``scored_table`` must expose ``{prob_col}`` (double in [0,1]) and
    boolean-castable ``{label_col}``; ``prelude_ctes`` splices caller
    CTEs (e.g. the shared scorer) ahead of the twin's own (pass
    WITHOUT the ``WITH`` keyword, WITH the trailing comma omitted)."""
    from shaha_spark.operators.profile import split_cast_double_sql

    prelude = f"{prelude_ctes},\n" if prelude_ctes else ""
    return f"""WITH {prelude}binned AS (
  SELECT {prob_col} AS p, CAST({label_col} AS BOOLEAN) AS lab,
         LEAST({bins - 1}, CAST(FLOOR({prob_col} * {float(bins)!r}) AS INTEGER)) AS bin
  FROM {scored_table} WHERE {prob_col} IS NOT NULL
),
b AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         SUM(CAST(round(p, 6) AS DECIMAL(16,6))) AS psum
  FROM binned GROUP BY bin
),
pre AS (
  SELECT bin, n, pos, psum,
         CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cumn,
         CAST(SUM(pos) OVER (ORDER BY bin) AS BIGINT) AS cump
  FROM b
),
pairs AS (
  SELECT j.bin AS bj, k.bin AS bk,
         CAST(k.cump - (j.cump - j.pos) AS DOUBLE)
           / CAST(k.cumn - (j.cumn - j.n) AS DOUBLE) AS a
  FROM pre j JOIN pre k ON j.bin <= k.bin
),
mins AS (
  SELECT i.bin, p.bj, MIN(p.a) AS m
  FROM pre i JOIN pairs p ON p.bj <= i.bin AND p.bk >= i.bin
  GROUP BY i.bin, p.bj
),
iso AS (SELECT bin, MAX(m) AS fit FROM mins GROUP BY bin)
SELECT pre.bin, pre.n,
  round({split_cast_double_sql('pre.psum', 6)} / pre.n, 9) AS mean_prob,
  round(CAST(pre.pos AS DOUBLE) / CAST(pre.n AS DOUBLE), 9) AS pos_rate,
  round(iso.fit, 9) AS iso_fit
FROM pre JOIN iso USING (bin)"""
