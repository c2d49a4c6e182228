"""Classifier-evaluation metrics computed distributed (beyond-reference
extension per BASELINE.json north star): exact ROC-AUC and a
precision/recall/F1 grid over score thresholds.

A training-data pipeline that trains quality classifiers
(operators/classifier.py) needs to EVALUATE them at corpus scale —
"collect scores to the driver and call sklearn" dies at 100 TB.

Scale shape: the one corpus-sized exchange is the per-score groupBy
(map-side combine applies — the combiner output is bounded by the
number of DISTINCT scores per partition). The ordered cumulative pass
that turns per-score (n_pos, n_neg) counts into the Mann–Whitney
numerator runs over the compressed distinct-score table, which is
orders of magnitude smaller than the corpus; for a score column with
unbounded cardinality, quantize scores first (the usual AUC-at-scale
trade) — this module computes the EXACT statistic and therefore keeps
the distinct-score pass.

Determinism: every intermediate is an exact integer (tie-aware
Mann–Whitney sums n_pos·(2·cum_neg_below + n_neg) of half-unit terms,
held doubled so it stays integral); the single final division is
bit-identical in any engine, and round(…, 6) on it is safe.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def roc_auc(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    by: list[str] | None = None,
) -> DataFrame:
    """Exact tie-corrected ROC-AUC from a (score, boolean label) frame.

    AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻), computed as the
    normalized Mann–Whitney U over per-score count pairs: one groupBy
    over the corpus, one ordered pass over distinct scores.

    With ``by`` (slice columns — per-source/per-language evaluation),
    the ordered pass is a window PARTITIONED on the slice keys, so it
    parallelizes across slices instead of the global single-partition
    sort; a slice with no positives or no negatives yields NULL auc
    (try_divide — AUC is undefined there).

    Output: one row (…by, n_pos, n_neg, auc, gini) per slice — auc
    rounded to 6, gini = 2·auc − 1.
    """
    by = list(by or [])
    per_score = scored.groupBy(*by, F.col(score_col).alias("s")).agg(
        F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col(label_col), 0).otherwise(1)).alias("nn"),
    )
    w = (
        (Window.partitionBy(*by) if by else Window)
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # 2·numerator keeps the ½-tie term integral: np·(2·cum_neg_below + nn).
    # Accumulated in DECIMAL(38,0): the numerator is bounded by
    # 2·n_pos·n_neg, which passes Long.MAX at ~2e9 positives × 2e9
    # negatives — exactly the corpus scale this module pitches (the
    # DuckDB oracle sums into HUGEINT; a long here would ANSI-abort or
    # silently wrap where the operator claims exactness)
    contrib = per_score.withColumn(
        "num2",
        F.col("np").cast("decimal(38,0)")
        * (F.lit(2) * F.coalesce(F.sum("nn").over(w), F.lit(0)) + F.col("nn")),
    )
    agg = contrib.groupBy(*by).agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.sum("num2").alias("num2"),
    )
    # both engines convert the exact integer numerator to its nearest
    # double before the one division — identical IEEE result
    auc = F.try_divide(
        F.col("num2").cast("double"), F.lit(2.0) * F.col("n_pos") * F.col("n_neg")
    )
    return agg.select(
        *by,
        "n_pos",
        "n_neg",
        F.round(auc, 6).alias("auc"),
        F.round(F.lit(2.0) * auc - F.lit(1.0), 6).alias("gini"),
    )


def pr_at_thresholds(
    scored: DataFrame,
    thresholds: Sequence[float] = (0.2, 0.4, 0.6, 0.8),
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Precision / recall / F1 at each threshold (predict positive when
    score ≥ t): ONE corpus pass — each row contributes to every
    threshold via an exploded literal array, then a 4-counter groupBy.

    Output: (threshold, tp, fp, fn, tn, precision, recall, f1), one
    row per threshold; ratios rounded to 6, NULL when undefined
    (try_divide — a threshold above every score has tp+fp = 0).
    """
    t = F.explode(F.array(*[F.lit(float(x)) for x in thresholds])).alias("threshold")
    pred = F.col("_s") >= F.col("threshold")
    lab = F.col("_lab")
    counts = (
        scored.select(F.col(score_col).alias("_s"), F.col(label_col).alias("_lab"), t)
        .groupBy("threshold")
        .agg(
            F.sum(F.when(pred & lab, 1).otherwise(0)).cast("long").alias("tp"),
            F.sum(F.when(pred & ~lab, 1).otherwise(0)).cast("long").alias("fp"),
            F.sum(F.when(~pred & lab, 1).otherwise(0)).cast("long").alias("fn"),
            F.sum(F.when(~pred & ~lab, 1).otherwise(0)).cast("long").alias("tn"),
        )
    )
    precision = F.try_divide(F.col("tp").cast("double"), (F.col("tp") + F.col("fp")))
    recall = F.try_divide(F.col("tp").cast("double"), (F.col("tp") + F.col("fn")))
    f1 = F.try_divide(
        F.lit(2.0) * F.col("tp"),
        (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
    )
    return counts.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    ).orderBy("threshold")
