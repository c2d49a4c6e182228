"""Distributed quality-classifier training: logistic regression by
batch gradient descent over hashed-bigram features.

The trained-filter stage of modern LLM data pipelines (fastText-style
quality classifiers in CCNet/DCLM/FineWeb): score documents with a
tiny linear model whose features are hashed n-gram buckets, trained on
a weak label.  Reference engine has no model-training surface; this is
the natural Spark shape for it:

  - the feature table is ONE map-only pass per document (bucket counts
    as an in-row array of structs — no per-token rows leave the map);
  - each GD iteration is one job: per-doc logits fold the broadcast
    weight vector into the expression tree as a literal array
    (map-only), and the gradient is a single bucket-keyed aggregation
    collapsing map-side to B+1 rows;
  - driver state is O(B) per iteration (the weight vector), the
    k-means/``trained_centroids`` shape.

Cross-engine determinism (the DuckDB oracle replays training
iteration-for-iteration): every sum that could be order-sensitive is
computed in SCALED INTEGER space — weights live as ``w6 = round(w *
1e6)`` BIGINTs, logits are ``sum(cnt * w6)`` (exact, associative),
probabilities are rounded to 6 d.p. immediately after the one
transcendental (sigmoid), and gradients are ``sum(cnt * (p6*1e6 -
y*1e6))`` BIGINTs.  Floating point only ever appears in per-row
scalar expressions, never in a multi-row fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deepicedrain_spark.operators.sketches import md5_long60

#: global logit scale: z = sum(cnt * w) / Z_SCALE — a fixed stand-in
#: for per-doc length normalization that keeps the gradient sum in
#: exact integer space (a per-doc divisor would make each term a
#: non-terminating binary fraction).
Z_SCALE = 50.0


def hashed_bigram_features(
    docs: DataFrame,
    label: Column,
    b: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document feature rows: (id, y, feats) with ``feats`` an
    in-row array of (bucket, cnt) structs — md5-hashed bigram buckets
    in [0, b) plus the intercept as bucket ``b`` with cnt 1.  Map-only;
    bucket counting happens inside the row via the token array."""
    toks = "filter(split(text, ' '), x -> x != '')"
    bg = (
        f"transform(sequence(1, size(_w) - 1),"
        f" i -> concat(element_at(_w, i), ' ', element_at(_w, i + 1)))"
    )
    return (
        docs.select(
            F.col(id_col).alias("id"),
            label.cast("long").alias("y"),
            F.expr(toks.replace("text", text_col)).alias("_w"),
        )
        .select(
            "id",
            "y",
            F.when(F.size("_w") >= 2, F.expr(bg)).otherwise(
                F.expr("array()").cast("array<string>")
            ).alias("_bg"),
        )
        .select(
            "id",
            "y",
            F.transform("_bg", lambda s: md5_long60(s) % b).alias("_bkt"),
        )
        .select(
            "id",
            "y",
            F.concat(
                F.expr(
                    f"transform(array_sort(array_distinct(_bkt)),"
                    f" k -> struct(k AS bucket,"
                    f" CAST(size(filter(_bkt, x -> x = k)) AS BIGINT) AS cnt))"
                ),
                F.array(
                    F.struct(
                        F.lit(b).cast("long").alias("bucket"),
                        F.lit(1).cast("long").alias("cnt"),
                    )
                ),
            ).alias("feats"),
        )
    )


def _sigmoid_pm(zs: Column) -> Column:
    """Scaled-integer probability: sigmoid of the exact scaled logit,
    rounded to 6 d.p. immediately (the ONLY transcendental), then
    re-scaled to an exact BIGINT in [0, 1e6]."""
    z = zs.cast("double") / F.lit(1e6 * Z_SCALE)
    p6 = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return F.round(p6 * 1e6).cast("long")


def logreg_train(
    feats: DataFrame, b: int = 64, iters: int = 3, lr: float = 5.0
) -> list[int]:
    """Batch-GD logistic regression over a ``hashed_bigram_features``
    table; returns the final weight vector as scaled-integer ``w6``
    values (index = bucket, length b+1).

    Per iteration: one map-only logit/probability pass (weights folded
    in as a literal array) feeding one bucket-keyed gradient aggregate
    (B+1 rows collected — bounded driver state).  ``feats`` should be
    materialized by the caller if it is expensive to recompute."""
    import math

    def _half_away(x: float) -> int:
        # SQL round() semantics (away from zero); Python's round is
        # half-even and would diverge from the oracle on exact halves
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    n_docs = feats.count()
    if n_docs == 0:
        raise ValueError(
            "logreg_train: empty feature table — nothing to train on"
        )
    w6 = [0] * (b + 1)
    for _ in range(iters):
        w_lit = F.lit(w6)
        zs = F.aggregate(
            "feats",
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + s["cnt"] * F.element_at(w_lit, s["bucket"].cast("int") + 1),
        )
        scored = feats.select("y", "feats", _sigmoid_pm(zs).alias("pm")).select(
            "y", "pm", F.explode("feats").alias("f")
        )
        grad = (
            scored.groupBy(F.col("f.bucket").alias("bucket"))
            .agg(
                F.sum(
                    F.col("f.cnt") * (F.col("pm") - F.col("y") * F.lit(1_000_000))
                ).alias("gs")
            )
            .collect()
        )
        gs = {int(r["bucket"]): int(r["gs"]) for r in grad}
        # exact integer update, identical to the oracle's
        # w6 - round(lr * gs / (n * Z)): lr*gs is exact in double
        # (< 2^53), one division, one away-from-zero round
        w6 = [
            w6[k] - _half_away(lr * gs.get(k, 0) / (n_docs * Z_SCALE))
            for k in range(b + 1)
        ]
    return w6


def logreg_score(feats: DataFrame, w6: list[int]) -> DataFrame:
    """Map-only scoring: per-doc probability (6 d.p.), prediction, and
    correctness against the training label."""
    w_lit = F.lit(w6)
    zs = F.aggregate(
        "feats",
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + s["cnt"] * F.element_at(w_lit, s["bucket"].cast("int") + 1),
    )
    out = feats.select("id", "y", _sigmoid_pm(zs).alias("pm"))
    return out.select(
        "id",
        "y",
        (F.col("pm").cast("double") / 1e6).alias("p"),
        (F.col("pm") > 500_000).cast("long").alias("pred"),
        (
            ((F.col("pm") > 500_000).cast("long") == F.col("y")).cast("long")
        ).alias("correct"),
    )
