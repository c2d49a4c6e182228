"""As-of (point-in-time) join — a temporal join Spark has no builtin
for (extension beyond the reference surface; the reference's crossover
interpolation at /root/reference/atlxi_xover.py:134-146 is the nearest
analogue: per-track values sampled at another track's times).

For each left row, attach the latest right row of the same key with
``right_time <= left_time`` (backward as-of, the market-data /
feature-store semantics), optionally within a tolerance.

Implementation is the union-window formulation, NOT a join:

  union(left tagged 1, right tagged 0)
    -> window partitionBy(key) orderBy(t, side)
    -> last(right-payload struct, ignorenulls) over rows unbounded..current
    -> keep left rows

One shuffle on the key, no join state, O(1) running memory per key in
the window — at 100 TB this is a single exchange of both inputs keyed
by the join key, which beats any range-join strategy (no candidate
explosion, no per-row binary search structure). A right row sorts
BEFORE a left row at the same instant (side 0 < 1), giving inclusive
``<=`` semantics. The right payload rides in ONE struct so a null
value column inside a right row cannot make ``last(ignorenulls)`` skip
to an older row for just that column.

Skew note: a hot key serializes into one task; salt only if a single
key's history exceeds a task (same discipline as operators/scale.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tolerance: int | None = None,
    matched_time_alias: str = "asof_t",
) -> DataFrame:
    """Left as-of-backward join; times are comparable numerics (the
    engine's epoch-ns/µs longs). Returns all left columns plus
    ``value_cols`` and ``matched_time_alias`` (the matched right time),
    NULL where no right row precedes the left row (or none within
    ``tolerance`` time units). Ties among right rows at the same
    instant resolve to the greatest payload struct (deterministic; a
    clean input has unique (key, time) on the right)."""
    left_cols = left.columns
    # guard the internal/output namespace: overlapping value_cols would
    # silently produce duplicate output columns, and pre-existing
    # reserved names would collide with the union/window scaffolding
    overlap = set(value_cols) & set(left_cols)
    if overlap:
        raise ValueError(
            f"asof_join_backward: value_cols {sorted(overlap)} collide with "
            "left columns — rename one side first"
        )
    if "_t" in value_cols:
        raise ValueError(
            "asof_join_backward: '_t' is the payload's matched-time slot — "
            "rename that value column first"
        )
    if matched_time_alias in set(left_cols) | set(value_cols):
        raise ValueError(
            f"asof_join_backward: matched_time_alias {matched_time_alias!r} "
            "collides with an output column — pick another alias"
        )
    reserved = {"_r", "_side", "_ord_t", "_m"}
    taken = reserved & (set(left_cols) | set(right.columns))
    if taken:
        raise ValueError(
            f"asof_join_backward: columns {sorted(taken)} are reserved "
            "internal names — rename them before joining"
        )
    payload = F.struct(
        F.col(right_time).alias("_t"), *[F.col(c) for c in value_cols]
    )
    r = right.select(
        *key_cols,
        F.col(right_time).alias("_ord_t"),
        F.lit(0).alias("_side"),
        payload.alias("_r"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols if c not in key_cols],
    )
    l = left.select(
        *key_cols,
        F.col(left_time).alias("_ord_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        *[F.col(c) for c in left_cols if c not in key_cols],
    )
    # "_r" as the final sort key: two RIGHT rows at the same instant
    # would otherwise tie and last() would pick by shuffle order — the
    # struct comparison makes the winner the greatest payload,
    # deterministic across runs and partitionings
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_ord_t", "_side", F.col("_r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r).withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "_m",
            F.when(
                F.col("_ord_t") - F.col("_m._t") <= F.lit(tolerance), F.col("_m")
            ),
        )
    return out.select(
        *key_cols,
        *[F.col(c) for c in left_cols if c not in key_cols],
        *[F.col(f"_m.{c}").alias(c) for c in value_cols],
        F.col("_m._t").alias(matched_time_alias),
    )
