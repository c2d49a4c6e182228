"""Binned range (interval) join — the second temporal join Spark has no
builtin for (extension beyond the reference surface; companion to
operators/asof.py — the reference's nearest analogue is again the
crossover time-pairing at /root/reference/atlxi_xover.py:134-146).

Semantics: inner-join each point row (a timestamp ``t``) to every
interval row whose ``[start, end]`` (both ends inclusive) contains it,
matching on optional equality keys first.

Why not just ``points.join(intervals, t BETWEEN s AND e)``: Spark plans
a pure inequality join as BroadcastNestedLoopJoin (fine only when one
side broadcasts) or a cartesian product — O(|P|·|I|) at cluster scale.

The scale path is the classic *binned* range join (the same strategy
Databricks' range-join optimization and Flink's interval join use):

  1. pick a bin width W (auto: p75 interval length, one scalar agg)
  2. explode each interval to the bin ids it covers
     (``sequence(floordiv(s,W), floordiv(e,W))``)
  3. map each point to its single bin id ``floordiv(t,W)``
  4. shuffle equi-join on (keys…, bin), post-filter ``s <= t <= e``

A (point, interval) pair meets in EXACTLY one bin — the point's — so
no dedup pass is needed. Cost: one shuffle of each side keyed by
(keys…, bin); the exploded interval side grows by the mean
``len/W + 1`` factor, which the W heuristic keeps ~2×. Hot bins (many
concurrent intervals) are plain equi-join skew, which AQE's skew-join
split handles — unlike the nested-loop plan, which has no skew story.

Bin-id arithmetic is exact integer math (``(x - pmod(x, W)) DIV W``),
NOT double division: epoch-ns values exceed 2^53 and would lose
precision through a double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _floordiv(col: str, w: int):
    # exact floor-division for 64-bit values (incl. negatives): subtract
    # the non-negative pmod first so the DIV operand is an exact multiple
    return F.expr(f"(`{col}` - pmod(`{col}`, {w})) DIV {w}")


def auto_bin_width(
    intervals: DataFrame, start_col: str, end_col: str
) -> tuple[int, int]:
    """Pick a bin width from the interval-length distribution: the p75
    length, so a typical interval explodes to ~2 bins. One scalar-row
    collect (same discipline as the crossover hot-cell auto-salt).
    Returns (width, max_length)."""
    row = intervals.filter(F.col(end_col) >= F.col(start_col)).select(
        F.expr(
            f"approx_percentile(`{end_col}` - `{start_col}`, 0.75)"
        ).alias("p75"),
        F.max(F.col(end_col) - F.col(start_col)).alias("mx"),
    ).first()
    if row is None or row["p75"] is None:
        return 1, 0
    return max(1, int(row["p75"])), int(row["mx"])


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    point_time: str,
    start_col: str,
    end_col: str,
    bin_width: int | None = None,
    max_bins_per_interval: int = 16384,
) -> DataFrame:
    """Inner range join: rows = (point columns…, interval columns…) for
    every pair with equal ``key_cols`` and ``start <= t <= end``
    (inclusive). Times are comparable integers (the engine's epoch-ns/µs
    longs). ``bin_width=None`` auto-tunes from the interval lengths.

    ``max_bins_per_interval`` guards runaway explosion: a single
    interval spanning more bins than this (e.g. an open-ended sentinel
    end time against a tight auto-tuned W) raises with guidance instead
    of silently materializing millions of rows per interval.
    """
    shared = (set(points.columns) & set(intervals.columns)) - set(key_cols)
    if shared:
        raise ValueError(
            f"interval_join_binned: columns {sorted(shared)} exist on both "
            "sides — rename one side first (only key_cols may be shared)"
        )
    taken = {"_bin"} & (set(points.columns) | set(intervals.columns))
    if taken:
        raise ValueError(
            "interval_join_binned: '_bin' is a reserved internal name — "
            "rename that column before joining"
        )
    if bin_width is None:
        bin_width, max_len = auto_bin_width(intervals, start_col, end_col)
        if max_len > max_bins_per_interval * bin_width:
            raise ValueError(
                f"interval_join_binned: longest interval ({max_len}) spans "
                f"> {max_bins_per_interval} auto-tuned bins of {bin_width} — "
                "pass an explicit bin_width sized to the long tail, or cap "
                "open-ended intervals before joining"
            )
    if bin_width < 1:
        raise ValueError("interval_join_binned: bin_width must be >= 1")
    # inverted intervals (end < start) match nothing by BETWEEN semantics,
    # but fed to sequence() they'd explode DESCENDING bin lists — drop them
    # up front; NULL bounds fall out the same way (sequence -> NULL,
    # explode emits no rows, matching SQL BETWEEN's null behavior)
    iv = intervals.filter(F.col(end_col) >= F.col(start_col)).withColumn(
        "_bin",
        F.explode(
            F.sequence(_floordiv(start_col, bin_width), _floordiv(end_col, bin_width))
        ),
    )
    pt = points.withColumn("_bin", _floordiv(point_time, bin_width))
    return (
        pt.join(iv, [*key_cols, "_bin"])
        .filter(
            (F.col(point_time) >= F.col(start_col))
            & (F.col(point_time) <= F.col(end_col))
        )
        .drop("_bin")
    )
