"""dhdt pipeline — rate-of-height-change per point (SURVEY §3.1).

Reference: /root/reference/atlxi_dhdt.py — the flagship notebook:
open 1387 Zarr stores (~220 M points × ≤9 cycles), drop points with
<2 valid heights (:111), compute h_range (:166-178), keep range>0.25 m
(:248-251), run per-point linear regression over cycles (:255-280,
slope × ns-per-year → dhdt_slope m/yr), write a wide parquet extract
(:390-406).

Spark trace (§3.1): ONE declarative plan — read → window-count filter
→ grouped regr_* aggregation → unit scale → write. The only shuffle is
keyed on the point id and is shared by the null-threshold window and
the regression aggregate (same partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deepicedrain_spark.functions.timeutils import slope_per_ns_to_per_year
from deepicedrain_spark.operators.regression import linregress_aggs

H_RANGE_FLOOR = 0.25  # m — reference atlxi_dhdt.py:248-251
MIN_VALID_CYCLES = 2  # reference atlxi_dhdt.py:111


def compute_dhdt(
    points: DataFrame,
    point_cols: list[str] = ("ref_pt", "referencegroundtrack", "pairtrack"),
    h: str = "h_corr",
    t_ns: str = "delta_time_ns",
    min_valid: int = MIN_VALID_CYCLES,
    range_floor: float = H_RANGE_FLOOR,
) -> DataFrame:
    """Long-format points (one row per point per cycle) → one row per
    point with (n, h_range, dhdt_slope m/yr, intercept, rvalue, stderr,
    mean x/y)."""
    point_cols = list(point_cols)
    w = Window.partitionBy(*point_cols)

    filtered = (
        points.withColumn("_nvalid", F.count(h).over(w))
        .filter(F.col("_nvalid") >= min_valid)
        .withColumn("_hrange", F.max(h).over(w) - F.min(h).over(w))
        .filter(F.col("_hrange") > range_floor)
    )

    out = filtered.groupBy(*point_cols).agg(
        F.first("_hrange").alias("h_range"),
        F.avg("x").alias("x"),
        F.avg("y").alias("y"),
        *linregress_aggs(h, t_ns),
    )
    return (
        out.withColumn("dhdt_slope", slope_per_ns_to_per_year(F.col("slope")))
        .withColumnRenamed("intercept", "dhdt_intercept")
        .drop("slope")
    )
