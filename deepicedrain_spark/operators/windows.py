"""Window / time-series operators (SURVEY W1-W5).

Reference: 91-day rolling mean/std at
/root/reference/deepicedrain/lake_algorithms.py:181-194, first-value
anomalies at /root/reference/atlxi_xover.py:293-294 and
lake_algorithms.py:184-185, argmax row at atlxi_xover.py:179-180, and
the composite ``ice_volume_over_time`` at lake_algorithms.py:76-227.

Spark-first: RANGE window frames over the epoch-seconds ordering give
the trailing time window without a self-join; partitioning by the
series key keeps each window local to one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

SECONDS_PER_DAY = 86_400


def _us_order(ts_col) -> Column:
    """Ordering column in epoch-µs: a str names a TimestampType column;
    a Column is taken as numeric µs already (ns-long data goes through
    timeutils.ns_to_us first — §1.3)."""
    return F.unix_micros(F.col(ts_col)) if isinstance(ts_col, str) else ts_col


def trailing_time_window(
    ts_col, days: int, partition_by: list[str] | None = None
) -> WindowSpec:
    """W1 frame: trailing ``days`` (inclusive) ordered by time."""
    w = Window.partitionBy(*(partition_by or []))
    return (
        w.orderBy(_us_order(ts_col))
        .rangeBetween(-days * SECONDS_PER_DAY * 1_000_000, 0)
    )


def rolling_mean_std(
    df: DataFrame,
    ts_col,
    value_col: str,
    days: int = 91,
    partition_by: list[str] | None = None,
    prefix: str | None = None,
) -> DataFrame:
    """W1: trailing mean/std over a day-range window (min_periods=1
    semantics: count≥1 always holds; std of a single row is NULL, the
    reference's pandas yields NaN — same null convention)."""
    p = prefix or value_col
    w = trailing_time_window(ts_col, days, partition_by)
    return df.withColumn(f"{p}_roll_mean", F.avg(value_col).over(w)).withColumn(
        f"{p}_roll_std", F.stddev(value_col).over(w)
    )


def anomaly_vs_first(
    df: DataFrame,
    ts_col,
    value_col: str,
    partition_by: list[str] | None = None,
    tiebreak: list[str] | None = None,
    out: str = "anom",
) -> DataFrame:
    """W2/W3: value minus first-in-time value per series (global when
    partition_by is empty). Deterministic ordering via tiebreak cols."""
    order = [_us_order(ts_col)] + [F.col(c) for c in (tiebreak or [])]
    w = (
        Window.partitionBy(*(partition_by or []))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.col(value_col) - F.first(value_col).over(w))


def top1_by(df: DataFrame, order: list[Column]) -> DataFrame:
    """W4: single extreme row (reference nanargmax). TakeOrdered — no
    full sort materialization."""
    return df.orderBy(*order).limit(1)


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group via row_number (ties broken by order cols —
    include a unique key for determinism)."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.lit(k))
        .drop("_rn")
    )


def ice_volume_over_time(
    df: DataFrame,
    ts_col,
    elev_col: str,
    surface_area_m2: float,
    rolling_days: int = 91,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """W5 composite (reference lake_algorithms.py:76-227):
    rolling mean/std of elevation → anomaly vs series start →
    dvol = surface_area × elev_anom (km³), with std-propagated
    uncertainty columns (pint units become explicit *_std columns —
    §1.3). Output: (ts, dh, dh_std, dvol_km3, dvol_std_km3)."""
    rolled = rolling_mean_std(df, ts_col, elev_col, rolling_days, partition_by, prefix="elev")
    anom = anomaly_vs_first(rolled, ts_col, "elev_roll_mean", partition_by, out="dh")
    m3_per_km3 = 1e9
    return anom.select(
        *(partition_by or []),
        (F.col(ts_col) if isinstance(ts_col, str) else ts_col).alias("t"),
        F.col("dh"),
        F.col("elev_roll_std").alias("dh_std"),
        (F.col("dh") * F.lit(surface_area_m2) / F.lit(m3_per_km3)).alias("dvol_km3"),
        (F.col("elev_roll_std") * F.lit(surface_area_m2) / F.lit(m3_per_km3)).alias("dvol_std_km3"),
    )
