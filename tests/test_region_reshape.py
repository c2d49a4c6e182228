"""Region subset, datashade, wide↔long reshaping — mirrors
/root/reference/deepicedrain/tests/test_region.py:96-118 and
tests/test_wide_to_long.py:20-34 micro-fixtures."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from deepicedrain_spark.region import Region
from deepicedrain_spark.functions.reshape import long_to_wide, wide_to_long
from deepicedrain_spark.operators.aggregates import nanrange_wide


def test_region_subset_counts(spark):
    # 50 points on a diagonal, x∈[−200,200], y∈[−160,160]; bbox ±100 → 24
    n = 50
    rows = [
        Row(x=-200 + 400 * i / (n - 1), y=-160 + 320 * i / (n - 1)) for i in range(n)
    ]
    df = spark.createDataFrame(rows)
    region = Region("t", -100.0, 100.0, -100.0, 100.0)
    assert region.subset(df).count() == 24


def test_datashade_grid(spark):
    rows = [Row(x=float(i % 10) + 0.5, y=float(i // 10) + 0.5, z=1.0) for i in range(100)]
    df = spark.createDataFrame(rows)
    region = Region("g", 0.0, 10.0, 0.0, 10.0)
    cells = region.datashade(df, width=10, height=10).collect()
    assert len(cells) == 100
    assert all(math.isclose(c["z_mean"], 1.0) for c in cells)
    assert all(c["n"] == 1 for c in cells)


def test_wide_to_long_dropna(spark):
    # 12 points × 3 cycles with one NaN → 36-1 = 35 long rows
    rows = []
    for i in range(12):
        rows.append(
            Row(
                id=i,
                h_corr_1=float(i),
                h_corr_2=float(i) + 1 if i != 5 else None,
                h_corr_3=float(i) + 2,
                utc_time_1=1.0,
                utc_time_2=2.0 if i != 5 else None,
                utc_time_3=3.0,
            )
        )
    df = spark.createDataFrame(rows)
    long = wide_to_long(df, ["h_corr", "utc_time"], i=["id"])
    assert long.count() == 35
    assert set(long.columns) == {"id", "cycle_number", "h_corr", "utc_time"}
    # and back: pivot wide again
    wide = long_to_wide(long, ["id"], "cycle_number", ["h_corr", "utc_time"], cycles=[1, 2, 3])
    assert wide.count() == 12
    assert "h_corr_2" in wide.columns and "utc_time_3" in wide.columns


def test_nanrange_wide(spark):
    # reference nanptp fixture: [123, 231, NaN, 312, 213] → 189
    df = spark.createDataFrame(
        [(123.0, 231.0, None, 312.0, 213.0)],
        "a double, b double, c double, d double, e double",
    )
    out = df.select(nanrange_wide(["a", "b", "c", "d", "e"]).alias("r")).collect()
    assert out[0]["r"] == 189.0


def test_wide_to_long_dropna_any_semantics(spark):
    """Review finding r4: dropna matches the reference's pandas
    dropna(how='any') — a row with ANY null stub is dropped, not only
    all-null rows."""
    from deepicedrain_spark.functions.reshape import wide_to_long

    df = spark.createDataFrame(
        [(1, 5.0, 100.0, None, None, 7.0, None)],
        "id long, h_corr_1 double, utc_time_1 double, "
        "h_corr_2 double, utc_time_2 double, h_corr_3 double, utc_time_3 double",
    )
    rows = wide_to_long(df, ["h_corr", "utc_time"], i=["id"]).collect()
    # cycle 1: both present -> kept; cycle 2: both null -> dropped;
    # cycle 3: h_corr present but utc_time null -> DROPPED (how='any')
    assert [(r["cycle_number"]) for r in rows] == [1]
