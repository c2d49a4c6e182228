"""Time conversion goldens (reference
tests/test_spatiotemporal_conversions.py:20-27) and polar-stereographic
reprojection self-consistency (spatiotemporal.py:179-216)."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from deepicedrain_spark.functions.projection import lonlat_to_xy, xy_to_lonlat
from deepicedrain_spark.functions.timeutils import (
    deltatime_to_utctime,
    ns_to_us,
    us_of,
    utctime_to_deltans,
)


def test_deltatime_to_utctime_golden(spark):
    # reference golden: 24731275413287379 ns → 2018-10-14T05:47:55.413287379
    # (µs truncation documented in §1.3 → .413287)
    df = spark.createDataFrame([Row(delta_ns=24731275413287379)])
    out = df.select(
        deltatime_to_utctime(F.col("delta_ns")).alias("utc")
    ).collect()[0]["utc"]
    assert out.year == 2018 and out.month == 10 and out.day == 14
    assert out.hour == 5 and out.minute == 47 and out.second == 55
    assert out.microsecond == 413287


def test_deltans_roundtrip(spark):
    df = spark.createDataFrame([Row(delta_ns=24731275413287000)])  # µs-aligned
    rt = df.select(
        utctime_to_deltans(deltatime_to_utctime(F.col("delta_ns"))).alias("ns")
    ).collect()[0]["ns"]
    assert rt == 24731275413287000


def test_ns_to_us_exact(spark):
    big = 1704067207179575175  # > 2^53, would corrupt via double division
    df = spark.createDataFrame([Row(ns=big)])
    out = df.select(ns_to_us(F.col("ns")).alias("us")).collect()[0]["us"]
    assert out == 1704067207179575


def test_us_of():
    assert us_of("2024-01-01") == 1704067200000000
    assert us_of("2018-01-01") == 1514764800000000


def test_projection_roundtrip(spark):
    pts = [
        Row(lon=0.0, lat=-71.0),
        Row(lon=155.0, lat=-85.5),
        Row(lon=-120.0, lat=-75.0),
        Row(lon=45.0, lat=-89.9),
    ]
    df = spark.createDataFrame(pts)
    x, y = lonlat_to_xy(F.col("lon"), F.col("lat"))
    proj = df.select("lon", "lat", x.alias("x"), y.alias("y"))
    lon2, lat2 = xy_to_lonlat(F.col("x"), F.col("y"))
    back = proj.select("lon", "lat", lon2.alias("lon2"), lat2.alias("lat2")).collect()
    for r in back:
        assert math.isclose(r["lon"], r["lon2"], abs_tol=1e-6)
        assert math.isclose(r["lat"], r["lat2"], abs_tol=1e-6)


def test_projection_golden_pairs(spark):
    # Paired coordinates from the reference's own outputs
    # (antarctic_subglacial_lakes_3031.geojson vs _4326.geojson —
    # produced by pyproj): forward transform must agree to <1 m.
    pairs = [
        # (lon, lat) → (x, y)
        (-62.2121699718095, -83.94626324970557, -582421.2419913588, 306917.8043229734),
        (-157.59412603172782, -86.17980978516003, -158267.63205453235, -383874.34996357927),
    ]
    df = spark.createDataFrame(
        [Row(lon=p[0], lat=p[1], xe=p[2], ye=p[3]) for p in pairs]
    )
    x, y = lonlat_to_xy(F.col("lon"), F.col("lat"))
    out = df.select("xe", "ye", x.alias("x"), y.alias("y")).collect()
    for r in out:
        assert math.isclose(r["x"], r["xe"], abs_tol=1.0)
        assert math.isclose(r["y"], r["ye"], abs_tol=1.0)


def test_deltatime_to_utctime_exact_at_large_offsets(spark):
    """Review finding r4 (confirmed numerically): ns offsets beyond
    2^53 must convert by EXACT decimal division — double division
    rounds the int64 to 32-ns granularity and shifted µs-aligned
    2025-era timestamps by 1 µs."""
    from pyspark.sql import functions as F

    from deepicedrain_spark.functions.timeutils import (
        deltatime_to_utctime,
        utctime_to_deltans,
    )

    vals = [247312754132874000, 2**53 + 1000, 123456789012345000]
    df = spark.createDataFrame([(v,) for v in vals], "d long")
    got = df.select(
        F.col("d"), utctime_to_deltans(deltatime_to_utctime(F.col("d"))).alias("rt")
    ).collect()
    for r in got:
        # exact at µs resolution: the round trip truncates sub-µs only
        assert r["rt"] == (r["d"] // 1000) * 1000, (r["d"], r["rt"])
