"""PIP / hull / ring tests — mirrors reference
tests/test_spatiotemporal_gpu.py:19-44 (diagonal points vs box) and
atlxi_lake.py:242-251 hull/donut semantics."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from deepicedrain_spark.operators.spatial import (
    buffered,
    convex_hulls,
    point_in_polygon,
    point_in_polygon_gridded,
    polygons_df,
    raycast_predicate,
    ring_area,
    ring_to_poly_cols,
)

SQUARE = {"poly_id": "box", "xs": [-100.0, 100.0, 100.0, -100.0], "ys": [-100.0, -100.0, 100.0, 100.0]}


def diagonal_points(spark, n=50):
    return spark.createDataFrame(
        [Row(pid=i, x=-200 + 400 * i / (n - 1), y=-200 + 400 * i / (n - 1)) for i in range(n)]
    )


def test_pip_diagonal_box(spark):
    pts = diagonal_points(spark)
    polys = polygons_df(spark, [SQUARE])
    inside = point_in_polygon(pts, polys)
    # strict interior of ±100 square along the diagonal: i ∈ [13, 36]
    assert inside.count() == 24
    assert inside.select("poly_id").distinct().collect()[0][0] == "box"


def test_pip_left_join_keeps_unlabeled(spark):
    pts = diagonal_points(spark)
    polys = polygons_df(spark, [SQUARE])
    labeled = point_in_polygon(pts, polys, how="left")
    assert labeled.count() == 50
    assert labeled.filter(F.col("poly_id").isNull()).count() == 26


def test_pip_gridded_matches_broadcast(spark):
    pts = diagonal_points(spark)
    polys = polygons_df(spark, [SQUARE])
    a = {r["pid"] for r in point_in_polygon(pts, polys).collect()}
    b = {r["pid"] for r in point_in_polygon_gridded(pts, polys, cell=80.0).collect()}
    assert a == b


def test_pip_concave_polygon(spark):
    # L-shape: point in the notch must be excluded
    lshape = {
        "poly_id": "L",
        "xs": [0.0, 4.0, 4.0, 2.0, 2.0, 0.0],
        "ys": [0.0, 0.0, 2.0, 2.0, 4.0, 4.0],
    }
    pts = spark.createDataFrame(
        [Row(pid=1, x=1.0, y=1.0), Row(pid=2, x=3.0, y=3.0), Row(pid=3, x=1.0, y=3.0)]
    )
    inside = point_in_polygon(pts, polygons_df(spark, [lshape]))
    got = {r["pid"] for r in inside.collect()}
    assert got == {1, 3}  # (3,3) sits in the notch


def test_convex_hull_and_area(spark):
    # unit square + interior point: hull is the square, area 1
    pts = spark.createDataFrame(
        [
            Row(g=1, x=0.0, y=0.0),
            Row(g=1, x=1.0, y=0.0),
            Row(g=1, x=1.0, y=1.0),
            Row(g=1, x=0.0, y=1.0),
            Row(g=1, x=0.5, y=0.5),
        ]
    )
    hulls = convex_hulls(pts, ["g"])
    row = hulls.withColumn("area", ring_area("hull")).collect()[0]
    assert len(row["hull"]) == 5  # 4 vertices + closure
    assert math.isclose(row["area"], 1.0, rel_tol=1e-12)


def test_buffered_donut_ring(spark):
    pts = spark.createDataFrame(
        [Row(g=1, x=float(a), y=float(b)) for a in range(0, 11) for b in range(0, 11)]
    )
    hulls = convex_hulls(pts, ["g"])  # 10×10 square hull
    buf = buffered(hulls, "hull", radius=5.0)
    areas = buf.select(
        ring_area("hull").alias("inner"), ring_area("hull_buffered").alias("outer")
    ).collect()[0]
    assert math.isclose(areas["inner"], 100.0, rel_tol=1e-9)
    # buffered square area = s² + 4·s·r + π·r² (circle discretized: ≲)
    expected = 100 + 4 * 10 * 5 + math.pi * 25
    assert abs(areas["outer"] - expected) / expected < 0.02

    # donut membership: in buffered hull but not inner hull
    ring_polys = ring_to_poly_cols(buf, "hull_buffered").select(
        F.col("g").alias("poly_g"), "xs", "ys", "xmin", "xmax", "ymin", "ymax"
    )
    probes = spark.createDataFrame(
        [Row(pid=1, x=5.0, y=5.0), Row(pid=2, x=12.0, y=5.0), Row(pid=3, x=40.0, y=5.0)]
    )
    in_outer = probes.crossJoin(F.broadcast(ring_polys)).filter(
        raycast_predicate()
    )
    got = {r["pid"] for r in in_outer.collect()}
    assert got == {1, 2}  # 40,5 is outside even the buffer


def test_hull_and_ring_area_degenerate_inputs(spark):
    """Review finding r4: NULL/NaN coordinates are dropped before the
    hull sort (previously TypeError), and degenerate rings have area 0
    instead of tripping the descending-sequence negative-index trap."""
    import pandas as pd

    from deepicedrain_spark.operators.spatial import convex_hulls, ring_area

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "g": [1, 1, 1, 1, 2],
                "x": [0.0, 1.0, None, 0.5, None],
                "y": [0.0, 0.0, 2.0, 1.0, None],
            }
        )
    )
    hulls = convex_hulls(df, ["g"])
    got = {r["g"]: r["hull"] for r in hulls.collect()}
    assert len(got[1]) >= 4  # triangle ring from the 3 valid points
    assert got[2] == []  # all-null group -> empty ring
    areas = hulls.withColumn("a", ring_area("hull")).collect()
    a = {r["g"]: r["a"] for r in areas}
    assert a[2] == 0.0 and a[1] > 0
