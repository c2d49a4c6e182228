"""GeoJSON source/sink roundtrip (SURVEY S6/S7)."""

import json
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from deepicedrain_spark.operators.spatial import convex_hulls, point_in_polygon
from deepicedrain_spark.sources.geojson import (
    read_geojson_polygons,
    write_geojson,
    write_geojsonl,
)


def test_geojson_roundtrip(spark, tmp_path):
    pts = spark.createDataFrame(
        [Row(g="lake1", x=float(i % 5), y=float(i // 5)) for i in range(25)]
    )
    hulls = convex_hulls(pts, ["g"]).withColumn("num_points", F.lit(25))

    out = str(tmp_path / "lakes.geojson")
    write_geojson(hulls, "hull", ["g", "num_points"], out)
    doc = json.load(open(out))
    assert doc["type"] == "FeatureCollection" and len(doc["features"]) == 1
    feat = doc["features"][0]
    assert feat["properties"] == {"g": "lake1", "num_points": 25}
    ring = feat["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1]  # closed

    # read back and use as a PIP layer
    polys = read_geojson_polygons(spark, out, id_property="g")
    probe = spark.createDataFrame([Row(pid=1, x=2.0, y=2.0), Row(pid=2, x=9.0, y=9.0)])
    inside = point_in_polygon(probe, polys).collect()
    assert [r["pid"] for r in inside] == [1]
    assert inside[0]["poly_id"] == "lake1"


def test_geojsonl_distributed_sink(spark, tmp_path):
    pts = spark.createDataFrame(
        [Row(g=f"lake{k}", x=float(i % 3) + 10 * k, y=float(i // 3)) for k in range(3) for i in range(9)]
    )
    hulls = convex_hulls(pts, ["g"])
    out = str(tmp_path / "lakes_jsonl")
    write_geojsonl(hulls, "hull", ["g"], out)
    lines = []
    for f in os.listdir(out):
        if f.startswith("part-"):
            lines += [json.loads(line) for line in open(os.path.join(out, f)) if line.strip()]
    assert len(lines) == 3
    assert all(line["type"] == "Feature" for line in lines)


def test_reference_lake_catalog_roundtrip(spark, tmp_path):
    """Read the reference's PUBLISHED lake catalog (193 features,
    atlxi_lake.py:304-310 output), verify its per-feature properties
    survive the S6 scan, write it back through the S7 sink, and
    re-read: rings and properties must be value-identical."""
    import json

    from deepicedrain_spark.operators.spatial import ring_area
    from deepicedrain_spark.sources.geojson import (
        read_geojson_polygons,
        write_geojson,
    )

    src = "/root/reference/antarctic_subglacial_lakes_3031.geojson"
    df = read_geojson_polygons(spark, src, id_property="basin_name")
    assert df.count() == 193

    # every published property column survives the scan
    raw = json.load(open(src))
    want_props = sorted(raw["features"][0]["properties"].keys())
    got_props = sorted(df.schema["properties"].dataType.fieldNames())
    assert got_props == want_props

    # A13 shoelace area over the published rings: positive, and the
    # biggest single lake is tens of km^2 (the catalog is subglacial
    # lakes, not basins)
    ring = F.expr("transform(arrays_zip(xs, ys), p -> struct(p.xs AS x, p.ys AS y))")
    df2 = df.withColumn("_ring", ring).withColumn("a", ring_area("_ring"))
    areas = [r["a"] for r in df2.select("a").collect()]
    assert all(a > 0 for a in areas)
    assert max(areas) > 10e6  # > 10 km^2

    # round-trip: flatten properties to columns, write, re-read
    prop_cols = [f"properties.{c}" for c in want_props]
    flat = df2.select(
        *[F.col(f"properties.{c}").alias(c) for c in want_props], "_ring"
    )
    out = str(tmp_path / "lakes_rt.geojson")
    write_geojson(flat, "_ring", want_props, out)
    back = read_geojson_polygons(spark, out, id_property="basin_name")
    assert back.count() == 193

    def canon(frame):
        rows = frame.select(
            *[F.col(f"properties.{c}").alias(c) for c in want_props], "xs", "ys"
        ).collect()
        return sorted(
            (tuple(r[c] for c in want_props), tuple(r["xs"]), tuple(r["ys"]))
            for r in rows
        )

    assert canon(back) == canon(df)


def test_gmt_rejects_quote_ids_and_malformed_coords(spark, tmp_path):
    """ADVICE r7 (low): a feature id containing a double quote would
    corrupt the @D payload for every GMT/OGR reader — rejected at write
    time; coordinate lines must be exactly two tokens; a matched quote
    pair (and only a matched pair) is stripped on read."""
    import pytest

    from deepicedrain_spark.sources.gmt import (
        read_gmt_polygons,
        write_gmt_polygons,
    )

    bad = spark.createDataFrame(
        [('la"ke', [0.0, 1.0, 0.0], [0.0, 0.0, 1.0])],
        "poly_id string, xs array<double>, ys array<double>",
    )
    with pytest.raises(ValueError, match="double quote"):
        write_gmt_polygons(bad, str(tmp_path / "bad.gmt"))

    # ids that merely START or END with a quote-free token round-trip;
    # an id written unquoted by another tool is taken verbatim
    p = str(tmp_path / "alien.gmt")
    with open(p, "w") as fh:
        fh.write(
            "# @VGMT1.0 @GPOLYGON\n# @Npoly_id\n# @Tstring\n"
            "# FEATURE_DATA\n>\n# @Dlake1\n# @P\n0 0\n1 0\n0 1\n"
        )
    rows = read_gmt_polygons(spark, p).collect()
    assert rows[0]["poly_id"] == "lake1"

    p2 = str(tmp_path / "mal.gmt")
    with open(p2, "w") as fh:
        fh.write(
            "# @VGMT1.0 @GPOLYGON\n# @Npoly_id\n# @Tstring\n"
            "# FEATURE_DATA\n>\n# @D\"x\"\n# @P\n0 0 0\n"
        )
    with pytest.raises(ValueError, match="malformed coordinate"):
        read_gmt_polygons(spark, p2).collect()
