"""OGR GMT vector-layer sink/source (SURVEY S7 variant).

Reference: the lake pipeline writes its dissolved geometries twice —
GeoJSON for analysis AND ``driver='OGR_GMT'`` for GMT's plotting tools
(``gdf.to_file(engine="GMT", driver="OGR_GMT")``,
/root/reference/atlxi_lake.py:407-412). This module implements the
same tiny-edge vector sink for the GMT ASCII format (the public OGR
GMT driver layout: ``# @VGMT1.0 @GPOLYGON`` header, ``# @N``/``# @T``
field declarations, per-feature ``>`` separators with ``# @D`` field
data and ``# @P`` perimeter markers), plus the matching reader.

Scope mirrors the GeoJSON single-file sink (sources/geojson.py:79):
vector layers here are SMALL dims (hundreds of lake polygons), so the
writer deliberately collects to the driver and the reader parses one
file driver-side; coordinates round-trip exactly via %.17g.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_gmt_polygons(
    df: DataFrame, path: str, id_col: str = "poly_id", xs: str = "xs", ys: str = "ys"
) -> int:
    """Write (id, xs, ys) polygon rows as an OGR-GMT ASCII layer.
    Returns the feature count. Driver-side by design (tiny-edge sink,
    same scoping as write_geojson)."""
    rows = df.select(id_col, xs, ys).collect()
    lines = [
        "# @VGMT1.0 @GPOLYGON",
        f"# @N{id_col}",
        "# @Tstring",
        "# FEATURE_DATA",
    ]
    for r in rows:
        lines.append(">")
        lines.append(f'# @D"{r[id_col]}"')
        lines.append("# @P")
        for x, y in zip(r[xs], r[ys]):
            lines.append(f"{x:.17g} {y:.17g}")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return len(rows)


def read_gmt_polygons(spark: SparkSession, path: str, id_col: str = "poly_id") -> DataFrame:
    """Parse an OGR-GMT polygon layer back to (id, xs, ys) rows —
    exact doubles (the writer's %.17g round-trips bit-for-bit)."""
    feats: list[tuple[str, list[float], list[float]]] = []
    cur_id: str | None = None
    cur_xs: list[float] = []
    cur_ys: list[float] = []

    def flush() -> None:
        nonlocal cur_id, cur_xs, cur_ys
        if cur_id is not None and cur_xs:
            feats.append((cur_id, cur_xs, cur_ys))
        cur_id, cur_xs, cur_ys = None, [], []

    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if line == ">":
                flush()
            elif line.startswith("# @D"):
                cur_id = line[4:].strip().strip('"')
            elif line.startswith("#"):
                continue
            else:
                sx, sy = line.split()
                cur_xs.append(float(sx))
                cur_ys.append(float(sy))
    flush()
    return spark.createDataFrame(
        feats, f"{id_col} string, xs array<double>, ys array<double>"
    )
