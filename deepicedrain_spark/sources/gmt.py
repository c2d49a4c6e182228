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
        fid = str(r[id_col])
        if '"' in fid or "\n" in fid or "\r" in fid:
            # a quote or newline inside the quoted @D payload corrupts
            # the layer for every downstream GMT/OGR reader — reject at
            # write time rather than emit an unparseable file
            raise ValueError(
                f"write_gmt_polygons: feature id {fid!r} contains a "
                "double quote or newline, which the OGR-GMT @D field "
                "encoding cannot represent"
            )
        lines.append(">")
        lines.append(f'# @D"{fid}"')
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
                # the writer emits exactly `# @D"<id>"`; only strip the
                # one MATCHED pair of surrounding quotes — a naive
                # .strip('"') would also eat quotes that are part of an
                # id written by other tools (ADVICE r7 low)
                payload = line[4:].strip()
                if len(payload) >= 2 and payload[0] == '"' and payload[-1] == '"':
                    payload = payload[1:-1]
                cur_id = payload
            elif line.startswith("#"):
                continue
            else:
                toks = line.split()
                if len(toks) != 2:
                    raise ValueError(
                        f"read_gmt_polygons: malformed coordinate line "
                        f"{line!r} in {path} (expected 'x y')"
                    )
                cur_xs.append(float(toks[0]))
                cur_ys.append(float(toks[1]))
    flush()
    return spark.createDataFrame(
        feats, f"{id_col} string, xs array<double>, ys array<double>"
    )
