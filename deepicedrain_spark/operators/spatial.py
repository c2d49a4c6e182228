"""Spatial operators (SURVEY J1/J2, A13, M2 support).

Reference: ``point_in_polygon_gpu`` at
/root/reference/deepicedrain/spatiotemporal.py:219-307 labels each
point with its containing polygon via cuspatial GPU kernels in
32-polygon batches; convex hulls / buffered donut rings at
/root/reference/atlxi_lake.py:242-251 via shapely.

Spark-first design:
- Polygons are plain rows ``(poly_id, …, xs array<double>,
  ys array<double>)`` with CLOSED rings (first vertex repeated last).
- Point-in-polygon is an **even-odd ray cast written as a Catalyst
  higher-order-function expression** — pure JVM, whole-stage codegen,
  no Python in the hot path. The polygon side is broadcast (dims are
  small: basins/lakes), so the join is shuffle-free.
- For 100 TB fact tables with MANY polygons there is a gridded
  variant: explode polygons over the grid cells their bbox covers and
  equi-join on cell id — turns the cross join into a hash join keyed
  on cell, then applies bbox + exact ray cast.
- Convex hull / buffer are per-group aggregates over collect_list —
  tiny outputs (one ring per cluster), so a scalar Python UDF on the
  aggregated array costs one call per group, not per point.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType


def close_ring(xs: list[float], ys: list[float]) -> tuple[list[float], list[float]]:
    """Ensure the ring is closed (first vertex == last)."""
    if xs[0] != xs[-1] or ys[0] != ys[-1]:
        xs = list(xs) + [xs[0]]
        ys = list(ys) + [ys[0]]
    return list(xs), list(ys)


def polygons_df(spark, polys: list[dict]) -> DataFrame:
    """Build a polygon dim table from [{'poly_id':…, 'xs':[…], 'ys':[…]}].
    Rings are closed; bbox columns are precomputed for cheap pruning."""
    rows = []
    for p in polys:
        xs, ys = close_ring(p["xs"], p["ys"])
        rows.append(
            (
                p["poly_id"],
                xs,
                ys,
                min(xs),
                max(xs),
                min(ys),
                max(ys),
            )
        )
    schema = (
        "poly_id string, xs array<double>, ys array<double>, "
        "xmin double, xmax double, ymin double, ymax double"
    )
    return spark.createDataFrame(rows, schema)


def raycast_predicate(px: str = "x", py: str = "y", xs: str = "xs", ys: str = "ys") -> Column:
    """Even-odd ray cast as a Catalyst HOF expression.

    Counts edges (i, i+1) of the closed ring whose y-span straddles the
    point and whose x-intercept at py lies right of px; odd count ⇒
    inside. Identical double math to the standard C ray-cast, so an
    oracle can reproduce it edge-by-edge in SQL.
    """
    # size < 2 guard: sequence(0, -1) DESCENDS in Spark, producing
    # negative ring indices (ANSI: INVALID_ARRAY_INDEX) — a degenerate
    # ring contains nothing
    return F.expr(
        f"""
        CASE WHEN size({xs}) >= 2 THEN
        size(filter(sequence(0, size({xs}) - 2), i ->
            (({ys}[i+1] > {py}) != ({ys}[i] > {py})) AND
            ({px} < ({xs}[i] - {xs}[i+1]) * ({py} - {ys}[i+1])
                    / ({ys}[i] - {ys}[i+1]) + {xs}[i+1])
        )) % 2 = 1
        ELSE false END
        """
    )


def bbox_predicate(px: str = "x", py: str = "y") -> Column:
    return (
        (F.col(px) >= F.col("xmin"))
        & (F.col(px) <= F.col("xmax"))
        & (F.col(py) >= F.col("ymin"))
        & (F.col(py) <= F.col("ymax"))
    )


def point_in_polygon(
    points: DataFrame,
    polys: DataFrame,
    x: str = "x",
    y: str = "y",
    how: str = "inner",
) -> DataFrame:
    """J1: label each point with the polygon containing it.

    Broadcast nested-loop join + bbox prune + exact ray cast — the
    Spark rewrite of cuspatial's 32-polygon batching (the broadcast
    side carries ALL polygons; Catalyst evaluates the cheap bbox
    predicate before the HOF). ``how='left'`` keeps unlabeled points
    with null poly_id (reference keeps unlabeled as NaN)."""
    pred = bbox_predicate(x, y) & raycast_predicate(x, y)
    return points.join(F.broadcast(polys), on=pred, how=how).drop(
        "xs", "ys", "xmin", "xmax", "ymin", "ymax"
    )


def point_in_polygon_gridded(
    points: DataFrame,
    polys: DataFrame,
    cell: float,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """J1 at scale: equi-join on grid cell instead of a cross join.

    Polygons are exploded over every cell their bbox covers (pick
    ``cell`` ≈ median polygon size so the fan-out stays small); points
    compute their cell key map-side. The join is then an ordinary
    hash join on (cx, cy) — shuffle-partitionable, AQE-skew-safe —
    followed by the exact ray cast."""
    pcell = polys.withColumn(
        "cx", F.explode(F.sequence(F.floor(F.col("xmin") / cell), F.floor(F.col("xmax") / cell)))
    ).withColumn(
        "cy", F.explode(F.sequence(F.floor(F.col("ymin") / cell), F.floor(F.col("ymax") / cell)))
    )
    pts = points.withColumn("cx", F.floor(F.col(x) / cell)).withColumn(
        "cy", F.floor(F.col(y) / cell)
    )
    pred = bbox_predicate(x, y) & raycast_predicate(x, y)
    return (
        pts.join(pcell, on=["cx", "cy"], how="inner")
        .filter(pred)
        .drop("cx", "cy", "xs", "ys", "xmin", "xmax", "ymin", "ymax")
    )


# ---------------------------------------------------------------------------
# Convex hull / buffer aggregates (A13)
# ---------------------------------------------------------------------------

_POINT = StructType([StructField("x", DoubleType()), StructField("y", DoubleType())])
_RING = ArrayType(_POINT)


def _monotone_chain(pts: list[tuple[float, float]]) -> list[tuple[float, float]]:
    """Andrew's monotone chain; returns closed CCW ring."""
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return list(pts) + [pts[0]] if pts else []

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    ring = lower[:-1] + upper[:-1]
    return ring + [ring[0]]


def _hull_udf():
    def hull(points):
        # drop points with NULL/NaN coordinates: sorted() cannot order
        # None and a NaN vertex poisons every cross product
        pts = [
            (p["x"], p["y"])
            for p in points or []
            if p["x"] is not None and p["y"] is not None
            and p["x"] == p["x"] and p["y"] == p["y"]
        ]
        if not pts:
            return []
        ring = _monotone_chain(pts)
        return [{"x": px, "y": py} for px, py in ring]

    return F.udf(hull, _RING)


def _buffer_udf(radius: float, segments: int = 16):
    """Minkowski-sum buffer of a convex ring: offset every vertex by a
    ``segments``-gon circle, re-hull (exact for convex input up to the
    circle discretization — matches shapely buffer to ~0.5% at 16)."""

    def buf(ring):
        if not ring:
            return []
        pts = []
        for p in ring:
            for k in range(segments):
                a = 2 * math.pi * k / segments
                pts.append((p["x"] + radius * math.cos(a), p["y"] + radius * math.sin(a)))
        out = _monotone_chain(pts)
        return [{"x": px, "y": py} for px, py in out]

    return F.udf(buf, _RING)


def convex_hulls(df: DataFrame, group_cols: list[str], x: str = "x", y: str = "y") -> DataFrame:
    """A13: one convex-hull ring per group (reference
    ``MultiPoint(points).convex_hull`` per cluster). The aggregate
    shuffles point structs once; the hull UDF runs once per group."""
    hull = _hull_udf()
    return (
        df.groupBy(*group_cols)
        .agg(F.collect_list(F.struct(F.col(x).alias("x"), F.col(y).alias("y"))).alias("_pts"))
        .withColumn("hull", hull("_pts"))
        .drop("_pts")
    )


def buffered(df: DataFrame, ring_col: str, radius: float, out: str = "hull_buffered") -> DataFrame:
    """A13: ``hull.buffer(radius)`` (reference donut at
    atlxi_lake.py:247: buffer(5000) minus hull)."""
    return df.withColumn(out, _buffer_udf(radius)(F.col(ring_col)))


def ring_area(ring_col: str) -> Column:
    """Shoelace area of a closed ring — pure HOF expression. Degenerate
    rings (size < 2) have area 0 (the sequence guard dodges the
    descending sequence(0, -1) / negative-index trap)."""
    return F.expr(
        f"""
        CASE WHEN size({ring_col}) >= 2 THEN
        abs(aggregate(sequence(0, size({ring_col}) - 2), cast(0.0 as double),
            (acc, i) -> acc + ({ring_col}[i].x * {ring_col}[i+1].y
                              - {ring_col}[i+1].x * {ring_col}[i].y))) / 2
        ELSE 0.0D END
        """
    )


def ring_to_poly_cols(df: DataFrame, ring_col: str) -> DataFrame:
    """Ring struct-array → (xs, ys, bbox) columns so PIP predicates
    apply (join cluster hulls back against the point table)."""
    return (
        df.withColumn("xs", F.expr(f"transform({ring_col}, p -> p.x)"))
        .withColumn("ys", F.expr(f"transform({ring_col}, p -> p.y)"))
        .withColumn("xmin", F.array_min("xs"))
        .withColumn("xmax", F.array_max("xs"))
        .withColumn("ymin", F.array_min("ys"))
        .withColumn("ymax", F.array_max("ys"))
    )


def morton_code_sql(xe: str, ye: str, bits: int = 16, dialect: str = "spark") -> str:
    """Unrolled 2-D Morton (Z-order) bit interleave over two already-
    quantized non-negative integer expressions — the space-filling-
    curve sort key that co-locates spatially-near points inside the
    same parquet row groups / file ranges, so a bbox scan prunes to
    O(perimeter) Z-ranges instead of the full table.

    Emitted as raw SQL per dialect (Spark: shiftleft/shiftright
    functions; DuckDB: << >> operators) so the SAME integer math runs
    in engine and oracle.  Public technique: Morton 1966; used by
    Delta/Iceberg Z-ordering.
    """
    terms = []
    for i in range(bits):
        if dialect == "spark":
            terms.append(
                f"shiftleft(CAST(shiftright({xe}, {i}) & 1 AS BIGINT), {2 * i})"
            )
            terms.append(
                f"shiftleft(CAST(shiftright({ye}, {i}) & 1 AS BIGINT), {2 * i + 1})"
            )
        else:
            # CAST keeps the shifted operand BIGINT even when the input
            # expression is an INT32 literal (DuckDB errors on 1 << 31)
            terms.append(f"(CAST((({xe} >> {i}) & 1) AS BIGINT) << {2 * i})")
            terms.append(f"(CAST((({ye} >> {i}) & 1) AS BIGINT) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def hilbert_order_sql(
    source_sql: str,
    xe: str,
    ye: str,
    id_cols: str,
    bits: int = 16,
    dialect: str = "spark",
) -> str:
    """Hilbert-curve index d(x, y) over two already-quantized
    non-negative ``bits``-bit integer expressions, as a chain of
    nested sub-selects over ``source_sql``.

    Hilbert keys beat Morton for layout locality (no Z-curve seam
    jumps: every consecutive pair of cells is 4-adjacent), which is
    why Iceberg offers both orderings.  The classic xy2d loop
    (Wikipedia "Hilbert curve"; Hamilton 2006) mutates x/y by
    rotate-and-flip each level — naively inlined that doubles the
    expression tree per level, so this emits the equivalent
    4-state-machine form: track (swap, complement) flags and read
    each ORIGINAL coordinate bit through them.  Verified exhaustively
    against the reference loop (tests/test_sketch_queries.py).  Each
    level is one nested SELECT — engines keep them as chained
    projections, so plan size is O(bits), not O(2^bits).

    ``id_cols``: comma-joined passthrough columns.  The final SELECT
    exposes ``hilbert`` (BIGINT in [0, 4**bits)).  The state-machine
    working columns are sentinel-prefixed (``__hilb_*``) so a source
    frame that already has ``hx``/``sw``/... passthrough columns
    cannot collide with them in the nested selects.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"hilbert bits must be in [1, 31], got {bits}")
    shr = (
        (lambda e, i: f"shiftright({e}, {i})")
        if dialect == "spark"
        else (lambda e, i: f"({e} >> {i})")
    )
    hx, hy, hd, sw, cm = (
        "__hilb_hx", "__hilb_hy", "__hilb_hd", "__hilb_sw", "__hilb_cm",
    )
    q = (
        f"SELECT {id_cols}, CAST({xe} AS BIGINT) AS {hx}, CAST({ye} AS BIGINT) AS {hy},"
        f" CAST(0 AS BIGINT) AS {hd}, 0 AS {sw}, 0 AS {cm} FROM ({source_sql})"
    )
    for i in range(bits - 1, -1, -1):
        bx = f"({shr(hx, i)} & 1)"
        by = f"({shr(hy, i)} & 1)"
        xi = f"(((CASE WHEN {sw} = 1 THEN {by} ELSE {bx} END) + {cm}) % 2)"
        yi = f"(((CASE WHEN {sw} = 1 THEN {bx} ELSE {by} END) + {cm}) % 2)"
        q = (
            f"SELECT {id_cols}, {hx}, {hy},"
            f" {hd} + CAST(2 * {xi} + (({xi} + {yi}) % 2) AS BIGINT) * {1 << (2 * i)} AS {hd},"
            f" CASE WHEN {yi} = 0 THEN 1 - {sw} ELSE {sw} END AS {sw},"
            f" CASE WHEN {yi} = 0 AND {xi} = 1 THEN 1 - {cm} ELSE {cm} END AS {cm}"
            f" FROM ({q})"
        )
    return f"SELECT {id_cols}, {hd} AS hilbert FROM ({q})"
