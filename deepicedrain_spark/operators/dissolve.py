"""J6 geometry dissolve — per-key polygon-union aggregate (SURVEY §2.3).

Reference: ``lake_catalog.read().loc[lake_ids].dissolve(by=...)`` at
/root/reference/atlxi_lake.py:364-375 merges selected lake polygons
into one geometry via geopandas/shapely ``unary_union``; the engine
needs the same "merge geometries per group, drop interior boundaries"
aggregate without shapely.

Spark-first design — a *relational planar overlay*, no geometry
library and no Python in the area path:

1. **edges**: explode each closed ring into directed segments
   (translated to a per-key local origin so the Green's-theorem fold
   below doesn't cancel 1e12-magnitude terms).
2. **crossings**: per-key self-join of edges from different polygons;
   proper segment intersections yield split parameters ``t``, and
   exactly-representable degenerate contacts (T-junctions, endpoints
   of collinear shared runs) split through the endpoint-on-edge
   branch.
3. **sub-edges**: split every edge at its sorted ``t`` list. Endpoint
   arithmetic is pinned (``t=0``/``t=1`` return the original vertex
   bits) so both engines produce identical doubles.
4. **coverage**: each sub-edge midpoint is offset by ±eps along the
   edge normal, scaled by the SUB-edge span (``tb - ta``) so the probe
   stays inside the sub-edge's sliver even when two crossings sit
   close together on a long edge (round-6 fix, was full-edge scale).
   An even-odd ray cast against every POLYGON of the key — ray
   crossings summed over the polygon's rings, then parity, so input
   holes count correctly — classifies each side as inside/outside the
   union.
5. **boundary + area**: a sub-edge lies on the union boundary iff
   exactly one side is covered. Orienting interior-left, the union
   area is the Green's-theorem fold ``sum((ax*by - bx*ay) / 2)`` over
   boundary sub-edges — no ring chaining needed for scalars.
6. **parts**: connected components of the per-key overlap graph.
   Polygons are connected when they properly cross, when one has a
   vertex strictly inside the other (any-vertex test, vertices ON the
   other's boundary excluded — a first-vertex-only test misses
   containment whose first vertex lands on the boundary), or when
   their boundaries share a POSITIVE-LENGTH collinear run (round-6,
   ADVICE r5): shapely ``unary_union`` merges edge-touching polygons
   into one geometry. Touching at isolated points only (corner
   contacts, T-junction vertices) stays two parts — GEOS returns a
   MultiPolygon there, since a single ring may not self-touch.

Every step is an equi-join or aggregation keyed by the dissolve key,
so the plan shuffles on the key only; polygon groups (lakes per
basin) are small dims while the framework scales to many keys. The
oracle can replay steps 1-5 verbatim in SQL because every float op is
written identically on both sides.

Scope (round-6, was general-position single-ring only): simple
polygons, optionally with HOLES — pass one row per ring with an
``rid`` column (0 = outer, >0 = hole; omit the column for
single-ring inputs) — including degenerate contacts whose
coordinates are exactly representable (shared edges, partial
collinear overlaps, duplicate rings, vertex-on-edge touches). Rings
of one polygon must not cross each other (standard validity, same as
shapely). Holes in the *output* (a union enclosing a void) fall out
of the boundary test naturally.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_rid(polys: DataFrame) -> DataFrame:
    """Back-compat: single-ring inputs carry no ring id — synthesize
    rid=0 (every ring an outer ring)."""
    if "rid" in polys.columns:
        return polys
    return polys.withColumn("rid", F.lit(0).cast("int"))


def _edges(polys: DataFrame, key_cols: list[str], pid: str) -> DataFrame:
    """Directed ring edges in per-key translated coordinates.

    Translation: subtract the key's min vertex (exact double min, so
    both engines agree bit-for-bit) — Green terms then involve
    km-scale values instead of 1e6-scale EPSG:3031 coordinates, which
    shrinks float cancellation ~1e6-fold.
    """
    polys = _with_rid(polys)
    refs = polys.groupBy(*key_cols).agg(
        F.min(F.array_min("xs")).alias("_xref"),
        F.min(F.array_min("ys")).alias("_yref"),
    )
    p = polys.join(F.broadcast(refs), key_cols)
    return p.select(
        *key_cols,
        F.col(pid).alias("pid"),
        "rid",
        "_xref",
        "_yref",
        F.expr(
            """
            explode(transform(sequence(0, size(xs) - 2), i -> struct(
                i AS eid,
                xs[i]   - _xref AS x1, ys[i]   - _yref AS y1,
                xs[i+1] - _xref AS x2, ys[i+1] - _yref AS y2)))
            """
        ).alias("e"),
    ).select(*key_cols, "pid", "rid", "_xref", "_yref", "e.*")


def _crossings(edges: DataFrame, key_cols: list[str]) -> DataFrame:
    """Proper crossings between edges of DIFFERENT polygons of a key:
    (key, pid, rid, eid, t) — the split parameter on the (pid, rid,
    eid) edge. Emitted from BOTH sides of the e×f pair (t for e, u for
    f), so one join covers every edge's splits."""
    a = edges.select(
        *key_cols,
        F.col("pid").alias("apid"),
        F.col("rid").alias("arid"),
        F.col("eid").alias("aeid"),
        F.col("x1").alias("ax1"),
        F.col("y1").alias("ay1"),
        F.col("x2").alias("ax2"),
        F.col("y2").alias("ay2"),
    )
    b = edges.select(
        *key_cols,
        F.col("pid").alias("bpid"),
        F.col("x1").alias("bx1"),
        F.col("y1").alias("by1"),
        F.col("x2").alias("bx2"),
        F.col("y2").alias("by2"),
    )
    pair = a.join(b, key_cols).where(F.col("apid") != F.col("bpid"))
    d1x = F.col("ax2") - F.col("ax1")
    d1y = F.col("ay2") - F.col("ay1")
    d2x = F.col("bx2") - F.col("bx1")
    d2y = F.col("by2") - F.col("by1")
    qpx = F.col("bx1") - F.col("ax1")
    qpy = F.col("by1") - F.col("ay1")
    denom = d1x * d2y - d1y * d2x
    t = (qpx * d2y - qpy * d2x) / denom
    u = (qpx * d1y - qpy * d1x) / denom
    out_cols = [
        *key_cols,
        F.col("apid").alias("pid"),
        F.col("arid").alias("rid"),
        F.col("aeid").alias("eid"),
        "t",
    ]
    hit = (
        pair.withColumn("_den", denom)
        .where(F.col("_den") != 0)
        .withColumn("t", t)
        .withColumn("u", u)
        .where((F.col("t") > 0) & (F.col("t") < 1) & (F.col("u") > 0) & (F.col("u") < 1))
        .select(*out_cols)
    )
    # Degenerate (but exactly-representable) contacts: an endpoint of f
    # lying ON e — covers T-junctions AND the endpoints of collinear
    # overlapping runs (e.g. two axis-aligned squares sharing part of a
    # side). cross(d1, p - e1) == 0 exactly ⇒ split e at p's
    # projection. Float general-position data never triggers this
    # branch; constructed shapes (tests, gridded products) do.
    len2 = d1x * d1x + d1y * d1y
    touches = []
    for px_c, py_c in (("bx1", "by1"), ("bx2", "by2")):
        on_line = d1x * (F.col(py_c) - F.col("ay1")) - d1y * (
            F.col(px_c) - F.col("ax1")
        )
        tp = (
            (F.col(px_c) - F.col("ax1")) * d1x + (F.col(py_c) - F.col("ay1")) * d1y
        ) / len2
        touches.append(
            pair.where(on_line == 0)
            .withColumn("t", tp)
            .where((F.col("t") > 0) & (F.col("t") < 1))
            .select(*out_cols)
        )
    out = hit
    for tdf in touches:
        out = out.unionByName(tdf)
    return out.distinct()


def boundary_subedges(
    polys: DataFrame,
    key_cols: list[str],
    pid: str = "pid",
    eps: float = 1e-6,
) -> DataFrame:
    """Union-boundary sub-edges per key, oriented interior-LEFT:
    (key..., pid, eid, ax, ay, bx, by, _xref, _yref). ``polys`` needs
    closed rings as xs/ys array<double> plus a ``pid`` (and optionally
    ``rid`` for polygons with holes — see module docstring).
    """
    has_rid = "rid" in polys.columns  # hole-bearing inputs only
    polys = _with_rid(polys)
    edges = _edges(polys, key_cols, pid)
    splits = (
        _crossings(edges, key_cols)
        .groupBy(*key_cols, "pid", "rid", "eid")
        .agg(F.collect_list("t").alias("_ts"))
    )
    sub = (
        edges.join(splits, [*key_cols, "pid", "rid", "eid"], "left")
        .withColumn(
            "_tl",
            F.array_sort(
                F.concat(
                    F.array(F.lit(0.0), F.lit(1.0)),
                    F.coalesce(F.col("_ts"), F.array().cast("array<double>")),
                )
            ),
        )
        .select(
            *key_cols,
            "pid",
            "rid",
            "eid",
            "x1",
            "y1",
            "x2",
            "y2",
            "_xref",
            "_yref",
            F.expr(
                "explode(transform(sequence(0, size(_tl) - 2), "
                "i -> struct(_tl[i] AS ta, _tl[i+1] AS tb)))"
            ).alias("s"),
        )
        .select(
            *key_cols, "pid", "rid", "eid", "x1", "y1", "x2", "y2", "_xref", "_yref", "s.*"
        )
        .where(F.col("tb") > F.col("ta"))
    )
    # endpoint arithmetic pinned at t=0 / t=1 so chained sub-edges of
    # one edge share exact bits with the ring vertices (both engines)
    px = lambda t: F.when(F.col(t) == 0.0, F.col("x1")).otherwise(  # noqa: E731
        F.when(F.col(t) == 1.0, F.col("x2")).otherwise(
            F.col("x1") + F.col(t) * (F.col("x2") - F.col("x1"))
        )
    )
    py = lambda t: F.when(F.col(t) == 0.0, F.col("y1")).otherwise(  # noqa: E731
        F.when(F.col(t) == 1.0, F.col("y2")).otherwise(
            F.col("y1") + F.col(t) * (F.col("y2") - F.col("y1"))
        )
    )
    tm = (F.col("ta") + F.col("tb")) / 2
    # probe offset: eps × the SUB-edge vector (tb - ta scales the full
    # edge direction down to the sub-edge span), so the probe distance
    # is proportional to the sliver being classified — an unnormalized
    # full-edge offset overshoots short sub-edges near tangencies
    # (ADVICE r5, dissolve.py:214)
    span = F.col("tb") - F.col("ta")
    sub = (
        sub.withColumn("ax", px("ta"))
        .withColumn("ay", py("ta"))
        .withColumn("bx", px("tb"))
        .withColumn("by", py("tb"))
        .withColumn("mx", F.col("x1") + tm * (F.col("x2") - F.col("x1")))
        .withColumn("my", F.col("y1") + tm * (F.col("y2") - F.col("y1")))
        .withColumn("ox", F.lit(-eps) * span * (F.col("y2") - F.col("y1")))
        .withColumn("oy", F.lit(eps) * span * (F.col("x2") - F.col("x1")))
    )
    refs = polys.groupBy(*key_cols).agg(
        F.min(F.array_min("xs")).alias("_rxref"),
        F.min(F.array_min("ys")).alias("_ryref"),
    )
    # rings pre-translated once (same per-element subtraction the edges
    # use) so the ray-cast lambda below stays small — cheaper codegen,
    # identical doubles
    rings = (
        polys.join(F.broadcast(refs), key_cols)
        .select(
            *key_cols,
            F.col(pid).alias("rpid"),
            F.expr("transform(xs, v -> v - _rxref)").alias("txs"),
            F.expr("transform(ys, v -> v - _ryref)").alias("tys"),
        )
    )
    # translated ray CROSSING COUNT (not parity): identical straddle
    # test to raycast_predicate, on ring coords shifted by the same
    # per-key reference. For hole-bearing inputs the counts are summed
    # over each polygon's rings and only then reduced mod 2 — even-odd
    # across outer+holes, so a probe inside a hole reads "outside the
    # polygon". Single-ring inputs (no rid column — the common case)
    # skip the per-polygon level entirely: ring parity IS polygon
    # parity, and one wide-key aggregation instead of two keeps the
    # many-keys dissolve at its round-5 throughput.
    hits = lambda qx, qy: F.expr(  # noqa: E731
        f"""
        size(filter(sequence(0, size(txs) - 2), i ->
            ((tys[i+1] > {qy}) != (tys[i] > {qy})) AND
            ({qx} < (txs[i] - txs[i+1])
                    * ({qy} - tys[i+1])
                    / (tys[i] - tys[i+1])
                    + txs[i+1])
        ))
        """
    )
    sub_keys = [*key_cols, "pid", "rid", "eid", "ta", "tb", "ax", "ay", "bx", "by", "_xref", "_yref"]
    joined = (
        sub.join(rings, key_cols)
        .withColumn("_hl", hits("(mx + ox)", "(my + oy)"))
        .withColumn("_hr", hits("(mx - ox)", "(my - oy)"))
    )
    if has_rid:
        per_poly = joined.groupBy(*sub_keys, "rpid").agg(
            (F.sum("_hl") % 2 == 1).cast("int").alias("_inl"),
            (F.sum("_hr") % 2 == 1).cast("int").alias("_inr"),
        )
        cov = per_poly.groupBy(*sub_keys).agg(
            F.max("_inl").alias("covl"), F.max("_inr").alias("covr")
        )
    else:
        cov = joined.groupBy(*sub_keys).agg(
            F.max((F.col("_hl") % 2 == 1).cast("int")).alias("covl"),
            F.max((F.col("_hr") % 2 == 1).cast("int")).alias("covr"),
        )
    cov = cov.where(F.col("covl") != F.col("covr"))
    # orient interior-left: the +eps side is the left of (a -> b); if
    # only the right side is covered, flip the direction. The final
    # DISTINCT collapses identical oriented sub-edges: a collinear
    # boundary run shared by two polygons (same bits via the pinned
    # endpoint arithmetic) must enter the Green fold once, not twice.
    return cov.select(
        *key_cols,
        "_xref",
        "_yref",
        F.when(F.col("covl") == 1, F.col("ax")).otherwise(F.col("bx")).alias("ax"),
        F.when(F.col("covl") == 1, F.col("ay")).otherwise(F.col("by")).alias("ay"),
        F.when(F.col("covl") == 1, F.col("bx")).otherwise(F.col("ax")).alias("bx"),
        F.when(F.col("covl") == 1, F.col("by")).otherwise(F.col("ay")).alias("by"),
    ).distinct()


def overlap_components(
    polys: DataFrame, key_cols: list[str], pid: str = "pid"
) -> DataFrame:
    """(key..., pid, part) — connected components of the per-key
    overlap graph. ``part`` = min pid of the component. Edges of the
    graph (matching shapely ``unary_union``'s merge behavior):

    - proper edge crossing between two polygons;
    - a vertex of one polygon STRICTLY inside the other (even-odd over
      the other's rings — holes count; vertices exactly ON the other's
      boundary are excluded from the vote, since their parity is
      arbitrary);
    - a positive-length collinear overlap of two boundary edges
      (shared edges / partial shared runs / duplicate rings) — GEOS
      merges edge-touching polygons into one geometry. Isolated point
      contacts (corner touches, T-junction vertices) do NOT connect:
      GEOS returns a MultiPolygon for those (round-6; ADVICE r5,
      dissolve.py:308).

    Union-find runs one call per key over O(polygons) pairs — the
    dissolve analogue of the hull UDF's per-group altitude; state is
    O(polygons per key), never O(vertices)."""
    polys = _with_rid(polys)
    edges = _edges(polys, key_cols, pid)
    # crossing PAIRS (pid, pid) — _crossings drops the partner pid (it
    # only needs split params), so pairs are derived directly here
    a = edges.select(
        *key_cols,
        F.col("pid").alias("apid"),
        F.col("x1").alias("ax1"),
        F.col("y1").alias("ay1"),
        F.col("x2").alias("ax2"),
        F.col("y2").alias("ay2"),
    )
    b = edges.select(
        *key_cols,
        F.col("pid").alias("bpid"),
        F.col("x1").alias("bx1"),
        F.col("y1").alias("by1"),
        F.col("x2").alias("bx2"),
        F.col("y2").alias("by2"),
    )
    pair = a.join(b, key_cols).where(F.col("apid") < F.col("bpid"))
    d1x = F.col("ax2") - F.col("ax1")
    d1y = F.col("ay2") - F.col("ay1")
    d2x = F.col("bx2") - F.col("bx1")
    d2y = F.col("by2") - F.col("by1")
    qpx = F.col("bx1") - F.col("ax1")
    qpy = F.col("by1") - F.col("ay1")
    denom = d1x * d2y - d1y * d2x
    t = (qpx * d2y - qpy * d2x) / denom
    u = (qpx * d1y - qpy * d1x) / denom
    cross_pairs = (
        pair.withColumn("_den", denom)
        .where(F.col("_den") != 0)
        .where((t > 0) & (t < 1) & (u > 0) & (u < 1))
        .select(*key_cols, F.col("apid").alias("p"), F.col("bpid").alias("q"))
        .distinct()
    )
    # positive-length collinear overlap: parallel (den == 0), b1 on
    # e's line (cross == 0), and the projection interval of f onto e
    # strictly overlaps (0, 1). Endpoint-only contact projects to
    # exactly {0} or {1} — measure zero, excluded by the strict
    # inequalities, so corner touches stay separate parts.
    len2 = d1x * d1x + d1y * d1y
    t1 = (qpx * d1x + qpy * d1y) / len2
    t2 = ((F.col("bx2") - F.col("ax1")) * d1x + (F.col("by2") - F.col("ay1")) * d1y) / len2
    touch_pairs = (
        pair.where((denom == 0) & (d1x * qpy - d1y * qpx == 0))
        .where((F.least(t1, t2) < 1) & (F.greatest(t1, t2) > 0))
        .select(*key_cols, F.col("apid").alias("p"), F.col("bpid").alias("q"))
        .distinct()
    )
    # containment: ANY vertex of p strictly inside polygon q (parity
    # over q's rings), vertices exactly on q's boundary excluded. A
    # first-vertex-only test misses rings whose first vertex lies ON
    # the other boundary; if every vertex of p is outside or on ∂q yet
    # the interiors still overlap, a proper crossing exists and
    # cross_pairs already connects the pair.
    va = (
        polys.select(
            *key_cols,
            F.col(pid).alias("p"),
            F.expr(
                "explode(transform(sequence(0, size(xs) - 2), "
                "i -> struct(xs[i] AS vx, ys[i] AS vy)))"
            ).alias("v"),
        )
        .select(*key_cols, "p", "v.*")
        .distinct()
    )
    pb = polys.select(
        *key_cols, F.col(pid).alias("q"), F.col("xs").alias("rxs"), F.col("ys").alias("rys")
    )
    ray_hits = F.expr(
        """
        size(filter(sequence(0, size(rxs) - 2), i ->
            ((rys[i+1] > vy) != (rys[i] > vy)) AND
            (vx < (rxs[i] - rxs[i+1]) * (vy - rys[i+1])
                  / (rys[i] - rys[i+1]) + rxs[i+1])
        ))
        """
    )
    on_boundary = F.expr(
        """
        exists(sequence(0, size(rxs) - 2), i ->
            (rxs[i+1] - rxs[i]) * (vy - rys[i]) -
            (rys[i+1] - rys[i]) * (vx - rxs[i]) = 0 AND
            (vx - rxs[i]) * (rxs[i+1] - rxs[i]) +
            (vy - rys[i]) * (rys[i+1] - rys[i]) >= 0 AND
            (vx - rxs[i]) * (rxs[i+1] - rxs[i]) +
            (vy - rys[i]) * (rys[i+1] - rys[i]) <=
            (rxs[i+1] - rxs[i]) * (rxs[i+1] - rxs[i]) +
            (rys[i+1] - rys[i]) * (rys[i+1] - rys[i])
        )
        """
    )
    contain_pairs = (
        va.join(pb, key_cols)
        .where(F.col("p") != F.col("q"))
        .withColumn("_hits", ray_hits)
        .withColumn("_onb", on_boundary)
        .groupBy(*key_cols, "p", "q", "vx", "vy")
        .agg(
            (F.sum("_hits") % 2 == 1).alias("_in"),
            F.max(F.col("_onb").cast("int")).alias("_onbi"),
        )
        .where(F.col("_in") & (F.col("_onbi") == 0))
        .select(*key_cols, F.least("p", "q").alias("p"), F.greatest("p", "q").alias("q"))
        .distinct()
    )
    all_pairs = (
        cross_pairs.unionByName(touch_pairs).unionByName(contain_pairs).distinct()
    )
    pairs_per_key = all_pairs.groupBy(*key_cols).agg(
        F.collect_list(F.struct("p", "q")).alias("prs")
    )
    nodes = polys.select(*key_cols, F.col(pid).alias("pid")).distinct()
    keyed = nodes.join(pairs_per_key, key_cols, "left")

    out_schema = ", ".join(
        f"`{c}` {t}" for c, t in keyed.select(*key_cols, "pid").dtypes
    ) + ", part bigint"

    def uf(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for v in pdf["pid"]:
            find(int(v))
        prs = pdf["prs"].iloc[0]
        if prs is not None:
            for e in prs:
                rp, rq = find(int(e["p"])), find(int(e["q"]))
                if rp != rq:
                    parent[max(rp, rq)] = min(rp, rq)
        # label = min pid of the component
        root_min: dict[int, int] = {}
        for v in pdf["pid"]:
            r = find(int(v))
            root_min[r] = min(root_min.get(r, int(v)), int(v))
        out = pdf[[*key_cols, "pid"]].copy()
        out["part"] = [root_min[find(int(v))] for v in pdf["pid"]]
        return out

    return keyed.groupBy(*key_cols).applyInPandas(uf, schema=out_schema)


def dissolve_stats(
    polys: DataFrame,
    key_cols: list[str],
    pid: str = "pid",
    eps: float = 1e-6,
) -> DataFrame:
    """Scalar dissolve summary per key: n_polys, n_parts (merged
    regions), union_area (Green fold over boundary sub-edges) and
    sum_part_area (Σ per-polygon areas of the inputs: |outer ring| −
    Σ|hole rings| when ``rid`` marks holes) — by construction
    union_area ≤ sum_part_area, equality iff nothing overlaps."""
    # pass the ORIGINAL frame to the overlay: boundary_subedges keys its
    # single-ring fast path off the absence of a rid column, so
    # pre-applying _with_rid here would force every dissolve_stats call
    # onto the two-level per-polygon aggregation (ADVICE r6)
    bnd = boundary_subedges(polys, key_cols, pid, eps)
    components = overlap_components(polys, key_cols, pid)
    polys = _with_rid(polys)
    area = bnd.groupBy(*key_cols).agg(
        F.sum((F.col("ax") * F.col("by") - F.col("bx") * F.col("ay")) / 2).alias(
            "union_area"
        )
    )
    shoelace = F.expr(
        """
        abs(aggregate(sequence(0, size(xs) - 2), cast(0.0 as double),
            (acc, i) -> acc + (xs[i] * ys[i+1] - xs[i+1] * ys[i]))) / 2
        """
    )
    # holes subtract: |outer| - Σ|holes| per polygon, orientation-free
    signed = F.when(F.col("rid") == 0, shoelace).otherwise(-shoelace)
    parts = components.groupBy(*key_cols).agg(
        F.countDistinct("part").alias("n_parts")
    )
    base = polys.groupBy(*key_cols).agg(
        F.countDistinct(F.col(pid)).alias("n_polys"),
        F.sum(signed).alias("sum_part_area"),
    )
    return base.join(parts, key_cols).join(area, key_cols)


def dissolve_rings(
    polys: DataFrame,
    key_cols: list[str],
    pid: str = "pid",
    eps: float = 1e-6,
    snap: float = 1e-6,
) -> DataFrame:
    """Full dissolve: per key, the merged geometry as an array of
    CLOSED rings (outer rings CCW / holes CW by construction — every
    boundary edge carries the union interior on its left) plus
    union_area. Chaining runs once per key over the (small) boundary
    edge set; endpoints are snapped to ``snap`` (crossing points are
    computed from two different edges, so their bits differ by ulps).
    Coordinates are translated back to the input frame."""
    bnd = boundary_subedges(polys, key_cols, pid, eps)

    key_t = dict(bnd.dtypes)
    out_schema = (
        ", ".join(f"`{c}` {key_t[c]}" for c in key_cols)
        + ", rings array<array<struct<x: double, y: double>>>, union_area double"
    )

    def chain(pdf: pd.DataFrame) -> pd.DataFrame:
        xref = float(pdf["_xref"].iloc[0])
        yref = float(pdf["_yref"].iloc[0])
        k = lambda x, y: (round(x / snap), round(y / snap))  # noqa: E731
        nxt: dict[tuple[int, int], list[int]] = {}
        for i, r in enumerate(pdf.itertuples()):
            nxt.setdefault(k(r.ax, r.ay), []).append(i)
        used = [False] * len(pdf)
        rings = []
        area = 0.0
        ax = pdf["ax"].to_numpy()
        ay = pdf["ay"].to_numpy()
        bx = pdf["bx"].to_numpy()
        by = pdf["by"].to_numpy()
        for start in range(len(pdf)):
            if used[start]:
                continue
            ring = [(ax[start] + xref, ay[start] + yref)]
            cur = start
            used[start] = True
            while True:
                area += (ax[cur] * by[cur] - bx[cur] * ay[cur]) / 2
                end_key = k(bx[cur], by[cur])
                ring.append((bx[cur] + xref, by[cur] + yref))
                cands = [j for j in nxt.get(end_key, []) if not used[j]]
                if not cands:
                    break  # ring closed (or open on degeneracy)
                cur = cands[0]
                used[cur] = True
            rings.append([{"x": float(x), "y": float(y)} for x, y in ring])
        first = pdf.iloc[[0]][key_cols].copy()
        first["rings"] = [rings]
        first["union_area"] = area
        return first

    return bnd.groupBy(*key_cols).applyInPandas(chain, schema=out_schema)
