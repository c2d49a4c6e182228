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
   proper segment intersections yield split parameters ``t`` (general
   position assumed — same caveat as the convex-hull oracle).
3. **sub-edges**: split every edge at its sorted ``t`` list. Endpoint
   arithmetic is pinned (``t=0``/``t=1`` return the original vertex
   bits) so both engines produce identical doubles.
4. **coverage**: each sub-edge midpoint is offset by ±eps along the
   edge normal; an even-odd ray cast (the exact
   ``raycast_predicate`` formula) against every polygon of the key
   classifies each side as inside/outside the union.
5. **boundary + area**: a sub-edge lies on the union boundary iff
   exactly one side is covered. Orienting interior-left, the union
   area is the Green's-theorem fold ``sum((ax*by - bx*ay) / 2)`` over
   boundary sub-edges — no ring chaining needed for scalars.
6. **parts**: connected components of the per-key overlap graph
   (edge crossings or first-vertex containment) count the merged
   regions, i.e. the number of geometries dissolve would output.

Every step is an equi-join or aggregation keyed by the dissolve key,
so the plan shuffles on the key only; polygon groups (lakes per
basin) are small dims while the framework scales to many keys. The
oracle can replay steps 1-5 verbatim in SQL because every float op is
written identically on both sides.

Scope: single-ring simple polygons in general position (no shared
edges / vertex-on-edge contacts, no holes in the *inputs*) — the
reference's lake hulls satisfy all of these. Holes in the *output*
(a union enclosing a void) fall out of the boundary test naturally.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edges(polys: DataFrame, key_cols: list[str], pid: str) -> DataFrame:
    """Directed ring edges in per-key translated coordinates.

    Translation: subtract the key's min vertex (exact double min, so
    both engines agree bit-for-bit) — Green terms then involve
    km-scale values instead of 1e6-scale EPSG:3031 coordinates, which
    shrinks float cancellation ~1e6-fold.
    """
    refs = polys.groupBy(*key_cols).agg(
        F.min(F.array_min("xs")).alias("_xref"),
        F.min(F.array_min("ys")).alias("_yref"),
    )
    p = polys.join(F.broadcast(refs), key_cols)
    return p.select(
        *key_cols,
        F.col(pid).alias("pid"),
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
    ).select(*key_cols, "pid", "_xref", "_yref", "e.*")


def _crossings(edges: DataFrame, key_cols: list[str]) -> DataFrame:
    """Proper crossings between edges of DIFFERENT polygons of a key:
    (key, pid, eid, t) — the split parameter on the (pid, eid) edge.
    Emitted from BOTH sides of the e×f pair (t for e, u for f), so one
    join covers every edge's splits."""
    a = edges.select(
        *key_cols,
        F.col("pid").alias("apid"),
        F.col("eid").alias("aeid"),
        F.col("x1").alias("ax1"),
        F.col("y1").alias("ay1"),
        F.col("x2").alias("ax2"),
        F.col("y2").alias("ay2"),
    )
    b = edges.select(
        *key_cols,
        F.col("pid").alias("bpid"),
        F.col("eid").alias("beid"),
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
    hit = (
        pair.withColumn("_den", denom)
        .where(F.col("_den") != 0)
        .withColumn("t", t)
        .withColumn("u", u)
        .where((F.col("t") > 0) & (F.col("t") < 1) & (F.col("u") > 0) & (F.col("u") < 1))
        .select(*key_cols, F.col("apid").alias("pid"), F.col("aeid").alias("eid"), "t")
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
            .select(*key_cols, F.col("apid").alias("pid"), F.col("aeid").alias("eid"), "t")
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
    closed rings as xs/ys array<double> plus a per-key-unique ``pid``.
    """
    edges = _edges(polys, key_cols, pid)
    splits = (
        _crossings(edges, key_cols)
        .groupBy(*key_cols, "pid", "eid")
        .agg(F.collect_list("t").alias("_ts"))
    )
    sub = (
        edges.join(splits, [*key_cols, "pid", "eid"], "left")
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
        .select(*key_cols, "pid", "eid", "x1", "y1", "x2", "y2", "_xref", "_yref", "s.*")
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
    sub = (
        sub.withColumn("ax", px("ta"))
        .withColumn("ay", py("ta"))
        .withColumn("bx", px("tb"))
        .withColumn("by", py("tb"))
        .withColumn("mx", F.col("x1") + tm * (F.col("x2") - F.col("x1")))
        .withColumn("my", F.col("y1") + tm * (F.col("y2") - F.col("y1")))
        .withColumn("ox", F.lit(-eps) * (F.col("y2") - F.col("y1")))
        .withColumn("oy", F.lit(eps) * (F.col("x2") - F.col("x1")))
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
    # translated ray cast: identical formula to raycast_predicate, on
    # ring coords shifted by the same per-key reference
    pip = lambda qx, qy: F.expr(  # noqa: E731
        f"""
        size(filter(sequence(0, size(txs) - 2), i ->
            ((tys[i+1] > {qy}) != (tys[i] > {qy})) AND
            ({qx} < (txs[i] - txs[i+1])
                    * ({qy} - tys[i+1])
                    / (tys[i] - tys[i+1])
                    + txs[i+1])
        )) % 2 = 1
        """
    )
    cov = (
        sub.join(rings, key_cols)
        .withColumn("_inl", pip("(mx + ox)", "(my + oy)").cast("int"))
        .withColumn("_inr", pip("(mx - ox)", "(my - oy)").cast("int"))
        .groupBy(*key_cols, "pid", "eid", "ta", "tb", "ax", "ay", "bx", "by", "_xref", "_yref")
        .agg(F.max("_inl").alias("covl"), F.max("_inr").alias("covr"))
        .where(F.col("covl") != F.col("covr"))
    )
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
    overlap graph (proper edge crossing OR first-vertex containment).
    ``part`` = min pid of the component. Union-find runs one call per
    key over O(polygons) pairs — the dissolve analogue of the hull
    UDF's per-group altitude; state is O(polygons per key), never
    O(vertices)."""
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
    # containment: first vertex of one ring inside the other
    pa = polys.select(
        *key_cols,
        F.col(pid).alias("p"),
        F.element_at("xs", 1).alias("vx"),
        F.element_at("ys", 1).alias("vy"),
    )
    pb = polys.select(
        *key_cols, F.col(pid).alias("q"), F.col("xs").alias("rxs"), F.col("ys").alias("rys")
    )
    inside = F.expr(
        """
        size(filter(sequence(0, size(rxs) - 2), i ->
            ((rys[i+1] > vy) != (rys[i] > vy)) AND
            (vx < (rxs[i] - rxs[i+1]) * (vy - rys[i+1])
                  / (rys[i] - rys[i+1]) + rxs[i+1])
        )) % 2 = 1
        """
    )
    contain_pairs = (
        pa.join(pb, key_cols)
        .where(F.col("p") != F.col("q"))
        .where(inside)
        .select(*key_cols, F.least("p", "q").alias("p"), F.greatest("p", "q").alias("q"))
        .distinct()
    )
    all_pairs = cross_pairs.unionByName(contain_pairs).distinct()
    pairs_per_key = all_pairs.groupBy(*key_cols).agg(
        F.collect_list(F.struct("p", "q")).alias("prs")
    )
    nodes = polys.select(*key_cols, F.col(pid).alias("pid"))
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
    sum_part_area (Σ shoelace of the inputs) — by construction
    union_area ≤ sum_part_area, equality iff nothing overlaps."""
    bnd = boundary_subedges(polys, key_cols, pid, eps)
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
    parts = (
        overlap_components(polys, key_cols, pid)
        .groupBy(*key_cols)
        .agg(F.countDistinct("part").alias("n_parts"))
    )
    base = polys.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_polys"),
        F.sum(shoelace).alias("sum_part_area"),
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
