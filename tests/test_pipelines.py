"""End-to-end pipeline tests (SURVEY §3) — synthetic fixtures per
FIXTURES.md §2 with known cluster counts, exact slopes, and exact
crossover geometry (mirrors the reference's BDD layer)."""

import math
import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from deepicedrain_spark.functions.timeutils import NS_PER_YEAR
from deepicedrain_spark.operators.gridding import interpolate_grid
from deepicedrain_spark.operators.spatial import polygons_df
from deepicedrain_spark.plans.dhdt import compute_dhdt
from deepicedrain_spark.plans.lakes import find_lakes
from deepicedrain_spark.plans.xover import (
    crossover_analysis,
    crossover_height_series,
)
from deepicedrain_spark.region import Region


def test_dhdt_pipeline_exact_slopes(spark):
    rows = []
    # point 1: h = 100 + 2.0 m/yr; point 2: h = 50 - 1.5 m/yr
    for pt, (a, b) in {1: (100.0, 2.0), 2: (50.0, -1.5)}.items():
        for c in range(5):
            t = c * NS_PER_YEAR / 4
            rows.append(
                Row(ref_pt=pt, referencegroundtrack=1, pairtrack="pt1",
                    cycle=c, delta_time_ns=float(t),
                    h_corr=a + b * (t / NS_PER_YEAR), x=float(pt), y=0.0)
            )
    # point 3: only one valid height → dropped by threshold
    rows.append(Row(ref_pt=3, referencegroundtrack=1, pairtrack="pt1",
                    cycle=0, delta_time_ns=0.0, h_corr=10.0, x=3.0, y=0.0))
    # point 4: flat (range < 0.25 m) → dropped by range floor
    for c in range(5):
        rows.append(Row(ref_pt=4, referencegroundtrack=1, pairtrack="pt1",
                        cycle=c, delta_time_ns=float(c * NS_PER_YEAR / 4),
                        h_corr=20.0 + 0.01 * c, x=4.0, y=0.0))
    df = spark.createDataFrame(rows)
    out = {r["ref_pt"]: r for r in compute_dhdt(df).collect()}
    assert set(out) == {1, 2}
    assert math.isclose(out[1]["dhdt_slope"], 2.0, rel_tol=1e-9)
    assert math.isclose(out[2]["dhdt_slope"], -1.5, rel_tol=1e-9)
    assert out[1]["n"] == 5 and math.isclose(out[1]["r2"], 1.0, rel_tol=1e-9)


def _lake_points():
    random.seed(7)
    rows = []
    # draining blob at (100,100), filling blob at (800,800): 10×10 grids
    for i in range(100):
        rows.append((100.0 + 10 * (i % 10), 100.0 + 10 * (i // 10), -2.0, 11))
        rows.append((800.0 + 10 * (i % 10), 800.0 + 10 * (i // 10), 3.0, 22))
    # active-but-diffuse background (median setter + donut population)
    for _ in range(300):
        rows.append(
            (random.uniform(0, 1000), random.uniform(0, 1000),
             random.choice([-1, 1]) * random.uniform(0.15, 0.25), 33)
        )
    # sub-noise-floor points (dropped by the 0.105 filter)
    for _ in range(50):
        rows.append((random.uniform(0, 1000), random.uniform(0, 1000), 0.05, 44))
    return [Row(x=r[0], y=r[1], dhdt_slope=r[2], referencegroundtrack=r[3]) for r in rows]


def test_lake_finder_pipeline(spark):
    pts = spark.createDataFrame(_lake_points())
    basins = polygons_df(
        spark,
        [{"poly_id": "whillans", "xs": [-50.0, 1050.0, 1050.0, -50.0],
          "ys": [-50.0, -50.0, 1050.0, 1050.0]}],
    ).withColumnRenamed("poly_id", "basin_name")
    lakes = find_lakes(
        pts, basins, eps=50.0, min_samples=25, basin_col="basin_name"
    ).collect()
    assert len(lakes) == 2
    by_sign = {1 if r["cluster_id"] > 0 else -1: r for r in lakes}
    assert set(by_sign) == {-1, 1}
    assert by_sign[-1]["num_points"] == 100 and by_sign[1]["num_points"] == 100
    assert by_sign[-1]["maxabsdhdt"] == -2.0  # draining: most negative
    assert by_sign[1]["maxabsdhdt"] == 3.0
    assert by_sign[-1]["inner_dhdt"] == -2.0
    # hull of a 90×90 grid blob
    assert math.isclose(by_sign[1]["area_m2"], 8100.0, rel_tol=1e-9)
    assert "11" in by_sign[-1]["refgtracks"]


def test_crossover_pipeline(spark):
    rows = []
    # rgt 1 heading NE, observed twice (pt1); rgt 2 heading NW, later
    for i in range(11):
        rows.append(Row(referencegroundtrack=1, pairtrack="pt1",
                        x=float(i * 10), y=float(i * 10), h=100.0 + 0.1 * i,
                        t=1000.0 + i))
        rows.append(Row(referencegroundtrack=2, pairtrack="pt1",
                        x=float(i * 10), y=100.0 - i * 10, h=120.0 + 0.1 * i,
                        t=500_000.0 + i))
    df = spark.createDataFrame(rows)
    xo = crossover_analysis(df, t_col="t", cell=100.0, max_gap=None).collect()
    assert len(xo) == 1
    r = xo[0]
    assert r["track1"] == "0001_pt1" and r["track2"] == "0002_pt1"  # time-ordered
    assert math.isclose(r["x"], 50.0, abs_tol=1e-9) and math.isclose(r["y"], 50.0, abs_tol=1e-9)
    assert math.isclose(r["h_X"], 20.0, abs_tol=1e-6)  # later minus earlier
    assert r["t_D"] > 0
    series = crossover_height_series(spark.createDataFrame(xo))
    anoms = {round(s["t"]): s["h_anom"] for s in series.collect()}
    assert math.isclose(min(anoms.values()), 0.0, abs_tol=1e-9)  # first obs
    assert math.isclose(max(anoms.values()), 20.0, abs_tol=1e-6)


def test_interpolate_grid_idw(spark):
    # flat plane z=5 with a bump at center; far corner has no data
    rows = [Row(x=float(i), y=float(j), z=5.0)
            for i in range(0, 50, 5) for j in range(0, 50, 5)]
    df = spark.createDataFrame(rows)
    region = Region("g", 0.0, 100.0, 0.0, 100.0)
    grid = interpolate_grid(df, region, spacing=10.0, search_cells=2, block_cells=4)
    cells = {(r["gx"], r["gy"]): r["zi"] for r in grid.collect()}
    # data-covered nodes interpolate to the plane value
    assert math.isclose(cells[(2, 2)], 5.0, rel_tol=1e-9)
    # far corner (>2 cells from any data) is masked out entirely
    assert (9, 9) not in cells
    assert all(abs(v - 5.0) < 1e-6 for v in cells.values())


def test_tension_spline_paths_identical(spark):
    """Dense-array and stencil-join relaxations must be bit-identical:
    Jacobi reads only the previous iteration and both paths run the
    same fixed-order IEEE arithmetic."""
    import random

    from pyspark.sql import Row
    from deepicedrain_spark.operators.gridding import tension_spline_grid
    from deepicedrain_spark.region import Region

    random.seed(7)
    rows = [
        Row(x=random.uniform(-0.45, 0.45), y=random.uniform(-0.45, 0.45),
            z=random.uniform(0.0, 10.0))
        for _ in range(120)
    ]
    df = spark.createDataFrame(rows)
    region = Region("t", -0.5, 0.5, -0.5, 0.5)
    kw = dict(spacing=0.1, tension=0.35, iters=8, mask_cells=2)
    dense = {(r["gx"], r["gy"]): r["zs"]
             for r in tension_spline_grid(df, region, **kw).collect()}
    joins = {(r["gx"], r["gy"]): r["zs"]
             for r in tension_spline_grid(df, region, dense_cells=0, **kw).collect()}
    assert dense == joins and len(dense) > 0


def test_dissolve_lake_catalog_snaps_noisy_contacts(spark):
    """Pipeline-level snap default (r9): two adjacent lakes out of
    find_lakes share a shore edge; after simulated reprojection noise
    (one lake's xs shifted by 5e-8, well under snap_vertices' auto
    grid of ~1e-9 x bbox span but enough to break exact-vertex
    contact), dissolve_lake_catalog's default snap='auto' still merges
    them into ONE part — the GEOS-unary_union behavior a reference
    user gets implicitly — while snap=None (the low-level bit-parity
    default) leaves them as two."""
    from deepicedrain_spark.plans.lakes import dissolve_lake_catalog, find_lakes

    rows = []
    # draining grid x in [100, 200], filling grid x in [200, 300]:
    # both blobs own points ON the x=200 contact line, so the two
    # signed clusters' hulls share the (200,100)-(200,200) edge
    for i in range(11):
        for j in range(11):
            rows.append((100.0 + 10 * i, 100.0 + 10 * j, -2.0, 11))
            rows.append((200.0 + 10 * i, 100.0 + 10 * j, 3.0, 22))
    # diffuse active background: median setter + donut population
    random.seed(9)
    for _ in range(300):
        rows.append(
            (random.uniform(50, 350), random.uniform(50, 250),
             random.choice([-1, 1]) * random.uniform(0.15, 0.25), 33)
        )
    pts = spark.createDataFrame(
        [Row(x=r[0], y=r[1], dhdt_slope=r[2], referencegroundtrack=r[3]) for r in rows]
    )
    basins = polygons_df(
        spark,
        [{"poly_id": "whillans", "xs": [0.0, 400.0, 400.0, 0.0],
          "ys": [0.0, 0.0, 300.0, 300.0]}],
    ).withColumnRenamed("poly_id", "basin_name")
    lakes = find_lakes(pts, basins, eps=50.0, min_samples=25, basin_col="basin_name")
    assert lakes.count() == 2
    # simulate reprojection noise on ONE lake's ring
    noisy = lakes.withColumn(
        "hull",
        F.when(
            F.col("cluster_id") > 0,
            F.expr("transform(hull, p -> named_struct('x', p.x + 5e-8, 'y', p.y))"),
        ).otherwise(F.col("hull")),
    )
    snapped = dissolve_lake_catalog(noisy).collect()[0]
    exact = dissolve_lake_catalog(noisy, snap=None).collect()[0]
    assert snapped["n_polys"] == 2 and exact["n_polys"] == 2
    assert snapped["n_parts"] == 1  # auto-snap merges the shared shore
    assert exact["n_parts"] == 2  # bit-parity default keeps them apart
