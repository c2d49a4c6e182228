"""Crossover join tests (SURVEY J3) — exact-intersection goldens and
x2sys gap semantics (-Wd250e, X2SYS/ICESAT2.tag:6)."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from deepicedrain_spark.operators.crossover import (
    crossover_errors,
    crossover_join,
    track_segments,
)


def make_tracks(spark):
    # track A along y=x, heights rising 100→110, times 0..10
    # track B along y=10−x, heights 200→210, times 100..110
    rows = []
    for i in range(11):
        rows.append(Row(track_id="A", t=float(i), x=float(i), y=float(i), h=100.0 + i))
        rows.append(Row(track_id="B", t=100.0 + i, x=float(i), y=10.0 - i, h=200.0 + i))
    return spark.createDataFrame(rows)


def test_crossover_exact_intersection(spark):
    df = make_tracks(spark)
    segs = track_segments(df, max_gap=None)
    x = crossover_join(segs, cell=3.0).collect()
    assert len(x) == 1
    r = x[0]
    assert (r["track1"], r["track2"]) == ("A", "B")
    assert math.isclose(r["x"], 5.0, abs_tol=1e-12)
    assert math.isclose(r["y"], 5.0, abs_tol=1e-12)
    assert math.isclose(r["h_1"], 105.0, abs_tol=1e-12)
    assert math.isclose(r["h_2"], 205.0, abs_tol=1e-12)
    assert math.isclose(r["t_1"], 5.0, abs_tol=1e-12)
    assert math.isclose(r["t_2"], 105.0, abs_tol=1e-12)


def test_crossover_errors_derivation(spark):
    df = make_tracks(spark)
    segs = track_segments(df, max_gap=None)
    errs = crossover_errors(crossover_join(segs, cell=3.0), seconds_per_year=1.0).collect()[0]
    assert math.isclose(errs["h_X"], 100.0, abs_tol=1e-12)
    assert math.isclose(errs["t_D"], 100.0, abs_tol=1e-12)
    assert math.isclose(errs["dhdt"], 1.0, abs_tol=1e-12)


def test_gap_limit_drops_sparse_segments(spark):
    rows = [
        Row(track_id="A", t=float(i), x=300.0 * i, y=0.0, h=1.0) for i in range(4)
    ] + [
        Row(track_id="B", t=float(i), x=450.0, y=-500.0 + 300.0 * i, h=2.0)
        for i in range(4)
    ]
    df = spark.createDataFrame(rows)
    # 300 m spacing > 250 m gap limit ⇒ no segments ⇒ no crossovers
    assert crossover_join(track_segments(df, max_gap=250.0), cell=1000.0).count() == 0
    # with the limit lifted the tracks do cross
    assert crossover_join(track_segments(df, max_gap=None), cell=1000.0).count() == 1


def test_same_rgt_pairs_pruned(spark):
    rows = []
    for i in range(5):
        rows.append(Row(track_id="0111_pt1", t=float(i), x=float(i), y=float(i), h=1.0))
        rows.append(Row(track_id="0111_pt2", t=float(i), x=float(i), y=4.0 - i, h=2.0))
    df = spark.createDataFrame(rows)
    segs = track_segments(df, max_gap=None)
    rgt = lambda c: F.split(c, "_").getItem(0)  # noqa: E731
    assert crossover_join(segs, cell=10.0).count() == 1
    assert crossover_join(segs, cell=10.0, rgt_of=rgt).count() == 0


def test_densify_greatcircle_invariants(spark):
    """Densified points are on the unit sphere, coplanar with the
    endpoint great circle, spaced under max arc, and preserve
    endpoints/attributes."""
    import math

    from pyspark.sql import Row
    from deepicedrain_spark.operators.crossover import densify_track_greatcircle

    a = (-50.0, -70.0, 10.0)
    b = (-40.0, -72.0, 20.0)
    df = spark.createDataFrame(
        [Row(track_id=1, rn=1.0, lon=a[0], lat=a[1], h=a[2]),
         Row(track_id=1, rn=2.0, lon=b[0], lat=b[1], h=b[2])]
    )
    R = 6_371_008.8
    out = densify_track_greatcircle(
        df, track_col="track_id", order_col="rn", max_seg_m=50_000.0, radius_m=R
    ).collect()
    pts = sorted(((r["rn"], r["i"]), r) for r in out)
    rows = [r for _, r in pts]
    # endpoints exact
    assert (rows[0]["lon"], rows[0]["lat"], rows[0]["h"]) == a
    assert (rows[-1]["lon"], rows[-1]["lat"], rows[-1]["h"]) == b

    def unit(lon, lat):
        lam, phi = math.radians(lon), math.radians(lat)
        return (math.cos(phi) * math.cos(lam), math.cos(phi) * math.sin(lam), math.sin(phi))

    va, vb = unit(*a[:2]), unit(*b[:2])
    normal = (va[1] * vb[2] - va[2] * vb[1], va[2] * vb[0] - va[0] * vb[2],
              va[0] * vb[1] - va[1] * vb[0])
    prev = None
    for r in rows:
        p = unit(r["lon"], r["lat"])
        # coplanar with the A-B great circle
        assert abs(sum(pi * ni for pi, ni in zip(p, normal))) < 1e-9
        if prev is not None:
            dot = max(-1.0, min(1.0, sum(x * y for x, y in zip(prev, p))))
            assert math.acos(dot) * R <= 50_000.0 + 1e-6
        prev = p
    # h interpolates monotonically between endpoints
    hs = [r["h"] for r in rows]
    assert hs == sorted(hs) and hs[0] == 10.0 and hs[-1] == 20.0


def test_crossover_dedup_bitwise_deterministic(spark):
    """Property (VERDICT r2 nit): dropDuplicates on float coordinates
    is exact-match dedup, so its correctness rests on every cell that
    sees a crossing computing BIT-IDENTICAL doubles from the same two
    segments. Assert the full crossover output is invariant — value
    sets compared by exact float equality — across repartitionings,
    AQE on/off, and different cell sizes (which reassign crossings to
    different cells and tasks)."""
    import numpy as np
    import pandas as pd

    rng = np.arange(40)
    rows = []
    for tr in range(12):
        # pseudo-random but deterministic diagonal-ish tracks
        x0 = (tr * 773) % 50 - 25.0
        y0 = (tr * 391) % 40 - 20.0
        dx = 1.0 + ((tr * 7) % 5) * 0.25
        dy = -2.0 + ((tr * 13) % 9) * 0.5
        for i in rng:
            jitter = (((tr * 40 + int(i)) * 2654435761) % 1000) / 5000.0
            rows.append(
                {
                    "track_id": f"T{tr:02d}",
                    "t": float(i),
                    "x": x0 + dx * i + jitter,
                    "y": y0 + dy * i - jitter,
                    "h": 100.0 + tr + 0.01 * i,
                }
            )
    base = spark.createDataFrame(pd.DataFrame(rows))

    def run(df, cell, parts, aqe):
        old = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        try:
            segs = track_segments(df.repartition(parts), max_gap=None)
            got = crossover_join(segs, cell=cell).collect()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", old)
        # exact float tuples — no rounding anywhere
        return sorted(
            (r["track1"], r["track2"], r["x"], r["y"], r["h_1"], r["h_2"], r["t_1"], r["t_2"])
            for r in got
        )

    baseline = run(base, cell=5.0, parts=4, aqe="true")
    assert len(baseline) > 10  # the fixture actually produces crossings
    assert run(base, cell=5.0, parts=32, aqe="true") == baseline
    assert run(base, cell=5.0, parts=7, aqe="false") == baseline
    # different cell size → crossings found in different buckets, same values
    assert run(base, cell=2.0, parts=32, aqe="true") == baseline
    assert run(base, cell=17.0, parts=3, aqe="false") == baseline
    # hot-cell salting (skew path) must be a pure execution strategy:
    # same pairs, bit-identical values
    segs = track_segments(base.repartition(16), max_gap=None)
    salted = sorted(
        (r["track1"], r["track2"], r["x"], r["y"], r["h_1"], r["h_2"], r["t_1"], r["t_2"])
        for r in crossover_join(segs, cell=5.0, hot_cell_salt=8).collect()
    )
    assert salted == baseline


def test_auto_salt_picks_one_for_uniform_and_splits_hot(spark):
    """_auto_salt: uniform cell histograms stay salt-free (S=1, the
    replication-free plan); a single dominating cell big enough to be
    a straggler gets S = ceil(max_count^2 / target), capped."""
    import pandas as pd

    from deepicedrain_spark.operators.crossover import _auto_salt

    # uniform: 100 cells x 10 segments — no skew, S must be 1
    uni = spark.createDataFrame(
        pd.DataFrame(
            {
                "cx": [i for i in range(100) for _ in range(10)],
                "cy": [0] * 1000,
            }
        )
    )
    assert _auto_salt(uni) == 1

    # skewed but SMALL: max^2 below target — still 1 (no absolute need)
    skew_small = spark.createDataFrame(
        pd.DataFrame({"cx": [0] * 500 + list(range(1, 11)), "cy": [0] * 510})
    )
    assert _auto_salt(skew_small) == 1

    # skewed and heavy: max = 4000 -> S = ceil(4000^2 / 4e6) = 4
    heavy = spark.createDataFrame(
        pd.DataFrame({"cx": [0] * 4000 + list(range(1, 21)), "cy": [0] * 4020})
    )
    assert _auto_salt(heavy) == 4

    # cap: a 100k-row cell would want S=2500 -> capped at 64
    assert _auto_salt(heavy, target_pairs=1.0) == 64


def test_auto_salt_output_bit_identical(spark):
    """hot_cell_salt='auto' is a pure execution strategy — same rows,
    bit-identical floats vs the unsalted plan."""
    import pandas as pd

    rows = []
    for tr in range(12):
        for i in range(6):
            rows.append(
                {
                    "track_id": f"A{tr:02d}",
                    "t": float(i),
                    "x": -3.0 + i + 0.013 * tr,
                    "y": (-3.0 + i) * (1 if tr % 2 else -1) + 0.07 * tr,
                    "h": 50.0 + tr + 0.1 * i,
                }
            )
    base = spark.createDataFrame(pd.DataFrame(rows))
    segs = track_segments(base, max_gap=None)

    def key(df):
        return sorted(
            (r["track1"], r["track2"], r["x"], r["y"], r["h_1"], r["h_2"])
            for r in df.collect()
        )

    plain = key(crossover_join(segs, cell=5.0))
    assert len(plain) > 0
    auto = key(crossover_join(segs, cell=5.0, hot_cell_salt="auto"))
    assert auto == plain
