"""Property-based tests (hypothesis) for core operator math.

The reference has no property testing (SURVEY §5); this layer pins the
engine's custom math against independent reference implementations on
randomized inputs: regression vs numpy lstsq, prefix-sum window frames
vs brute force, convex hull vs an independent scan, DBSCAN label
semantics, and ray-cast point-in-polygon vs a sign-test on convex
polygons.

Spark-roundtrip examples are capped (max_examples ~8) to keep the
suite fast; the pure-Python kernels (dbscan_numpy, monotone chain) get
wider sweeps.
"""

import math

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from deepicedrain_spark.operators.clustering import dbscan_numpy
from deepicedrain_spark.operators.regression import grouped_linregress
from deepicedrain_spark.operators.spatial import _monotone_chain, polygons_df, point_in_polygon
from deepicedrain_spark.operators.windows import trailing_range_sums_prefix
from deepicedrain_spark.functions.reshape import long_to_wide, wide_to_long

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
FAST = settings(max_examples=50, deadline=None)

finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64)


# --- regression vs numpy ---------------------------------------------


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 3), finite, finite),
        min_size=8,
        max_size=40,
    )
)
def test_grouped_linregress_matches_numpy(spark, rows):
    pdf = pd.DataFrame(rows, columns=["g", "x", "y"])
    # degenerate x (zero / denormal variance) makes the fit undefined —
    # numpy's own polyfit SVD fails to converge on e.g. {0.0, 2e-311} —
    # keep groups with >= 3 rows and a numerically meaningful x spread
    keep = pdf.groupby("g").filter(
        lambda d: len(d) >= 3 and d.x.max() - d.x.min() > 1e-6
    )
    if keep.empty:
        return
    got = {
        r["g"]: r
        for r in grouped_linregress(
            spark.createDataFrame(keep), ["g"], "y", "x"
        ).collect()
    }
    for g, d in keep.groupby("g"):
        slope, intercept = np.polyfit(d.x, d.y, 1)
        assert math.isclose(got[g]["slope"], slope, rel_tol=1e-6, abs_tol=1e-6)
        assert math.isclose(got[g]["intercept"], intercept, rel_tol=1e-6, abs_tol=1e-4)
        assert got[g]["n"] == len(d)


# --- prefix-sum trailing frame vs brute force ------------------------


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 50), st.integers(-100, 100)),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 20),
)
def test_trailing_range_sums_prefix_brute(spark, rows, rng):
    pdf = pd.DataFrame(rows, columns=["g", "t", "c"])
    got = {
        (r["g"], r["t"]): (r["n_w"], r["c_w"])
        for r in trailing_range_sums_prefix(
            spark.createDataFrame(pdf), ["g"], "t", ["c"], rng
        ).collect()
    }
    for (g, t), _ in pdf.groupby(["g", "t"]):
        win = pdf[(pdf.g == g) & (pdf.t >= t - rng) & (pdf.t <= t)]
        assert got[(g, t)] == (len(win), win.c.sum())


# --- wide <-> long roundtrip -----------------------------------------


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 10), st.integers(1, 3), finite),
        min_size=1,
        max_size=40,
        unique_by=lambda r: (r[0], r[1]),
    )
)
def test_wide_long_roundtrip_property(spark, rows):
    pdf = pd.DataFrame(rows, columns=["id", "cycle_number", "h"])
    wide = long_to_wide(
        spark.createDataFrame(pdf), ["id"], "cycle_number", ["h"], cycles=[1, 2, 3]
    )
    back = wide_to_long(wide, ["h"], i=["id"]).select("id", "cycle_number", "h")
    got = sorted((r[0], r[1], round(r[2], 9)) for r in back.collect())
    want = sorted((r[0], r[1], round(r[2], 9)) for r in rows)
    assert got == want


# --- DBSCAN semantics (pure kernel, wide sweep) ----------------------


@FAST
@given(
    st.lists(
        st.tuples(st.floats(0, 10, allow_nan=False), st.floats(0, 10, allow_nan=False)),
        min_size=1,
        max_size=80,
    ),
    st.floats(0.2, 3.0),
    st.integers(2, 6),
)
def test_dbscan_numpy_semantics(pts, eps, min_samples):
    X = np.array(pts, dtype=np.float64)
    labels = dbscan_numpy(X, eps, min_samples)
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    nbr = d2 <= eps * eps  # includes self
    is_core = nbr.sum(1) >= min_samples
    for i in range(len(X)):
        if labels[i] == -1:
            # noise: not core, and no core neighbor
            assert not is_core[i]
            assert not (nbr[i] & is_core).any()
        elif is_core[i]:
            # core points within eps of each other share a cluster
            for j in np.nonzero(nbr[i] & is_core)[0]:
                assert labels[j] == labels[i]
        else:
            # border: labeled like one of its core neighbors
            assert labels[i] in set(labels[np.nonzero(nbr[i] & is_core)[0]])


# --- convex hull (pure kernel) ---------------------------------------


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


@FAST
@given(
    st.lists(
        st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
        min_size=3,
        max_size=60,
        unique=True,
    )
)
def test_monotone_chain_hull_contains_all(pts):
    fp = [(float(x), float(y)) for x, y in pts]
    hull = _monotone_chain(fp)
    ring = hull[:-1] if len(hull) > 1 and hull[0] == hull[-1] else hull
    assert set(ring) <= set(fp)
    if len(ring) < 3:
        # degenerate (collinear input): every point must be on the segment
        return
    # CCW ring: every input point lies left-of-or-on every edge
    for p in fp:
        for i in range(len(ring)):
            a, b = ring[i], ring[(i + 1) % len(ring)]
            assert _cross(a, b, p) >= 0


# --- ray-cast PIP vs convex sign test --------------------------------


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(-20, 20), st.integers(-20, 20)),
        min_size=6,
        max_size=24,
        unique=True,
    ),
    st.lists(
        st.tuples(st.floats(-25, 25, allow_nan=False), st.floats(-25, 25, allow_nan=False)),
        min_size=1,
        max_size=30,
    ),
)
def test_raycast_pip_matches_convex_sign_test(spark, poly_pts, probes):
    fp = [(float(x), float(y)) for x, y in poly_pts]
    hull = _monotone_chain(fp)
    ring = hull[:-1] if len(hull) > 1 and hull[0] == hull[-1] else hull
    if len(ring) < 3:
        return
    # exclude probes on/near the boundary: edge semantics legitimately
    # differ between ray cast and the sign test at exact boundaries
    def strict_side(p):
        sides = [_cross(ring[i], ring[(i + 1) % len(ring)], p) for i in range(len(ring))]
        if any(abs(s) < 1e-9 for s in sides):
            return None  # boundary-ish, skip
        return all(s > 0 for s in sides)

    probes = [p for p in probes if strict_side(p) is not None]
    if not probes:
        return
    pts = spark.createDataFrame(
        pd.DataFrame(probes, columns=["x", "y"]).assign(pid=range(len(probes)))
    )
    polys = polygons_df(
        spark, [{"poly_id": 0, "xs": [p[0] for p in ring], "ys": [p[1] for p in ring]}]
    )
    inside = {r["pid"] for r in point_in_polygon(pts, polys).collect()}
    for i, p in enumerate(probes):
        assert (i in inside) == strict_side(p)
