"""DBSCAN tests (SURVEY M1) — blob fixtures mirror the reference's
BDD cluster-count assertions (features/subglacial_lakes.feature:13-15
asserts exact cluster counts on known data)."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from deepicedrain_spark.operators.clustering import (
    dbscan_numpy,
    dbscan_distributed,
    find_clusters,
    find_clusters_signed,
)


def blob(cx, cy, n=25, spacing=1.0):
    side = int(np.sqrt(n))
    return [
        (cx + spacing * (i % side), cy + spacing * (i // side)) for i in range(n)
    ]


def test_dbscan_numpy_two_blobs():
    pts = blob(0, 0) + blob(100, 100) + [(500.0, 500.0), (-500.0, 300.0)]
    X = np.array(pts, dtype=np.float64)
    labels = dbscan_numpy(X, eps=2.0, min_samples=5)
    assert set(labels[:25]) == {labels[0]}
    assert set(labels[25:50]) == {labels[25]}
    assert labels[0] != labels[25]
    assert labels[50] == -1 and labels[51] == -1


def test_dbscan_numpy_vs_bruteforce():
    rng = np.random.default_rng(42)
    X = rng.uniform(0, 50, size=(300, 2))
    eps, ms = 3.0, 4
    fast = dbscan_numpy(X, eps, ms)

    # brute-force core flags must agree (border assignment can differ
    # by visit order; core structure cannot)
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    nbr_count = (d2 <= eps * eps).sum(1)
    core = nbr_count >= ms
    assert ((fast >= 0) | ~core).all()  # every core point is clustered
    # two core points within eps must share a cluster
    ii, jj = np.where((d2 <= eps * eps) & core[:, None] & core[None, :])
    assert (fast[ii] == fast[jj]).all()


def test_find_clusters_per_group(spark):
    rows = []
    for g in ("basinA", "basinB"):
        off = 0 if g == "basinA" else 1000
        for x, y in blob(off, off) + blob(off + 50, off + 50):
            rows.append(Row(basin=g, x=float(x), y=float(y)))
        rows.append(Row(basin=g, x=float(off + 500), y=float(off)))
    df = spark.createDataFrame(rows)
    out = find_clusters(df, ["basin"], ["x", "y"], eps=2.0, min_samples=5)
    per = (
        out.groupBy("basin")
        .agg(
            F.countDistinct("cluster_id").alias("k"),
            F.sum(F.when(F.col("cluster_id").isNull(), 1).otherwise(0)).alias("noise"),
        )
        .collect()
    )
    for r in per:
        assert r["k"] == 2 and r["noise"] == 1
    # labels are 1-based
    assert out.agg(F.min("cluster_id")).collect()[0][0] == 1


def test_find_clusters_signed(spark):
    rows = []
    for x, y in blob(0, 0):
        rows.append(Row(basin="b", x=float(x), y=float(y), dhdt=-1.5))  # draining
    for x, y in blob(100, 100):
        rows.append(Row(basin="b", x=float(x), y=float(y), dhdt=2.0))  # filling
    df = spark.createDataFrame(rows)
    out = find_clusters_signed(
        df, ["basin"], ["x", "y"], sign_col="dhdt", eps=2.0, min_samples=5
    )
    labels = {r["cluster_id"] for r in out.select("cluster_id").distinct().collect()}
    assert labels == {-1, 1}  # draining negated, filling positive


@pytest.mark.slow
def test_dbscan_distributed_merges_across_blocks(spark):
    # one blob straddling a block border: block size = 8·eps = 16,
    # blob spans x ∈ [12, 20] ⇒ two blocks must merge labels
    pts = blob(12, 0, n=81, spacing=1.0)  # 9×9 blob, x ∈ [12,20]
    rows = [Row(point_id=i, x=float(x), y=float(y)) for i, (x, y) in enumerate(pts)]
    rows.append(Row(point_id=999, x=300.0, y=300.0))
    df = spark.createDataFrame(rows)
    out = dbscan_distributed(
        df, ["x", "y"], eps=2.0, min_samples=5, block_cells=8
    ).collect()
    by_id = {r["point_id"]: r["cluster_id"] for r in out}
    assert len(out) == 82  # every home point exactly once
    labels = {by_id[i] for i in range(81)}
    assert len(labels) == 1 and None not in labels  # one merged cluster
    assert by_id[999] is None


def test_signed_clusters_keep_zero_null_nan_rows(spark):
    """Review finding r4: rows in NEITHER sign population (0, NULL,
    NaN dhdt) return with a NULL cluster label instead of vanishing."""
    import pandas as pd

    from deepicedrain_spark.operators.clustering import find_clusters_signed

    rows = []
    for i in range(30):  # a clusterable negative population
        rows.append({"g": "a", "x": float(i % 6), "y": float(i // 6), "s": -1.0})
    rows += [
        {"g": "a", "x": 100.0, "y": 100.0, "s": 0.0},
        {"g": "a", "x": 101.0, "y": 101.0, "s": None},
        {"g": "a", "x": 102.0, "y": 102.0, "s": float("nan")},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = find_clusters_signed(df, ["g"], ["x", "y"], "s", eps=2.0, min_samples=4)
    assert out.count() == len(rows)  # nothing dropped
    null_lab = out.filter(F.col("cluster_id").isNull())
    assert null_lab.count() == 3
    assert sorted(r["x"] for r in null_lab.collect()) == [100.0, 101.0, 102.0]


def test_dbscan_merge_guard_fallback_identical_labels(spark):
    """VERDICT r4 task 5: an adversarial eps/grid making fragments ~
    points (>10^4 isolated singleton clusters) must produce IDENTICAL
    cluster partitions through the driver union-find path and the
    distributed label-propagation fallback."""
    import numpy as np
    from pyspark.sql import functions as F

    from deepicedrain_spark.operators.clustering import dbscan_distributed

    # 110x110 grid, spacing 3, eps=1, min_samples=1: every point is its
    # own core cluster -> >=12100 fragments (more with halo copies)
    n = 110
    xs, ys = np.meshgrid(np.arange(n) * 3.0, np.arange(n) * 3.0)
    pts = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(xs.ravel(), ys.ravel()))]
    df = spark.createDataFrame(pts, "point_id long, x double, y double")

    kw = dict(feature_cols=["x", "y"], eps=1.0, min_samples=1, block_cells=4)
    a = dbscan_distributed(df, **kw).select("point_id", "cluster_id").collect()
    b = dbscan_distributed(df, **kw, merge_collect_max=1).select(
        "point_id", "cluster_id"
    ).collect()
    la = {r["point_id"]: r["cluster_id"] for r in a}
    lb = {r["point_id"]: r["cluster_id"] for r in b}
    assert len(la) == n * n == len(lb)
    assert la == lb  # identical labels, not just identical partitions
    assert len(set(la.values())) == n * n  # every point its own cluster


def test_dbscan_merge_guard_fallback_merges_clusters(spark):
    """The fallback path must still MERGE fragments across blocks: a
    dense line of points spanning many blocks is one cluster on both
    paths."""
    import numpy as np
    from pyspark.sql import functions as F

    from deepicedrain_spark.operators.clustering import dbscan_distributed

    xs = np.arange(0, 400, 0.5)
    pts = [(int(i), float(x), 0.0) for i, x in enumerate(xs)]
    df = spark.createDataFrame(pts, "point_id long, x double, y double")
    kw = dict(feature_cols=["x", "y"], eps=1.0, min_samples=3, block_cells=8)
    a = {r["point_id"]: r["cluster_id"]
         for r in dbscan_distributed(df, **kw).collect()}
    b = {r["point_id"]: r["cluster_id"]
         for r in dbscan_distributed(df, **kw, merge_collect_max=1).collect()}
    assert a == b
    assert len(set(a.values())) == 1  # one cluster spanning ~50 blocks
