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
