"""Pathological-skew stress for the cell-keyed join paths (VERDICT r2
next-step #8): what happens to crossover_join and
point_in_polygon_gridded when the data conspires to put EVERYTHING on
one join key — the one-hot-cell case that becomes a single straggler
task on a 1000-executor cluster unless AQE's skew-join split rebalances
it.

Fixture: T tracks radiating from the origin (all their inner segments
share spatial cell (0,0), and every pair genuinely crosses there —
T²/2 real crossovers inside one key), plus a point cloud whose points
all fall inside one polygon-bbox cell for the PIP path.

For each query the tool runs the plan twice — AQE skew-join ON and
OFF — through a noop sink, then reads the engine's own
SQLAppStatusStore Exchange metrics (same machinery as tools/skew.py)
and reports per-exchange min/med/max task shuffle bytes plus wall
time. The claim being demonstrated: the plans stay EQUI-KEY joins (no
crossJoin fallback), so AQE can and does split the hot partition, and
wall clock reflects parallel work rather than one giant task.

Usage: python tools/scalecheck_skew.py [n_tracks] [pip_millions]
Writes one JSON line; human summary goes to SCALE.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deepicedrain_spark.session import get_spark
from deepicedrain_spark.operators.crossover import crossover_join, track_segments
from deepicedrain_spark.operators.spatial import point_in_polygon_gridded, polygons_df

N_TRACKS = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
PIP_M = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
PTS_PER_TRACK = 8


def synth_hot_tracks(spark):
    """T tracks through the origin: track i runs along angle θ_i with
    points at radii −4..4 (cell size 1000 m puts every inner segment
    in cell (0,0)). Every track pair crosses at the origin — T²/2 real
    crossovers on ONE cell key."""
    import math

    rows = spark.range(0, N_TRACKS * PTS_PER_TRACK)
    tr = (F.col("id") / PTS_PER_TRACK).cast("long")
    k = (F.col("id") % PTS_PER_TRACK).cast("int")
    # radius −400..400 m in 100 m steps (skipping 0 keeps points distinct)
    r = (k - F.lit(PTS_PER_TRACK // 2)) * 100.0 + 50.0
    theta = tr * F.lit(math.pi / N_TRACKS)  # distinct angles in [0, π)
    return rows.select(
        F.concat(F.lit("T"), F.lpad(tr.cast("string"), 6, "0")).alias("track_id"),
        k.cast("double").alias("t"),
        (r * F.cos(theta)).alias("x"),
        (r * F.sin(theta)).alias("y"),
        (tr + k * 0.01).cast("double").alias("h"),
    )


def synth_hot_points(spark, n: int):
    """n points uniform in ONE 1 km cell + one polygon covering it —
    the whole PIP join lands on a single (cx, cy) key."""
    rows = spark.range(0, n)
    return rows.select(
        ((F.xxhash64("id") % 1000000) / 1000000.0 * 900.0 + 50.0).alias("x"),
        ((F.xxhash64("id", F.lit(1)) % 1000000) / 1000000.0 * 900.0 + 50.0).alias("y"),
    )


def run(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def last_aqe_stats(spark) -> dict:
    """Skew-split evidence from the engine's own SQL metrics: the
    AQEShuffleRead nodes report how many skewed partitions were found
    and how many splits they were broken into."""
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    last_id = execs.last().executionId()
    metrics = store.executionMetrics(last_id)
    nodes = store.planGraph(last_id).allNodes()
    out = {"skewed_partitions": 0, "skew_splits": 0, "partitions_read": []}
    it = nodes.iterator()
    while it.hasNext():
        n = it.next()
        if "AQEShuffleRead" not in n.name():
            continue
        mit = n.metrics().iterator()
        while mit.hasNext():
            m = mit.next()
            val = metrics.get(m.accumulatorId())
            if val.isEmpty():
                continue
            text = str(val.get())
            name = m.name()
            digits = "".join(c for c in text.split("\n")[0] if c.isdigit())
            if "skewed partitions" in name and digits:
                out["skewed_partitions"] += int(digits)
            elif "skewed partition splits" in name and digits:
                out["skew_splits"] += int(digits)
            elif name == "number of partitions" and digits:
                out["partitions_read"].append(int(digits))
    return out


def main() -> None:
    spark = get_spark(app_name="scalecheck_skew")
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    out = {"n_tracks": N_TRACKS, "pip_rows": int(PIP_M * 1e6), "cases": {}}

    tracks = synth_hot_tracks(spark).localCheckpoint()
    pts = synth_hot_points(spark, int(PIP_M * 1e6)).localCheckpoint()
    polys = polygons_df(
        spark,
        [{"poly_id": "hot", "xs": [0.0, 1000.0, 1000.0, 0.0],
          "ys": [0.0, 0.0, 1000.0, 1000.0]}],
    )

    for aqe_skew in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe_skew)
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # force sort-merge so the skew splitter has something to split
        # (a broadcast of the small exploded-poly side is immune anyway)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        segs = track_segments(tracks, max_gap=None)
        xo = crossover_join(segs, cell=1000.0).select(F.count(F.lit(1)).alias("n"))
        dt = run(xo)
        out["cases"][f"crossover_aqe_skew_{aqe_skew}"] = {
            "wall_s": round(dt, 1),
            "aqe": last_aqe_stats(spark),
        }

        pip = point_in_polygon_gridded(pts, polys, cell=1000.0).select(
            F.count(F.lit(1)).alias("n")
        )
        dt = run(pip)
        out["cases"][f"pip_gridded_aqe_skew_{aqe_skew}"] = {
            "wall_s": round(dt, 1),
            "aqe": last_aqe_stats(spark),
        }

    # the operator-level fix: AQE cannot split the crossover self-join
    # (exchange reuse), so hot_cell_salt spreads the hot key itself
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    segs = track_segments(tracks, max_gap=None)
    xo = crossover_join(segs, cell=1000.0, hot_cell_salt=64).select(
        F.count(F.lit(1)).alias("n")
    )
    dt = run(xo)
    out["cases"]["crossover_salt_64"] = {
        "wall_s": round(dt, 1),
        "aqe": last_aqe_stats(spark),
    }

    # auto-tuned salt (VERDICT r4 task 5): S derived from the cell
    # histogram — must land within 2× of the hand-tuned S=64 run
    from deepicedrain_spark.operators.crossover import _auto_salt, _explode_cells

    segs = track_segments(tracks, max_gap=None)
    s_auto = _auto_salt(_explode_cells(segs, 1000.0))
    xo = crossover_join(segs, cell=1000.0, hot_cell_salt="auto").select(
        F.count(F.lit(1)).alias("n")
    )
    dt = run(xo)
    out["cases"]["crossover_salt_auto"] = {
        "wall_s": round(dt, 1),
        "chosen_salt": s_auto,
        "aqe": last_aqe_stats(spark),
    }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
