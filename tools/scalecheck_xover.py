"""Crossover join at REFERENCE scale (VERDICT r4 task 6): the real
ICESat-2 mission flies 1387 repeat ground tracks
(/root/reference/atlxi_xover.py computes crossovers over the siple
coast region across every track pair). This experiment synthesizes
1387 tracks over a 250 km x 250 km region — half ascending, half
descending, fanned across the region so ~every asc/desc pair crosses
inside it — samples them at 100 m along-track (~3.4 M points), and
times crossover_join(hot_cell_salt="auto") end-to-end through a noop
sink, then reads Spark's own SQLAppStatusStore for exchange skew
(max/med per-task shuffle write >= 8x and >= 8 MiB flags, same gates
as tools/skew.py).

Usage: python tools/scalecheck_xover.py [n_tracks]
Prints one JSON line; human summary goes to SCALE.md by hand.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deepicedrain_spark.operators.crossover import crossover_join, track_segments
from deepicedrain_spark.session import get_spark
from tools.skew import exchange_skew, latest_execution_id

N_TRACKS = int(sys.argv[1]) if len(sys.argv) > 1 else 1387
REGION_M = 250_000.0
ALONG_M = float(sys.argv[2]) if len(sys.argv) > 2 else 100.0


def synth_tracks(spark):
    """1387 straight tracks crossing a 250 km square: ascending tracks
    sweep azimuths NE-ish, descending NW-ish, offsets fanned across the
    region (the polar-orbit crossing geometry at a working-region
    scale). Pure Catalyst — no Python in the data path."""
    n_steps = int(REGION_M * 1.5 / ALONG_M)  # diagonal coverage
    rows = spark.range(0, N_TRACKS * n_steps)
    tid = (F.col("id") / n_steps).cast("long")
    step = (F.col("id") % n_steps).cast("double")
    asc = (tid % 2 == 0).cast("int")
    # per-track angle / intercept, deterministic spread
    frac = (tid / F.lit(float(N_TRACKS))).cast("double")
    ang = F.when(asc == 1, F.lit(math.radians(70.0)) + frac * F.lit(math.radians(20.0))).otherwise(
        F.lit(math.radians(110.0)) + frac * F.lit(math.radians(20.0))
    )
    x0 = frac * F.lit(REGION_M * 2.0) - F.lit(REGION_M * 0.5)
    s = step * F.lit(ALONG_M)
    x = x0 + s * F.cos(ang)
    y = s * F.sin(ang) - F.lit(REGION_M * 0.25)
    h = (F.xxhash64("id") % 1000) / F.lit(1000.0) + tid.cast("double") * 0.001
    t = step * F.lit(0.013) + tid.cast("double") * F.lit(91.0 * 86400.0)
    return rows.select(
        tid.alias("track_id"),
        F.col("id").alias("seq"),
        x.alias("x"),
        y.alias("y"),
        h.alias("h"),
        t.alias("t"),
    ).filter(
        (F.col("x") >= 0) & (F.col("x") <= REGION_M) & (F.col("y") >= 0) & (F.col("y") <= REGION_M)
    )


def main() -> None:
    spark = get_spark("scalecheck_xover")
    spark.sparkContext.setLogLevel("ERROR")
    pts = synth_tracks(spark).localCheckpoint()
    n_pts = pts.count()

    seg = track_segments(pts, order_col="seq", t="t", max_gap=250.0)
    t0 = time.time()
    xov = crossover_join(seg, cell=1000.0, hot_cell_salt="auto")
    xov.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0

    n_x = xov.count()
    eid = latest_execution_id(spark)
    all_ex = exchange_skew(spark, eid) if eid is not None else []
    # same gates as tools/skew.py main(): straggler = max-task >= 8x the
    # median AND >= 8 MiB (KB-scale noise never flags)
    flags = [
        e
        for e in all_ex
        if e["metric"] == "shuffle bytes written"
        and e["ratio"] >= 8.0
        and e["max"] >= 8 * 1024 * 1024
    ]
    print(
        json.dumps(
            {
                "metric": "crossover_1387_tracks",
                "n_tracks": N_TRACKS,
                "n_points": n_pts,
                "n_crossings": n_x,
                "wall_sec": round(dt, 2),
                "points_per_sec": int(n_pts / dt),
                "crossings_per_sec": int(n_x / dt),
                "skew_flags": flags,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
