"""Scale experiment: flagship operators at reference working-set size.

The reference's Antarctica working set is ~220 M points x up to 9
cycles, trimmed to ~190 M regressions on a 16-worker dask cluster
(/root/reference/atlxi_dhdt.py:87-111, 255-267). The driver testdata
tops out at sf0.1 (~600 k lineitem rows), far below the scale the
engine is designed for — so this experiment synthesizes an
ATL11-shaped point cloud AT the reference's row count with
spark.range (pure Catalyst, no Python in the data path) and times the
flagship plans end-to-end through a noop sink.

Usage: python tools/scalecheck.py [n_points_millions]
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
from deepicedrain_spark.operators.regression import linregress_aggs

N_POINTS = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 20_000_000
CYCLES = 9
NS_PER_91D = 91 * 86_400 * 1_000_000_000


def synth(spark):
    """ATL11-shaped long table: (point_id, cycle, t_ns, h) — one row
    per (point, cycle), deterministic pseudo-noise from xxhash64."""
    rows = spark.range(0, N_POINTS * CYCLES, 1)
    noise = (F.xxhash64("id") % 1000) / F.lit(1000.0)
    pid = (F.col("id") / CYCLES).cast("long")
    cyc = (F.col("id") % CYCLES).cast("int")
    return rows.select(
        pid.alias("point_id"),
        cyc.alias("cycle"),
        (cyc * F.lit(NS_PER_91D) + (F.xxhash64("id", F.lit(1)) % F.lit(86_400_000_000_000))).alias("t_ns"),
        ((pid % 97) / F.lit(97.0) * (cyc * F.lit(0.25)) + noise).alias("h"),
    )


def run(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main():
    spark = get_spark("scalecheck")
    spark.sparkContext.setLogLevel("ERROR")
    pts = synth(spark)

    out = {"n_points": N_POINTS, "n_rows": N_POINTS * CYCLES, "cpus": spark.sparkContext.defaultParallelism}

    # A1+P6: per-point height range + null-threshold trim (the 220M->190M
    # and h_range>0.25 trims at atlxi_dhdt.py:108-112, 248-251)
    trim = (
        pts.groupBy("point_id")
        .agg(F.max("h").alias("hmax"), F.min("h").alias("hmin"), F.count("h").alias("n"))
        .filter((F.col("n") >= 2) & (F.col("hmax") - F.col("hmin") > 0.25))
    )
    out["trim_s"] = round(run(trim), 1)

    # A2 flagship: per-point linear regression (190M independent
    # regressions in the reference, xr.apply_ufunc over 16 workers)
    reg = (
        pts.withColumn("t_days", F.col("t_ns") / F.lit(86_400e9))
        .groupBy("point_id")
        .agg(*linregress_aggs("h", "t_days"))
    )
    out["regression_s"] = round(run(reg), 1)
    out["regressions_per_s"] = int(N_POINTS / out["regression_s"])
    out["rows_per_s_regression"] = int(N_POINTS * CYCLES / out["regression_s"])

    print(json.dumps(out))


if __name__ == "__main__":
    main()
