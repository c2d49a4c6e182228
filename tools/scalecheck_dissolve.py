"""Dissolve at many-keys scale: the catalog query is fixed-size (30
basins), but the operator's 100 TB story is "keys partition across the
cluster" — so measure dissolve_stats over K keys x P overlapping
polygons per key, all synthesized Catalyst-side (no Python in the data
path).

Round 7 adds the HOT-KEY mode (VERDICT r6 task 1): n_keys=1 with
hundreds of polygons is the shape that used to serialize O(E²) pair
work into one partition — run it at rising polys_per_key to check the
bucketed overlay scales near-linearly per polygon, and optionally pin
the strategy to compare plans ("plain" = old in-key self-join,
"cells" = grid-bucketed, default "auto").

Round 8 adds the POWER-LAW mode (VERDICT r7 task 2): ``power<R>``
(e.g. power256, power1024) draws each polygon's radius from a
power-law spanning ratio R between smallest and largest feature —
the heavy-tailed mix where the median-span grid with the max/64 cap
could compromise (features straddling MORE than ~64×: oversized ones
pay bounded replication AND the grid sits above the smallest).

Usage: python tools/scalecheck_dissolve.py [n_keys] [polys_per_key] [strategy] [mixed|power<R>]
Prints one JSON line; summary goes to SCALE.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deepicedrain_spark.operators.dissolve import dissolve_stats
from deepicedrain_spark.session import get_spark

N_KEYS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
POLYS = int(sys.argv[2]) if len(sys.argv) > 2 else 12
STRATEGY = sys.argv[3] if len(sys.argv) > 3 else "auto"
# "mixed" (4th arg) adds ONE continent-scale ring per key enclosing all
# the small polygons — the feature-size-skew shape that used to coarsen
# the whole key's grid to the giant's span (SCALE.md round-7:
# 315.8 s → 12.1 s after median-span grid sizing). Expected output:
# every key collapses to ONE part (the giant contains everything).
_MODE = sys.argv[4] if len(sys.argv) > 4 else ""
MIXED = _MODE == "mixed"
POWER_RATIO = int(_MODE[5:]) if _MODE.startswith("power") else 0
VERTS = 16


def synth(spark):
    """P octagon-ish rings per key in a row, neighbors overlapping
    (centers 1.5*r apart at radius r) so every key truly merges."""
    rows = spark.range(0, N_KEYS * POLYS)
    key = (F.col("id") / POLYS).cast("long")
    pid = (F.col("id") % POLYS).cast("long")
    r = F.lit(100.0)
    cx = pid.cast("double") * 150.0 + (F.xxhash64("id") % 20).cast("double")
    cy = (F.xxhash64("id", F.lit(7)) % 20).cast("double")
    ring = lambda trig: F.expr(  # noqa: E731
        f"transform(sequence(0, {VERTS}), i -> "
        f"_c + _r * {trig}(2 * pi() * (i % {VERTS}) / {VERTS} + _ph))"
    )
    return rows.select(
        key.alias("key"),
        pid.alias("pid"),
        cx.alias("_cx"),
        cy.alias("_cy"),
        ((F.xxhash64("id", F.lit(13)) % 100).cast("double") / 1000.0).alias("_ph"),
        r.alias("_r"),
    ).select(
        "key",
        "pid",
        F.expr(
            f"transform(sequence(0, {VERTS}), i -> "
            f"_cx + _r * cos(2 * pi() * (i % {VERTS}) / {VERTS} + _ph))"
        ).alias("xs"),
        F.expr(
            f"transform(sequence(0, {VERTS}), i -> "
            f"_cy + _r * sin(2 * pi() * (i % {VERTS}) / {VERTS} + _ph))"
        ).alias("ys"),
    )


def synth_giants(spark):
    """One ring per key whose bbox encloses the whole chain of small
    polygons — span ≈ POLYS×150 + margin vs the small rings' ~240."""
    span = POLYS * 150.0 + 1000.0
    return spark.range(0, N_KEYS).select(
        F.col("id").alias("key"),
        F.lit(10_000_000).cast("long").alias("pid"),
        F.expr(
            "transform(sequence(0, 63), i -> "
            f"-500.0 + {span} * (0.5 + 0.5 * cos(2 * pi() * (i % 63) / 63 + 3.2)))"
        ).alias("xs"),
        F.expr(
            "transform(sequence(0, 63), i -> "
            f"-500.0 + {span} * (0.5 + 0.5 * sin(2 * pi() * (i % 63) / 63 + 3.2)))"
        ).alias("ys"),
    )


def synth_power(spark, ratio: int):
    """P rings per key with POWER-LAW radii spanning ``ratio`` between
    the smallest (rmin=100) and largest feature: r = rmin·ratio^(u²)
    (u uniform — the square biases mass toward small features, the
    heavy-tailed shape of real lake catalogs). Centers are uniform in
    a box ~3× the largest feature, scaled by sqrt(polys/1000) so
    FEATURE DENSITY stays constant as the poly count grows (a catalog
    with 4× the lakes covers ~4× the area — a fixed box would measure
    density blowup, not operator scaling); small features both cluster
    under giants and stand alone, plenty of genuine overlap at every
    scale."""
    rmin = 100.0
    box = rmin * ratio * 3.0 * (POLYS / 1000.0) ** 0.5
    rows = spark.range(0, N_KEYS * POLYS)
    key = (F.col("id") / POLYS).cast("long")
    pid = (F.col("id") % POLYS).cast("long")
    u = (F.abs(F.xxhash64("id", F.lit(3))) % 100000).cast("double") / 100000.0
    return rows.select(
        key.alias("key"),
        pid.alias("pid"),
        (F.lit(rmin) * F.pow(F.lit(float(ratio)), u * u)).alias("_r"),
        ((F.abs(F.xxhash64("id", F.lit(5))) % 100000).cast("double")
         / 100000.0 * box).alias("_cx"),
        ((F.abs(F.xxhash64("id", F.lit(7))) % 100000).cast("double")
         / 100000.0 * box).alias("_cy"),
        ((F.abs(F.xxhash64("id", F.lit(13))) % 100).cast("double") / 1000.0
         ).alias("_ph"),
    ).select(
        "key",
        "pid",
        F.expr(
            f"transform(sequence(0, {VERTS}), i -> "
            f"_cx + _r * cos(2 * pi() * (i % {VERTS}) / {VERTS} + _ph))"
        ).alias("xs"),
        F.expr(
            f"transform(sequence(0, {VERTS}), i -> "
            f"_cy + _r * sin(2 * pi() * (i % {VERTS}) / {VERTS} + _ph))"
        ).alias("ys"),
    )


def main() -> None:
    spark = get_spark("scalecheck_dissolve")
    spark.sparkContext.setLogLevel("ERROR")
    polys = synth_power(spark, POWER_RATIO) if POWER_RATIO else synth(spark)
    if MIXED:
        polys = polys.unionByName(synth_giants(spark))
    polys = polys.localCheckpoint()
    n = polys.count()
    t0 = time.time()
    out = dissolve_stats(polys, ["key"], strategy=STRATEGY)
    out.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    row = out.agg(
        F.count(F.lit(1)).alias("keys"),
        F.sum("n_parts").alias("parts"),
        F.min(F.col("n_parts")).alias("min_parts"),
        F.max(F.col("n_parts")).alias("max_parts"),
        # parity probe: plain and cells must agree bit-for-bit, so the
        # summed union area is a one-number strategy cross-check
        F.sum("union_area").alias("area"),
    ).first()
    print(
        json.dumps(
            {
                "metric": "dissolve_many_keys",
                "strategy": STRATEGY,
                "mixed": MIXED,
                "power_ratio": POWER_RATIO,
                "n_keys": N_KEYS,
                "polys_per_key": POLYS,
                "n_polys": n,
                "wall_sec": round(dt, 2),
                "keys_per_sec": int(N_KEYS / dt),
                "out_keys": row["keys"],
                "parts_total": row["parts"],
                "parts_min": row["min_parts"],
                "parts_max": row["max_parts"],
                "area_sum": float(row["area"]),
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
