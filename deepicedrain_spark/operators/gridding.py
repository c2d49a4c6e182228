"""Surface interpolation onto a regular grid (SURVEY A11).

Reference: ``spatiotemporal_cube`` at
/root/reference/deepicedrain/spatiotemporal.py:310-477 — GMT
``blockmedian`` (A10) then ``surface`` (adjustable-tension
continuous-curvature spline) per cycle, masked to cells within 3 grid
cells of data (M='3c') and clipped to ±3·MAD limits (L).

Spark-first: an exact GMT tension-spline port is out of scope (GMT is
a global iterative PDE solver); the engine provides inverse-distance
weighting (IDW) over a cell+halo partitioning — the accepted
approximation per SURVEY §7 step 8, validated on relative tolerances:

1. block-median the points per grid cell (one shuffle — A10);
2. shard the grid into blocks of ``block_cells`` cells; replicate cell
   medians into neighboring blocks within the search halo;
3. per block (applyInPandas), evaluate IDW at each grid node from the
   cell medians within ``search_cells``; nodes with no data in range
   stay null (the M='3c' mask);
4. clip to median ± 3·MAD of the input (the L limits), computed as a
   broadcast aggregate.

Shuffle profile at 100 TB: points → cells is a partial-agg shuffle of
O(cells); the halo fan-out is ≤9× on CELL MEDIANS (already reduced),
never on raw points.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepicedrain_spark.region import Region


def interpolate_grid(
    df: DataFrame,
    region: Region,
    spacing: float,
    z: str = "z",
    x: str = "x",
    y: str = "y",
    cycle_col: str | None = None,
    search_cells: int = 3,
    block_cells: int = 32,
    power: float = 2.0,
    clip_mad: float = 3.0,
) -> DataFrame:
    """IDW surface per (optional) cycle. Output: (cycle?, gx, gy, zi)
    with gx/gy grid indices and zi the interpolated (masked, clipped)
    value — the DataFrame form of the reference's x/y/cycle data cube."""
    spark = df.sparkSession
    keys = [cycle_col] if cycle_col else []

    # 1. block-median per cell (reduces points → cells)
    cx = F.floor((F.col(x) - F.lit(region.xmin)) / F.lit(spacing)).alias("cx")
    cy = F.floor((F.col(y) - F.lit(region.ymin)) / F.lit(spacing)).alias("cy")
    cells = (
        region.subset(df, x, y)
        .groupBy(*keys, cx, cy)
        .agg(
            F.expr(f"percentile({x}, 0.5D)").alias("mx"),
            F.expr(f"percentile({y}, 0.5D)").alias("my"),
            F.expr(f"percentile({z}, 0.5D)").alias("mz"),
        )
    )

    # clip limits: median ± k·MAD of the cell medians (GMT L option)
    med = cells.agg(F.expr("percentile(mz, 0.5D)").alias("m"))
    mad = (
        cells.crossJoin(F.broadcast(med))
        .agg(
            F.first("m").alias("m"),
            F.expr("percentile(abs(mz - m), 0.5D)").alias("mad"),
        )
    )

    # 2. halo replication of cell medians into neighbor blocks
    bx = F.floor(F.col("cx") / block_cells)
    by = F.floor(F.col("cy") / block_cells)
    fx = F.col("cx") - bx * block_cells
    fy = F.col("cy") - by * block_cells
    bxs = F.array_distinct(
        F.array(
            bx,
            F.when(fx < search_cells, bx - 1).otherwise(bx),
            F.when(fx >= block_cells - search_cells, bx + 1).otherwise(bx),
        )
    )
    bys = F.array_distinct(
        F.array(
            by,
            F.when(fy < search_cells, by - 1).otherwise(by),
            F.when(fy >= block_cells - search_cells, by + 1).otherwise(by),
        )
    )
    haloed = cells.withColumn("_bx", F.explode(bxs)).withColumn("_by", F.explode(bys))

    nx = int(round((region.xmax - region.xmin) / spacing))
    ny = int(round((region.ymax - region.ymin) / spacing))
    x0, y0 = region.xmin, region.ymin

    key_schema = ""
    if cycle_col:
        key_schema = f"{cycle_col} " + dict(df.dtypes)[cycle_col] + ", "
    schema = key_schema + "gx long, gy long, zi double"

    def idw(pdf: pd.DataFrame) -> pd.DataFrame:
        bx0 = int(pdf["_bx"].iloc[0]) * block_cells
        by0 = int(pdf["_by"].iloc[0]) * block_cells
        px = pdf["mx"].to_numpy(np.float64)
        py = pdf["my"].to_numpy(np.float64)
        pz = pdf["mz"].to_numpy(np.float64)
        rows = []
        r2max = (search_cells * spacing) ** 2
        key = {c: pdf[c].iloc[0] for c in ([cycle_col] if cycle_col else [])}
        for gx in range(max(bx0, 0), min(bx0 + block_cells, nx)):
            gx_c = x0 + (gx + 0.5) * spacing
            for gy in range(max(by0, 0), min(by0 + block_cells, ny)):
                gy_c = y0 + (gy + 0.5) * spacing
                d2 = (px - gx_c) ** 2 + (py - gy_c) ** 2
                m = d2 <= r2max
                if not m.any():
                    continue  # M='3c' mask: no data within range
                d2m = d2[m]
                if (d2m < 1e-18).any():
                    zi = float(pz[m][d2m < 1e-18][0])
                else:
                    w = 1.0 / d2m ** (power / 2)
                    zi = float((w * pz[m]).sum() / w.sum())
                rows.append({**key, "gx": gx, "gy": gy, "zi": zi})
        return pd.DataFrame(rows, columns=[*([cycle_col] if cycle_col else []), "gx", "gy", "zi"])

    # each node is evaluated only in its home block (the gx/gy ranges
    # above), so no dedup pass is needed — halo rows only widen the
    # data each block sees
    grid = haloed.groupBy(*keys, "_bx", "_by").applyInPandas(idw, schema=schema)

    # 4. clip to ±k·MAD
    return (
        grid.crossJoin(F.broadcast(mad))
        .withColumn(
            "zi",
            F.least(
                F.greatest(F.col("zi"), F.col("m") - F.lit(clip_mad) * F.col("mad")),
                F.col("m") + F.lit(clip_mad) * F.col("mad"),
            ),
        )
        .drop("m", "mad")
    )
