"""Bounding-box Region (SURVEY P2 / §1.1).

Reference: frozen dataclass ``Region(name, xmin, xmax, ymin, ymax)`` at
/root/reference/deepicedrain/spatiotemporal.py:20-33 with ``subset()``
at :135-155 applying strict-inequality range predicates, and
``datashade()`` at :109-133 binning points into a pixel grid.

Spark-first design: ``Region`` emits Column predicates so Catalyst
pushes the four comparisons into the parquet scan (min/max row-group
skipping) — the reference applies them post-load in pandas.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Region:
    name: str
    xmin: float
    xmax: float
    ymin: float
    ymax: float

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        return (self.xmin, self.xmax, self.ymin, self.ymax)

    def scale(self) -> float:
        """Square half-width covering the region (reference :36-39)."""
        return max(self.xmax - self.xmin, self.ymax - self.ymin) / 2

    def predicate(self, x: str = "x", y: str = "y") -> Column:
        """Strict-inequality bbox predicate (reference :147-151)."""
        return (
            (F.col(x) > F.lit(self.xmin))
            & (F.col(x) < F.lit(self.xmax))
            & (F.col(y) > F.lit(self.ymin))
            & (F.col(y) < F.lit(self.ymax))
        )

    def subset(self, df: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
        return df.filter(self.predicate(x, y))

    def datashade(
        self,
        df: DataFrame,
        x: str = "x",
        y: str = "y",
        z: str = "z",
        width: int = 300,
        height: int = 300,
    ) -> DataFrame:
        """2D raster aggregation (SURVEY A9): bin points into a
        width×height pixel grid, mean of ``z`` per cell. Pure Catalyst
        group-by — shuffles once on (px, py); map-side partial
        aggregation keeps shuffle volume at O(cells), not O(points)."""
        cell_w = (self.xmax - self.xmin) / width
        cell_h = (self.ymax - self.ymin) / height
        # least(width-1): when cell_w rounds DOWN in fp, a point just
        # under xmax can floor to `width`, minting a pixel column
        # outside the raster — clamp to the canvas like datashader
        px = F.least(
            F.floor((F.col(x) - F.lit(self.xmin)) / F.lit(cell_w)),
            F.lit(width - 1),
        ).alias("px")
        py = F.least(
            F.floor((F.col(y) - F.lit(self.ymin)) / F.lit(cell_h)),
            F.lit(height - 1),
        ).alias("py")
        return (
            self.subset(df, x, y)
            .groupBy(px, py)
            .agg(F.avg(z).alias("z_mean"), F.count(z).alias("n"))
        )
