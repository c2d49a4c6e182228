"""ATL06 ingest pipeline (SURVEY §3.1 front half).

Reference flow: per-granule, per-beam HDF5 reads →
``<beam>/land_ice_segments/{latitude, longitude, h_li, ...}``
(``/root/reference/atl06_to_atl11.py:171-196``), quality-masked with
``atl06_quality_summary == 0`` (``atl06_play.py`` usage), tagged with
the granule's reference ground track parsed from the FILENAME
(``atlxi_dhdt.py:65-70`` reverse_format), then concatenated into one
table and persisted columnar (HDF5→Zarr there; →parquet here).

Spark shape: the (granule × beam × chunk-stripe) matrix is the task
axis of ONE mapInPandas over one task table (read_hdf5_many) — the
identity columns ride the task rows as literals (the scan has no
input_file_name, so the filename parse happens once per granule on
the driver — one regex per FILE, not per row). Nothing shuffles until
the caller aggregates: the single map-only scan stays map-only, and
1000 granules plan exactly like 3 (capped task-table partitions, no
per-granule plan legs).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Two accepted granule-name conventions:
#  - the repo's synthetic fixtures: ATL06_<rgt4><cycle2>_*.h5
#  - real NSIDC ATL06 granules: ATL06_<yyyymmddhhmmss>_<rrrrccss>_<vvv>_<rr>.h5
#    where rgt/cycle sit at chars 15-22 of the second field.
# (The reference parses ATL11 *zarr* names via reverse_format at
# atlxi_dhdt.py:65-70; ATL06 .h5 names follow the NSIDC layout above.)
GRANULE_RE = re.compile(r"ATL06_(\d{4})(\d{2})_.*\.h5$")
NSIDC_GRANULE_RE = re.compile(r"ATL06_\d{14}_(\d{4})(\d{2})\d{2}_\d{3}_\d{2}\.h5$")

BEAMS = ("gt1l", "gt1r", "gt2l", "gt2r", "gt3l", "gt3r")


def parse_granule_name(path: str) -> tuple[int, int]:
    """(rgt, cycle) from an ATL06-style filename (NSIDC or synthetic)."""
    base = os.path.basename(path)
    m = NSIDC_GRANULE_RE.search(base) or GRANULE_RE.search(base)
    if not m:
        raise ValueError(f"ingest: unrecognized granule name {path!r}")
    return int(m.group(1)), int(m.group(2))


def ingest_atl06(
    spark: SparkSession,
    paths: list[str],
    beams: tuple[str, ...] = BEAMS,
    quality_col: str = "atl06_quality_summary",
    chunk_rows: int | None = None,
) -> DataFrame:
    """All (granule, beam) scans through ONE (part × chunk-stripe)
    task table + ONE mapInPandas (round 7 — was a per-(granule, beam)
    union of 18 independent scans, each carrying its own repartition
    exchange: a stage storm at 3 granules and a 6000-leg union at
    1000), with identity columns attached as task-row tags and the
    reference's quality mask applied (keep quality == 0 rows)."""
    if not paths or not beams:
        raise ValueError("ingest_atl06: no granule paths / beams given")
    from deepicedrain_spark.sources.hdf5 import ATL06_DATASETS, read_hdf5_many

    parts: list[tuple[str, str, dict]] = []
    for path in paths:
        rgt, cycle = parse_granule_name(path)
        for beam in beams:
            parts.append(
                (
                    path,
                    f"{beam}/land_ice_segments",
                    {
                        "referencegroundtrack": rgt,
                        "cycle_number": cycle,
                        "beam": beam,
                    },
                )
            )
    out = read_hdf5_many(spark, parts, ATL06_DATASETS, chunk_rows)
    return out.filter(F.col(quality_col) == 0)


def ingest_atl06_to_parquet(
    spark: SparkSession,
    paths: list[str],
    out_path: str,
    beams: tuple[str, ...] = BEAMS,
) -> DataFrame:
    """Full front half: scan → mask → parquet partitioned by rgt (the
    reference's file-per-RGT layout becomes partition pruning)."""
    df = ingest_atl06(spark, paths, beams)
    df.write.mode("overwrite").partitionBy("referencegroundtrack").parquet(out_path)
    return spark.read.parquet(out_path)
