"""Synthetic ATL11-shaped fixtures for reference-parity validation.

The reference's BDD scenario pins the lake finder's cluster counts on
real data: **16 potential subglacial lakes at whillans_downstream and
31 at slessor_downstream** with DBSCAN(eps=3000 m, min_samples=250)
(``/root/reference/deepicedrain/features/subglacial_lakes.feature:13-15``,
``lake_algorithms.py:16-17``). That data is DVC-hosted and not present
here, so this module synthesizes basins with the same *shape*:

- points sampled along parallel ground tracks (1 km across-track pitch,
  50 m along-track pitch — the ATL06/ATL11 sampling geometry, cf.
  ``atl06_to_atl11.py``'s per-track granules), not uniform scatter;
- per-basin planted lakes: elliptical regions (2.5 km radius) whose
  track-sampled interiors carry |dhdt| ≥ 1.5 m/yr (filling positive,
  draining negative), so each lake is seen by the ~5 tracks that cross
  it — a few hundred points, straddling the min_samples=250 threshold
  exactly like the real basins do;
- an active-but-diffuse background (0.11–0.19 m/yr, above the 0.105
  noise floor but below the 3·median activity threshold), which the
  adaptive median filter must remove and the donut significance test
  must use as its outer ring.

Counts are engineered (16 and 31 lakes planted), but every pipeline
stage has to behave correctly to recover them: wrong noise-floor or
activity threshold handling floods DBSCAN with background; wrong eps
handling splits the 5 km lakes (diameter > eps — connectivity is via
the dense along-track chain); a broken significance test drops lakes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

WHILLANS = {
    "name": "whillans_downstream",
    "x0": 0.0,
    "x1": 100_000.0,
    "y0": 0.0,
    "y1": 60_000.0,
    # 16 lakes: 8 columns × 2 rows; 10 filling, 6 draining
    "lakes": [
        (8_000.0 + c * 11_500.0, 18_000.0 + r * 24_000.0, +1 if (c + 8 * r) % 8 < 5 else -1)
        for r in range(2)
        for c in range(8)
    ],
}

SLESSOR = {
    "name": "slessor_downstream",
    "x0": 150_000.0,
    "x1": 270_000.0,
    "y0": 0.0,
    "y1": 80_000.0,
    # 31 lakes: 8 columns × 4 rows minus the last slot; alternate signs
    "lakes": [
        (158_000.0 + c * 13_000.0, 10_000.0 + r * 20_000.0, +1 if (c + r) % 2 == 0 else -1)
        for r in range(4)
        for c in range(8)
    ][:31],
}

LAKE_RADIUS_M = 2_500.0
TRACK_PITCH_M = 1_000.0  # across-track spacing
ALONG_PITCH_M = 50.0  # along-track sampling


def _hash01(a: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic pseudo-uniform [0, 1) from integer arrays — keeps
    the fixture reproducible without global RNG state."""
    h = (a.astype(np.uint64) * np.uint64(2654435761) + np.uint64(salt)) & np.uint64(
        0xFFFFFFFF
    )
    h ^= h >> np.uint64(16)
    h = (h * np.uint64(2246822519)) & np.uint64(0xFFFFFFFF)
    return (h % np.uint64(1_000_000)).astype(np.float64) / 1_000_000.0


def synthesize_basin(spec: dict) -> pd.DataFrame:
    """Track-sampled point cloud for one basin spec → columns
    (x, y, dhdt_slope, referencegroundtrack)."""
    xs = np.arange(spec["x0"] + TRACK_PITCH_M / 2, spec["x1"], TRACK_PITCH_M)
    ys = np.arange(spec["y0"] + ALONG_PITCH_M / 2, spec["y1"], ALONG_PITCH_M)
    x = np.repeat(xs, len(ys))
    y = np.tile(ys, len(xs))
    rgt = np.repeat(np.arange(len(xs), dtype=np.int64), len(ys))
    idx = np.arange(len(x), dtype=np.int64)
    # diffuse active background: 0.11..0.19, sign-mixed
    dhdt = (0.11 + 0.08 * _hash01(idx, 11)) * np.where(_hash01(idx, 23) < 0.5, 1.0, -1.0)
    for k, (cx, cy, sign) in enumerate(spec["lakes"]):
        inside = (x - cx) ** 2 + (y - cy) ** 2 <= LAKE_RADIUS_M**2
        mag = 1.5 + 0.5 * _hash01(idx[inside], 37 + k)
        dhdt[inside] = sign * mag
    return pd.DataFrame(
        {
            "x": x,
            "y": y,
            "dhdt_slope": dhdt,
            "referencegroundtrack": rgt,
        }
    )


def reference_basin_polygons() -> list[dict]:
    """Rectangular basin outlines for the PIP labeling step."""
    out = []
    for spec in (WHILLANS, SLESSOR):
        out.append(
            {
                "poly_id": spec["name"],
                "xs": [spec["x0"] - 1.0, spec["x1"] + 1.0, spec["x1"] + 1.0, spec["x0"] - 1.0],
                "ys": [spec["y0"] - 1.0, spec["y0"] - 1.0, spec["y1"] + 1.0, spec["y1"] + 1.0],
            }
        )
    return out


def synthesize_reference_basins() -> pd.DataFrame:
    """Both BDD basins in one point table (~312 k points)."""
    return pd.concat(
        [synthesize_basin(WHILLANS), synthesize_basin(SLESSOR)], ignore_index=True
    )


def multi_basin_specs(lake_counts: tuple[int, ...] = (3, 5, 7, 4, 6, 2)) -> list[dict]:
    """N side-by-side basins with a planted-lake count per basin — the
    full-catalog shape (the reference's published layer spans 30 basins;
    this scales the two-basin BDD fixture toward it). Lakes sit in a row
    7 km apart (disjoint at 2.5 km radius), signs alternating."""
    specs = []
    for i, n in enumerate(lake_counts):
        x0 = i * 90_000.0
        specs.append(
            {
                "name": f"basin_{i:02d}",
                "x0": x0,
                "x1": x0 + 60_000.0,
                "y0": 0.0,
                "y1": 40_000.0,
                "lakes": [
                    (x0 + 8_000.0 + k * 7_000.0, 20_000.0, +1 if k % 2 == 0 else -1)
                    for k in range(n)
                ],
            }
        )
    return specs


def synthesize_multi_basins(lake_counts: tuple[int, ...] = (3, 5, 7, 4, 6, 2)) -> pd.DataFrame:
    return pd.concat(
        [synthesize_basin(s) for s in multi_basin_specs(lake_counts)],
        ignore_index=True,
    )


def multi_basin_polygons(lake_counts: tuple[int, ...] = (3, 5, 7, 4, 6, 2)) -> list[dict]:
    out = []
    for spec in multi_basin_specs(lake_counts):
        out.append(
            {
                "poly_id": spec["name"],
                "xs": [spec["x0"] - 1.0, spec["x1"] + 1.0, spec["x1"] + 1.0, spec["x0"] - 1.0],
                "ys": [spec["y0"] - 1.0, spec["y0"] - 1.0, spec["y1"] + 1.0, spec["y1"] + 1.0],
            }
        )
    return out
