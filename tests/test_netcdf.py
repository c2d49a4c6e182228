"""NetCDF classic (CDF-1/CDF-2) sink + scan — the reference's grid
cube export (``atlxi_lake.py:428`` to_netcdf; ``spatiotemporal.py:
443-449`` stacks per-cycle grids). Cross-checked against scipy's
independent netcdf reader when that library is present."""

import numpy as np
import pytest

from deepicedrain_spark.sources import netcdf as nc


def _sample():
    dims = {"cycle": 2, "y": 3, "x": 4}
    grid = np.arange(24, dtype="f8").reshape(2, 3, 4) * 0.5 - 3.0
    variables = {
        "cycle": (("cycle",), np.array([3, 4], dtype="i4")),
        "y": (("y",), np.array([10, 11, 12], dtype="i4")),
        "x": (("x",), np.array([0, 1, 2, 3], dtype="i4")),
        "z": (("cycle", "y", "x"), grid),
        "n": (("cycle", "y", "x"), (np.arange(24) % 5).astype("i4").reshape(2, 3, 4)),
    }
    return dims, variables, grid


@pytest.mark.parametrize("version", [1, 2])
def test_netcdf_roundtrip(tmp_path, version):
    dims, variables, grid = _sample()
    p = str(tmp_path / "cube.nc")
    nc.write_netcdf(
        p,
        dims,
        variables,
        global_attrs={"title": "dhdt cube", "noise_floor": 0.105},
        var_attrs={"z": {"units": "m", "grid_mapping": "ps"}},
        version=version,
    )
    with open(p, "rb") as fh:
        assert fh.read(4) == b"CDF" + bytes([version])
    d2, v2, g2 = nc.read_netcdf(p)
    assert d2 == dims
    np.testing.assert_array_equal(v2["z"][1], grid)
    assert v2["z"][1].dtype == np.dtype("float64")
    np.testing.assert_array_equal(v2["cycle"][1], [3, 4])
    assert v2["z"][0] == ("cycle", "y", "x")
    assert g2["title"] == "dhdt cube"
    assert float(g2["noise_floor"][0]) == 0.105
    assert v2["z"][2]["units"] == "m"


def test_netcdf_odd_sized_padding(tmp_path):
    """3×i2 = 6 bytes pads to 8; the next var must still align."""
    p = str(tmp_path / "pad.nc")
    nc.write_netcdf(
        p,
        {"k": 3},
        {
            "a": (("k",), np.array([1, 2, 3], dtype="i2")),
            "b": (("k",), np.array([4, 5, 6], dtype="i2")),
        },
    )
    _, v, _ = nc.read_netcdf(p)
    np.testing.assert_array_equal(v["a"][1], [1, 2, 3])
    np.testing.assert_array_equal(v["b"][1], [4, 5, 6])


def test_netcdf_scipy_crosscheck(tmp_path):
    scipy_io = pytest.importorskip("scipy.io")
    dims, variables, grid = _sample()
    p = str(tmp_path / "cube.nc")
    nc.write_netcdf(p, dims, variables, global_attrs={"title": "x"})
    with scipy_io.netcdf_file(p, "r", mmap=False) as f:
        np.testing.assert_array_equal(f.variables["z"][:], grid)
        assert f.title == b"x"
    theirs = str(tmp_path / "theirs.nc")
    with scipy_io.netcdf_file(theirs, "w") as f:
        f.createDimension("k", 3)
        v = f.createVariable("a", "f8", ("k",))
        v[:] = [1.5, 2.5, 3.5]
    _, v2, _ = nc.read_netcdf(theirs)
    np.testing.assert_array_equal(v2["a"][1], [1.5, 2.5, 3.5])


def test_cube_sink_scan(spark, tmp_path):
    import pandas as pd

    cells = pd.DataFrame(
        {
            "label": [1, 1, 2, 2, 2],
            "cx": [0, 3, 0, 1, 3],
            "cy": [5, 5, 6, 6, 7],
            "n": [4, 2, 1, 9, 3],
            "z_med": [0.5, -1.25, 2.0, 3.5, -0.75],
        }
    )
    p = str(tmp_path / "grid.nc")
    nc.write_cube(p, cells, "label", "cx", "cy", {"n": "n", "z_med": "z_med"})
    dims, variables, _ = nc.read_netcdf(p)
    assert dims == {"cycle": 2, "y": 3, "x": 3}  # dense union of cells
    back = nc.read_cube(spark, p, ["n", "z_med"]).toPandas()
    assert len(back) == 5  # empty cells masked out by n == 0
    merged = back.rename(columns={"cycle": "label"}).sort_values(["label", "cx", "cy"])
    orig = cells.sort_values(["label", "cx", "cy"])
    np.testing.assert_array_equal(merged["n"].to_numpy(), orig["n"].to_numpy())
    np.testing.assert_array_equal(merged["z_med"].to_numpy(), orig["z_med"].to_numpy())
