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


def test_record_dimension_roundtrip_and_append():
    """Unlimited (record) dimension: write, read, then grow in place
    with append_records — numrecs bumps, old bytes untouched."""
    import numpy as np

    from deepicedrain_spark.sources.netcdf import (
        append_records,
        read_netcdf,
        write_netcdf,
    )

    p = "/tmp/spark_graft_test_recdim.nc"
    g0 = np.arange(2 * 3 * 4, dtype="f8").reshape(2, 3, 4)
    c0 = np.array([[1, 2, 3], [4, 5, 6]], dtype="i4")
    lev = np.array([10, 20, 30], dtype="i4")
    write_netcdf(
        p,
        {"t": None, "y": 3, "x": 4},
        {"lev": (("y",), lev), "grid": (("t", "y", "x"), g0), "cnt": (("t", "y"), c0)},
    )
    dims, vs, _ = read_netcdf(p)
    assert dims == {"t": 2, "y": 3, "x": 4}
    assert np.array_equal(vs["grid"][1], g0)
    assert np.array_equal(vs["cnt"][1], c0)

    n = append_records(p, {"grid": np.full((3, 3, 4), 7.5), "cnt": np.zeros((3, 3), "i4")})
    assert n == 5
    dims, vs, _ = read_netcdf(p)
    assert dims["t"] == 5
    assert np.array_equal(vs["grid"][1][:2], g0)  # old records intact
    assert (vs["grid"][1][2:] == 7.5).all()
    assert np.array_equal(vs["lev"][1], lev)  # fixed var untouched

    # single short-typed record var: the spec's no-padding special case
    p2 = "/tmp/spark_graft_test_recdim2.nc"
    sv = np.array([[1, 2, 3], [4, 5, 6]], dtype="i2")
    write_netcdf(p2, {"t": None, "k": 3}, {"s": (("t", "k"), sv)})
    append_records(p2, {"s": np.array([[7, 8, 9]], dtype="i2")})
    d2, v2, _ = read_netcdf(p2)
    assert d2["t"] == 3 and v2["s"][1][2, 2] == 9

    # appending a non-record / unknown var must fail loudly
    import pytest

    with pytest.raises(ValueError):
        append_records(p, {"lev": np.array([1], dtype="i4")})
    with pytest.raises(ValueError):
        append_records(p, {"grid": np.zeros((1, 3, 4))})  # missing cnt


def test_record_cube_matches_fixed_cube(spark):
    """write_cube(record=True) builds the cube by per-cycle appends;
    the scan must read back the identical cells as the fixed layout."""
    import pandas as pd

    from deepicedrain_spark.sources.netcdf import read_cube, write_cube

    cells = pd.DataFrame(
        {
            "cyc": [1, 1, 2, 2, 3],
            "cx": [0, 1, 0, 2, 1],
            "cy": [0, 0, 1, 1, 2],
            "n": [3, 1, 4, 1, 5],
            "v": [0.5, 1.5, -2.0, 3.25, 0.0],
        }
    )
    pf = "/tmp/spark_graft_test_cube_fixed.nc"
    pr = "/tmp/spark_graft_test_cube_rec.nc"
    write_cube(pf, cells, "cyc", "cx", "cy", {"n": "n", "v": "v"})
    write_cube(pr, cells, "cyc", "cx", "cy", {"n": "n", "v": "v"}, record=True)

    def rows(path):
        return sorted(
            tuple(r) for r in read_cube(spark, path, ["n", "v"]).collect()
        )

    assert rows(pr) == rows(pf)
    assert len(rows(pr)) == 5


def test_cdf5_int64_roundtrip_and_append():
    """CDF-5 (64-bit data format): int64/uint64 variables round-trip
    exactly at values beyond int32, header count/size fields are
    8-byte, and record appends work in the v5 layout too."""
    import numpy as np

    from deepicedrain_spark.sources.netcdf import (
        append_records,
        read_netcdf,
        write_netcdf,
    )

    p = "/tmp/spark_graft_test_cdf5.nc"
    big = np.array([2**40, -(2**41), 7, 0], dtype="i8")
    u = np.array([2**63 + 5, 1, 2, 3], dtype="u8")
    grid = np.arange(12, dtype="i8").reshape(3, 4)
    write_netcdf(
        p,
        {"k": 4, "t": None, "x": 4},
        {"big": (("k",), big), "u": (("k",), u), "g": (("t", "x"), grid)},
        global_attrs={"title": "cdf5", "ver": np.int64(9)},
        version=5,
    )
    with open(p, "rb") as fh:
        assert fh.read(4) == b"CDF\x05"
    dims, vs, g = read_netcdf(p)
    assert dims == {"k": 4, "t": 3, "x": 4}
    assert vs["big"][1].dtype == np.dtype("int64")
    assert np.array_equal(vs["big"][1], big)
    assert np.array_equal(vs["u"][1], u)
    assert g["title"] == "cdf5" and int(g["ver"][0]) == 9

    assert append_records(p, {"g": np.full((2, 4), -5, dtype="i8")}) == 5
    dims, vs, _ = read_netcdf(p)
    assert dims["t"] == 5
    assert np.array_equal(vs["g"][1][:3], grid) and (vs["g"][1][3:] == -5).all()

    # classic versions keep the old behavior: int64 downcasts to int32
    p1 = "/tmp/spark_graft_test_cdf1_dc.nc"
    write_netcdf(p1, {"k": 3}, {"a": (("k",), np.array([1, 2, 3], dtype="i8"))})
    assert read_netcdf(p1)[1]["a"][1].dtype == np.dtype("int32")


def test_append_validates_shapes_and_writer_rejects_zero_dims():
    """Review findings r4: mis-shaped appends must be refused BEFORE any
    byte lands (an in-place append cannot roll back), inconsistent
    0-record/3-record writes raise the intended error, and explicit
    0-length fixed dims are rejected (length 0 is the header's record-
    dim marker)."""
    import numpy as np
    import pytest

    from deepicedrain_spark.sources.netcdf import (
        append_records,
        read_netcdf,
        write_netcdf,
    )

    p = "/tmp/spark_graft_test_append_guard.nc"
    write_netcdf(
        p,
        {"t": None, "y": 2, "x": 3},
        {"v": (("t", "y", "x"), np.arange(6, dtype="f8").reshape(1, 2, 3))},
    )
    with pytest.raises(ValueError, match="shape"):
        append_records(p, {"v": np.zeros((1, 3, 2))})  # transposed
    with pytest.raises(ValueError, match="shape"):
        append_records(p, {"v": np.zeros((1, 2, 2))})  # short slab
    # the failed attempts wrote nothing: file still reads clean
    dims, vs, _ = read_netcdf(p)
    assert dims["t"] == 1 and vs["v"][1].shape == (1, 2, 3)

    with pytest.raises(ValueError, match="record count"):
        write_netcdf(
            p,
            {"t": None, "x": 2},
            {"a": (("t", "x"), np.empty((0, 2))), "b": (("t", "x"), np.zeros((3, 2)))},
        )
    with pytest.raises(ValueError, match="length >= 1"):
        write_netcdf(p, {"z": 0, "t": None}, {"v": (("t",), np.zeros(2))})


def test_append_records_once_redelivery_noop(tmp_path):
    """ADVICE r4 (low): at-least-once writers must not double-append —
    append_records_once keeps a sidecar batch-id ledger."""
    import numpy as np

    from deepicedrain_spark.sources.netcdf import (
        append_records_once,
        read_netcdf,
        write_netcdf,
    )

    p = str(tmp_path / "once.nc")
    write_netcdf(
        p,
        {"t": None, "x": 3},
        {"v": (("t", "x"), np.empty((0, 3), dtype="f8"))},
    )
    a = np.array([[1.0, 2.0, 3.0]])
    assert append_records_once(p, {"v": a}, batch_id=0) is True
    assert append_records_once(p, {"v": a}, batch_id=0) is False  # redelivery
    assert append_records_once(p, {"v": a * 2}, batch_id=1) is True
    _dims, vs, _ = read_netcdf(p)
    assert vs["v"][1].shape == (2, 3)
    assert np.allclose(vs["v"][1], np.vstack([a, a * 2]))

def test_append_once_crash_mid_write_rolls_back(tmp_path):
    """ADVICE r5 (medium): a crash mid-append leaves orphan tail bytes
    that shift every later record's offset once numrecs moves. The
    round-6 intent ledger records (pre_len, pre_numrecs) BEFORE any
    byte is written; the next call truncates back and re-appends."""
    import json

    import numpy as np

    from deepicedrain_spark.sources.netcdf import (
        append_records_once,
        read_netcdf,
        write_netcdf,
    )

    p = str(tmp_path / "crash.nc")
    write_netcdf(
        p,
        {"t": None, "x": 3},
        {"v": (("t", "x"), np.empty((0, 3), dtype="f8"))},
    )
    a = np.array([[1.0, 2.0, 3.0]])
    assert append_records_once(p, {"v": a}, batch_id=0) is True
    # simulate a crash mid-data-write: intent recorded, partial garbage
    # bytes at the tail, numrecs NOT yet bumped
    sidecar = p + ".applied.json"
    ledger = json.load(open(sidecar))
    ledger["intent"] = {
        "batch_id": 1,
        "pre_len": __import__("os").path.getsize(p),
        "pre_numrecs": 1,
    }
    ledger["version"] += 1
    json.dump(ledger, open(sidecar, "w"))
    with open(p, "ab") as fh:
        fh.write(b"\x00" * 13)  # unaligned orphan tail
    # redelivery of batch 1 must roll back the tail, then append clean
    assert append_records_once(p, {"v": a * 5}, batch_id=1) is True
    _dims, vs, _ = read_netcdf(p)
    assert vs["v"][1].shape == (2, 3)
    assert np.allclose(vs["v"][1], np.vstack([a, a * 5]))


def test_append_once_crash_after_append_before_commit(tmp_path):
    """Crash AFTER the bytes landed (numrecs bumped) but BEFORE the
    ledger marked the batch applied: replay must not double-append —
    rollback truncates the uncommitted records, then re-appends once."""
    import json
    import os

    import numpy as np

    from deepicedrain_spark.sources.netcdf import (
        append_records,
        append_records_once,
        read_netcdf,
        write_netcdf,
    )

    p = str(tmp_path / "crash2.nc")
    write_netcdf(
        p,
        {"t": None, "x": 2},
        {"v": (("t", "x"), np.empty((0, 2), dtype="f8"))},
    )
    a = np.array([[1.0, 2.0]])
    assert append_records_once(p, {"v": a}, batch_id=0) is True
    # simulate: intent written, append fully ran, final commit lost
    sidecar = p + ".applied.json"
    pre_len = os.path.getsize(p)
    ledger = json.load(open(sidecar))
    ledger["intent"] = {"batch_id": 1, "pre_len": pre_len, "pre_numrecs": 1}
    ledger["version"] += 1
    json.dump(ledger, open(sidecar, "w"))
    append_records(p, {"v": a * 7})  # the "crashed" attempt's bytes
    assert append_records_once(p, {"v": a * 7}, batch_id=1) is True
    _dims, vs, _ = read_netcdf(p)
    assert vs["v"][1].shape == (2, 2)  # 2 records, not 3
    assert np.allclose(vs["v"][1], np.vstack([a, a * 7]))


def test_append_once_concurrent_processes(tmp_path):
    """VERDICT r5 task 6: two concurrent appender PROCESSES, disjoint
    batch ids — the PathLock fence serializes them; no lost or doubled
    records."""
    import multiprocessing as mp

    import numpy as np

    from deepicedrain_spark.sources.netcdf import read_netcdf, write_netcdf

    p = str(tmp_path / "conc.nc")
    write_netcdf(
        p,
        {"t": None, "x": 1},
        {"v": (("t", "x"), np.empty((0, 1), dtype="f8"))},
    )
    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=_appender_proc, args=(p, w)) for w in range(2)
    ]
    for pr in procs:
        pr.start()
    for pr in procs:
        pr.join(timeout=120)
        assert pr.exitcode == 0
    _dims, vs, _ = read_netcdf(p)
    vals = sorted(float(x) for x in vs["v"][1].ravel())
    # worker w appends batches w*10+i with value w*10+i, 5 each
    assert vals == sorted(float(w * 10 + i) for w in range(2) for i in range(5))


def _appender_proc(path: str, worker: int) -> None:
    import numpy as np

    from deepicedrain_spark.sources.netcdf import append_records_once

    for i in range(5):
        bid = worker * 10 + i
        append_records_once(
            path, {"v": np.array([[float(bid)]])}, batch_id=bid
        )
        # redeliver every batch once — must be a no-op
        assert (
            append_records_once(path, {"v": np.array([[float(bid)]])}, batch_id=bid)
            is False
        )

def test_append_once_pre_fence_bails_before_bytes(tmp_path, monkeypatch):
    """ADVICE r6 (medium): a loser whose stale lock was broken must bail
    BEFORE writing any bytes when ownership is lost — file and ledger
    untouched, so redelivery applies the batch cleanly."""
    import numpy as np

    from deepicedrain_spark import fslock
    from deepicedrain_spark.sources.netcdf import (
        append_records_once,
        read_netcdf,
        write_netcdf,
    )

    p = str(tmp_path / "fence.nc")
    write_netcdf(
        p,
        {"t": None, "x": 2},
        {"v": (("t", "x"), np.empty((0, 2), dtype="f8"))},
    )
    a = np.array([[1.0, 2.0]])
    assert append_records_once(p, {"v": a}, batch_id=0) is True
    pre = open(p, "rb").read()

    monkeypatch.setattr(fslock.PathLock, "still_held", lambda self: False)
    with pytest.raises(RuntimeError, match="no bytes were written"):
        append_records_once(p, {"v": a * 3}, batch_id=1)
    assert open(p, "rb").read() == pre  # zero bytes written

    monkeypatch.undo()
    assert append_records_once(p, {"v": a * 3}, batch_id=1) is True
    _dims, vs, _ = read_netcdf(p)
    assert np.allclose(vs["v"][1], np.vstack([a, a * 3]))


def test_append_once_post_fence_truncates_phantom_records(tmp_path, monkeypatch):
    """ADVICE r6 (medium): if the ledger moves DURING the loser's append
    (winner committed under a broken-stale lock), the loser's records
    were bytes-on-disk with numrecs bumped but no ledger coverage —
    phantom records that a redelivery would duplicate. The post-append
    fence now truncates them back off before raising."""
    import numpy as np

    from deepicedrain_spark.sources import netcdf as ncmod
    from deepicedrain_spark.sources.netcdf import (
        append_records_once,
        read_netcdf,
        write_netcdf,
    )

    p = str(tmp_path / "phantom.nc")
    write_netcdf(
        p,
        {"t": None, "x": 2},
        {"v": (("t", "x"), np.empty((0, 2), dtype="f8"))},
    )
    a = np.array([[1.0, 2.0]])
    assert append_records_once(p, {"v": a}, batch_id=0) is True
    pre = open(p, "rb").read()

    real_load = ncmod._load_append_ledger
    calls = {"n": 0}

    def racing_load(sidecar):
        led = real_load(sidecar)
        calls["n"] += 1
        if calls["n"] == 3:  # the POST-append fence read: winner moved it
            led = dict(led)
            led["version"] = led["version"] + 7
        return led

    monkeypatch.setattr(ncmod, "_load_append_ledger", racing_load)
    with pytest.raises(RuntimeError, match="truncated back off"):
        append_records_once(p, {"v": a * 9}, batch_id=1)
    monkeypatch.undo()

    # the loser's records are GONE (file back to the committed state
    # modulo the rolled-back intent in the sidecar), no phantoms
    assert open(p, "rb").read() == pre
    assert append_records_once(p, {"v": a * 9}, batch_id=1) is True
    _dims, vs, _ = read_netcdf(p)
    assert vs["v"][1].shape == (2, 2)
    assert np.allclose(vs["v"][1], np.vstack([a, a * 9]))


def test_pathlock_unstatable_lock_times_out(tmp_path, monkeypatch):
    """ADVICE r6 (low): a lock whose mtime cannot be statted (EACCES on
    the directory) must TIME OUT, not busy-spin forever."""
    import os
    import time as _time

    from deepicedrain_spark.fslock import PathLock

    lock_path = str(tmp_path / "x.lock")
    with open(lock_path, "w") as fh:
        fh.write("someone-else")

    def denied(_p):
        raise PermissionError("stat denied")

    monkeypatch.setattr(os.path, "getmtime", denied)
    t0 = _time.monotonic()
    with pytest.raises(TimeoutError):
        with PathLock(lock_path, timeout=0.5):
            pass
    assert _time.monotonic() - t0 < 10.0  # bounded, no spin-forever


def test_append_once_repair_refuses_when_winner_committed_on_top(
    tmp_path, monkeypatch
):
    """ADVICE r7 (medium): the post-append self-repair must NOT truncate
    when the file no longer matches pre-state + exactly this writer's
    bytes. Scenario: the loser stalls AFTER append_records returns; the
    winner breaks the stale lock, rolls the loser's intent back, appends
    its own records and commits — the winner's committed data now sits
    above the loser's pre_len. An unconditional truncate would silently
    delete it; the guarded repair raises and leaves the file alone."""
    import numpy as np

    from deepicedrain_spark.sources import netcdf as ncmod
    from deepicedrain_spark.sources.netcdf import (
        append_records,
        append_records_once,
        read_netcdf,
        write_netcdf,
    )

    p = str(tmp_path / "ontop.nc")
    write_netcdf(
        p,
        {"t": None, "x": 2},
        {"v": (("t", "x"), np.empty((0, 2), dtype="f8"))},
    )
    a = np.array([[1.0, 2.0]])
    assert append_records_once(p, {"v": a}, batch_id=0) is True

    real_load = ncmod._load_append_ledger
    real_append = ncmod.append_records
    calls = {"n": 0}
    winner = np.array([[7.0, 8.0], [9.0, 10.0]])

    def racing_append(path, new_data):
        # the loser's own append runs ...
        real_append(path, new_data)
        # ... then it stalls; the winner rolls the loser back, appends
        # TWO records of its own and commits (simulated inline)
        led = real_load(path + ".applied.json")
        ncmod._rollback_intent(path, led["intent"])
        real_append(path, {"v": winner})
        ncmod._write_ledger(
            path + ".applied.json",
            {
                "version": led["version"] + 2,
                "applied": sorted(led["applied"] + [99]),
                "intent": None,
            },
        )

    monkeypatch.setattr(ncmod, "append_records", racing_append)
    with pytest.raises(RuntimeError, match="manual reconciliation"):
        append_records_once(p, {"v": a * 3}, batch_id=1)
    monkeypatch.undo()

    # the winner's committed records SURVIVE (old code truncated them)
    _dims, vs, _ = read_netcdf(p)
    assert vs["v"][1].shape == (3, 2)
    assert np.allclose(vs["v"][1], np.vstack([a, winner]))
