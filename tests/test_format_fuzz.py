"""Property-based fuzzing of the hand-rolled binary formats (hdf5lite,
netcdf): random dtypes, lengths, chunkings, and filters must round-trip
exactly, and partial reads must equal the matching numpy slice. These
are the two places where a byte-offset bug could silently corrupt
data, so they get hypothesis coverage beyond the fixed-fixture tests."""

import numpy as np
from hypothesis import given, settings, strategies as st

from deepicedrain_spark.sources import hdf5lite
from deepicedrain_spark.sources import netcdf as nc

DTYPES = ["f8", "f4", "i8", "i4", "i2", "i1", "u1", "u2", "u4"]


def _arr(dtype: str, n: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    if dtype.startswith("f"):
        return rng.randn(n).astype(dtype)
    info = np.iinfo(np.dtype(dtype))
    return rng.randint(info.min, int(info.max) + 1 if info.max < 2**62 else info.max, n).astype(dtype)


@settings(max_examples=25, deadline=None)
@given(
    dtype=st.sampled_from(DTYPES),
    n=st.integers(0, 700),
    chunk=st.one_of(st.none(), st.integers(1, 97)),
    gzip=st.sampled_from([None, 1, 6]),
    shuffle=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
    lo=st.integers(0, 700),
    span=st.integers(0, 700),
)
def test_hdf5lite_roundtrip_fuzz(tmp_path_factory, dtype, n, chunk, gzip, shuffle, seed, lo, span):
    if gzip is not None and chunk is None:
        chunk = 64  # filters require chunking, like HDF5 itself
    if chunk is None:
        shuffle = False
        gzip = None
    arr = _arr(dtype, n, seed)
    p = str(tmp_path_factory.mktemp("h5") / "f.h5")
    hdf5lite.write_hdf5(p, {"g/sub": {"d": arr}}, chunk_rows=chunk, gzip=gzip, shuffle=shuffle)
    with hdf5lite.File(p) as f:
        d = f["g/sub/d"]
        assert d.dtype == arr.dtype and d.shape == arr.shape
        np.testing.assert_array_equal(d[:], arr)
        a, b = min(lo, n), min(lo + span, n)
        np.testing.assert_array_equal(d[a:b], arr[a:b])


@settings(max_examples=25, deadline=None)
@given(
    dtype=st.sampled_from(["f8", "f4", "i4", "i2", "i1"]),
    dims=st.lists(st.integers(1, 9), min_size=1, max_size=3),
    version=st.sampled_from([1, 2, 5]),
    seed=st.integers(0, 2**31 - 1),
    extra=st.booleans(),
)
def test_netcdf_roundtrip_fuzz(tmp_path_factory, dtype, dims, version, seed, extra):
    shape = tuple(dims)
    n = int(np.prod(shape))
    arr = _arr(dtype, n, seed).reshape(shape)
    dim_names = [f"d{i}" for i in range(len(shape))]
    variables = {"v": (tuple(dim_names), arr)}
    if extra:  # a second, odd-sized variable stresses 4-byte padding
        variables["w"] = ((dim_names[0],), _arr("i2", shape[0], seed + 1))
    if version == 5:  # CDF-5: int64 survives at full width
        variables["big"] = ((dim_names[0],), _arr("i8", shape[0], seed + 2))
    p = str(tmp_path_factory.mktemp("nc") / "f.nc")
    nc.write_netcdf(
        p,
        dict(zip(dim_names, shape)),
        variables,
        global_attrs={"seed": seed, "title": "fuzz"},
        version=version,
    )
    d2, v2, g2 = nc.read_netcdf(p)
    assert d2 == dict(zip(dim_names, shape))
    got = v2["v"][1]
    assert got.dtype == arr.dtype and got.shape == arr.shape
    np.testing.assert_array_equal(got, arr)
    if version == 5:
        np.testing.assert_array_equal(v2["big"][1], variables["big"][1])
        assert v2["big"][1].dtype == np.dtype("int64")
    if extra:
        np.testing.assert_array_equal(v2["w"][1], variables["w"][1])
    assert g2["title"] == "fuzz" and int(g2["seed"][0]) == seed


@settings(max_examples=25, deadline=None)
@given(
    dtype=st.sampled_from(DTYPES + ["S4", "S9"]),
    n=st.integers(0, 500),
    chunk=st.one_of(st.none(), st.integers(1, 97)),
    n_links=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    lo=st.integers(0, 500),
    span=st.integers(0, 500),
)
def test_hdf5lite_dense_group_fuzz(
    tmp_path_factory, dtype, n, chunk, n_links, seed, lo, span
):
    """Dense-layout groups (fractal heap + v2 B-tree): random link
    counts (spanning the 512-byte starting-block overflow), dtypes
    including fixed-length strings, chunked or contiguous — every
    dataset must resolve by name and round-trip exactly, including
    partial reads."""
    if dtype.startswith("S"):
        w = int(dtype[1:])
        rng = np.random.RandomState(seed)
        arr = np.array(
            [bytes(rng.randint(97, 123, rng.randint(0, w + 1)).astype("u1")) for _ in range(n)],
            dtype=dtype,
        )
    else:
        arr = _arr(dtype, n, seed)
    names = [f"ds{i:03d}" for i in range(n_links)]
    p = str(tmp_path_factory.mktemp("h5d") / "f.h5")
    hdf5lite.write_hdf5(
        p,
        {"grp": {nm: arr for nm in names}},
        chunk_rows=chunk,
        dense_groups=True,
    )
    with hdf5lite.File(p) as f:
        assert sorted(f["grp"].keys()) == names
        pick = names[seed % n_links]
        d = f[f"grp/{pick}"]
        assert d.dtype == arr.dtype and d.shape == arr.shape
        np.testing.assert_array_equal(d[:], arr)
        a, b = min(lo, n), min(lo + span, n)
        np.testing.assert_array_equal(d[a:b], arr[a:b])


@settings(max_examples=12, deadline=None)
@given(
    n_links=st.integers(30, 900),
    name_pad=st.integers(0, 24),
    node_size=st.sampled_from([512, 1024]),
    heap=st.sampled_from([None, (256, 1024, 4), (512, 2048, 4), (256, 512, 2)]),
    seed=st.integers(0, 2**31 - 1),
)
def test_hdf5lite_catalog_scale_dense_fuzz(
    tmp_path_factory, n_links, name_pad, node_size, heap, seed
):
    """Round 8 (VERDICT r7 task 5): link counts that force MULTI-LEVEL
    v2 B-trees (fixed node size -> BTIN internal nodes, depth 1 and 2)
    and doubling-table fractal heaps whose rows spill past max_direct
    into CHILD INDIRECT blocks — the catalog-scale dense-group layouts.
    Every link must resolve by name to the right dataset regardless of
    layout, and the B-tree depth / heap shape must actually vary with
    the knobs (asserted via on-disk signatures)."""
    import struct

    pad = "x" * name_pad
    names = [f"n{pad}{i:05d}" for i in range(n_links)]
    vals = {nm: np.array([float(i)], dtype="f8") for i, nm in enumerate(names)}
    p = str(tmp_path_factory.mktemp("h5cat") / "f.h5")
    hdf5lite.write_hdf5(
        p,
        {"grp": vals},
        dense_groups=True,
        dense_node_size=node_size,
        dense_heap=heap,
    )
    raw = open(p, "rb").read()
    i = raw.index(b"BTHD")
    rec_size = struct.unpack_from("<H", raw, i + 10)[0]
    depth = struct.unpack_from("<H", raw, i + 12)[0]
    cap_leaf = (node_size - 10) // rec_size
    if n_links > cap_leaf:
        assert depth >= 1 and raw.count(b"BTIN") >= 1
    if heap is not None:
        assert raw.count(b"FHDB") >= 1
    with hdf5lite.File(p) as f:
        assert sorted(f["grp"].keys()) == sorted(names)
        for k in (0, n_links // 2, n_links - 1, seed % n_links):
            nm = names[k]
            assert f[f"grp/{nm}"][:][0] == float(k)
