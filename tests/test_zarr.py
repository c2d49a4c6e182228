"""Zarr v2 source/sink roundtrip (pure numpy/stdlib implementation)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from deepicedrain_spark.sources.zarr import read_zarr, write_zarr

SF_SMALL = "/root/testdata/sf0.001"


def test_zarr_roundtrip_values_and_pruning(spark, tmp_path):
    path = str(tmp_path / "ev.zarr")
    ev = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select("event_id", "user_id", "value")
        .withColumn("value", F.col("value").cast("double"))
    )
    write_zarr(ev, path, chunk_rows=100)

    # metadata is spec-shaped
    with open(os.path.join(path, "value", ".zarray")) as f:
        meta = json.load(f)
    assert meta["dtype"] == "<f8" and meta["chunks"] == [100]

    back = read_zarr(spark, path)
    assert back.count() == ev.count()
    # value multiset identical (global index is an artifact of layout)
    a = sorted(r["value"] for r in back.select("value").collect())
    b = sorted(r["value"] for r in ev.select("value").collect())
    assert a == b
    # per-event join-back equality via event_id
    j = back.alias("z").join(ev.alias("p"), on="event_id")
    n_bad = j.filter(
        (F.col("z.value") != F.col("p.value"))
        | (F.col("z.user_id") != F.col("p.user_id"))
    ).count()
    assert n_bad == 0

    pruned = read_zarr(spark, path, columns=["user_id"])
    assert set(pruned.columns) == {"row_index", "user_id"}

    # the real zarr lib, if present, must accept our store
    try:
        import zarr  # noqa: F401
    except ImportError:
        return
    g = zarr.open_group(path, mode="r")
    assert int(g["value"][:].shape[0]) == ev.count()


def test_zarr_rejects_nulls_and_overwrites(spark, tmp_path):
    import pytest

    path = str(tmp_path / "nulls.zarr")
    ok = spark.createDataFrame([(1, 1.0), (2, 2.0)], "a long, v double")
    write_zarr(ok, path, chunk_rows=1)
    # overwrite with a different schema/chunking must not leave stale files
    ok2 = spark.createDataFrame([(5,)], "b long")
    write_zarr(ok2, path, chunk_rows=100)
    assert not os.path.exists(os.path.join(path, "a"))
    back = read_zarr(spark, path)
    assert [r["b"] for r in back.collect()] == [5]

    bad = spark.createDataFrame([(1, 1.0), (2, None)], "a long, v double")
    with pytest.raises(ValueError, match="NULL"):
        write_zarr(bad, str(tmp_path / "bad.zarr"))


def test_zarr_crosscheck_against_zarr_python(spark, tmp_path):
    """VERDICT r3 task 10 (mirror of the h5py cross-check pattern):
    when the real zarr-python is available, (a) a store written by OUR
    writer opens under zarr-python with identical values, and (b) a
    store written by zarr-python reads back through OUR chunk-parallel
    scan. Skips cleanly where zarr isn't installed."""
    zarr = pytest.importorskip("zarr")
    import numpy as np

    from deepicedrain_spark.sources.zarr import read_zarr, write_zarr

    # ours -> zarr-python
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 0.5).alias("v"),
        (F.col("id") % 7).cast("int").alias("m"),
    )
    ours = str(tmp_path / "ours.zarr")
    write_zarr(df, ours, chunk_rows=1024)
    g = zarr.open_group(ours, mode="r")
    assert np.array_equal(np.asarray(g["k"]), np.arange(10_000))
    assert np.allclose(np.asarray(g["v"]), np.arange(10_000) * 0.5)
    assert np.array_equal(np.asarray(g["m"]), np.arange(10_000) % 7)

    # zarr-python -> ours (zlib compressor to match the scan's codec)
    theirs = str(tmp_path / "theirs.zarr")
    root = zarr.open_group(theirs, mode="w")
    try:
        from numcodecs import Zlib

        comp = {"compressor": Zlib(level=1)}
    except ImportError:
        comp = {}
    root.create_dataset("a", data=np.arange(5000, dtype="<i8"), chunks=512, **comp)
    root.create_dataset(
        "b", data=np.linspace(0, 1, 5000).astype("<f8"), chunks=512, **comp
    )
    try:
        zarr.consolidate_metadata(theirs)
    except Exception:
        pass
    back = read_zarr(spark, theirs)
    rows = back.orderBy("a").collect()
    assert len(rows) == 5000
    assert rows[17]["a"] == 17
    assert abs(rows[17]["b"] - 17 / 4999) < 1e-12


def test_zarr_edge_chunk_stored_full_size(spark, tmp_path):
    """Review finding r4: Zarr v2 stores edge chunks at FULL chunk
    shape — the raw final chunk must decompress to chunk_rows
    elements, or real zarr-python cannot read the store."""
    import zlib

    import numpy as np

    path = str(tmp_path / "edge.zarr")
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    write_zarr(df, path, chunk_rows=64)
    with open(os.path.join(path, "k", "0"), "rb") as fh:
        raw = zlib.decompress(fh.read())
    arr = np.frombuffer(raw, dtype="<i8")
    assert len(arr) == 64  # full chunk shape, zero-padded
    assert list(arr[:10]) == list(range(10))
    back = read_zarr(spark, path)
    assert back.count() == 10  # shape still clips on read


def test_zarr_write_failure_preserves_old_store(spark, tmp_path):
    """Review finding r4: the store is staged and renamed into place —
    a failing write must leave the previous store readable."""
    import pytest

    path = str(tmp_path / "keep.zarr")
    ok = spark.range(0, 5).select(F.col("id").alias("k"))
    write_zarr(ok, path, chunk_rows=8)
    bad = spark.range(0, 5).select(
        F.when(F.col("id") == 3, None).otherwise(F.col("id")).alias("k")
    )
    with pytest.raises(Exception):
        write_zarr(bad, path, chunk_rows=8)  # NULLs are rejected
    back = read_zarr(spark, path)
    assert back.count() == 5  # old store intact


def test_zarr_read_rejects_filtered_store(spark, tmp_path):
    """Review finding r4: a store using codec filters must raise, not
    silently decode shuffled bytes into garbage."""
    import json as _json

    import pytest

    path = str(tmp_path / "filt.zarr")
    df = spark.range(0, 4).select(F.col("id").alias("k"))
    write_zarr(df, path, chunk_rows=8)
    meta_p = os.path.join(path, ".zmetadata")
    meta = _json.load(open(meta_p))
    meta["metadata"]["k/.zarray"]["filters"] = [{"id": "shuffle", "elementsize": 8}]
    _json.dump(meta, open(meta_p, "w"))
    with pytest.raises(ValueError, match="filters"):
        read_zarr(spark, path).collect()


def test_zarr_v3_roundtrip_and_layout(spark, tmp_path):
    """Round 4: the v3 (ZEP1) layout — zarr.json nodes, bytes+gzip
    codec chain, c/<i> chunk keys — round-trips through the same
    distributed writer/scanner, auto-detected by read_zarr."""
    path = str(tmp_path / "v3.zarr")
    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        (F.col("id") * 0.5).alias("v"),
        (F.col("id") % 2 == 0).alias("b"),
    )
    write_zarr(df, path, chunk_rows=64, zarr_format=3)
    root = json.load(open(os.path.join(path, "zarr.json")))
    assert root["zarr_format"] == 3 and root["node_type"] == "group"
    # round 10: the root carries consolidated metadata for every array
    assert set(root["consolidated_metadata"]["metadata"]) == {"k", "v", "b"}
    am = json.load(open(os.path.join(path, "k", "zarr.json")))
    assert am["data_type"] == "int64"
    assert [c["name"] for c in am["codecs"]] == ["bytes", "gzip"]
    assert os.path.isfile(os.path.join(path, "k", "c", "0"))

    back = read_zarr(spark, path)
    assert back.count() == 500
    r = back.orderBy("k").collect()[123]
    assert r["k"] == 123 and r["v"] == 61.5 and r["b"] is False

    # column pruning works on v3 too
    pruned = read_zarr(spark, path, columns=["v"])
    assert set(pruned.columns) == {"row_index", "v"}

    # cross-check with real zarr-python when available
    try:
        import zarr
    except ImportError:
        return
    import numpy as np

    g = zarr.open_group(path, mode="r")
    assert np.array_equal(np.asarray(g["k"]), np.arange(500))



def _patch_v3_meta(store, col, fn):
    """Apply fn to a v3 array's metadata in BOTH authoritative copies —
    the per-array zarr.json and the root's consolidated_metadata entry
    (round 10: the reader prefers the consolidated block, exactly like
    v2's .zmetadata, so external mutations must keep them in sync)."""
    import json
    import os

    zp = os.path.join(store, col, "zarr.json")
    m = json.load(open(zp))
    fn(m)
    json.dump(m, open(zp, "w"))
    rp = os.path.join(store, "zarr.json")
    root = json.load(open(rp))
    cm = (root.get("consolidated_metadata") or {}).get("metadata", {})
    if col in cm:
        fn(cm[col])
        json.dump(root, open(rp, "w"))


def test_v3_rejects_nondefault_chunk_key_encoding(spark, tmp_path):
    """ADVICE r4 (low): a v3 store using the spec's 'v2' chunk-key
    encoding must be rejected up front with a clear error, not a bare
    FileNotFoundError from the wrong c/<i> path."""
    import pytest

    path = str(tmp_path / "cke.zarr")
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    write_zarr(df, path, chunk_rows=8, zarr_format=3)
    def flip(m):
        m["chunk_key_encoding"] = {"name": "v2", "configuration": {"separator": "."}}

    _patch_v3_meta(path, "k", flip)
    with pytest.raises(ValueError, match="chunk_key_encoding"):
        read_zarr(spark, path).collect()


def test_read_zarr_dir_mixed_versions(spark, tmp_path):
    """Multi-store scan (the reference's open_mfdataset shape): v2 and
    v3 stores under one parent read as ONE task table with per-store
    row_index and a store column; schema drift across stores is
    rejected up front."""
    import pytest

    from deepicedrain_spark.sources.zarr import read_zarr_dir

    parent = str(tmp_path / "stores")
    os.makedirs(parent)
    for i, fmt in enumerate([2, 2, 3]):
        df = spark.range(i * 100, i * 100 + 50 + i).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
        )
        write_zarr(df, os.path.join(parent, f"s{i}"), chunk_rows=16, zarr_format=fmt)

    back = read_zarr_dir(spark, parent)
    assert set(back.columns) == {"store", "row_index", "k", "v"}
    assert back.count() == 50 + 51 + 52
    per = {r["store"]: r["n"] for r in back.groupBy("store").agg(F.count("*").alias("n")).collect()}
    assert per == {"s0": 50, "s1": 51, "s2": 52}
    # row_index restarts per store (the per-granule ref_pt axis)
    mx = {r["store"]: (r["lo"], r["hi"]) for r in back.groupBy("store")
          .agg(F.min("row_index").alias("lo"), F.max("row_index").alias("hi")).collect()}
    assert mx == {"s0": (0, 49), "s1": (0, 50), "s2": (0, 51)}
    # values survive: k=137 lives in s1 (100..150), v = 2k
    r = back.where(F.col("k") == 137).collect()
    assert len(r) == 1 and r[0]["store"] == "s1" and r[0]["v"] == 274.0

    # column pruning
    pruned = read_zarr_dir(spark, parent, columns=["v"])
    assert set(pruned.columns) == {"store", "row_index", "v"}

    # schema drift rejected
    df = spark.range(0, 5).select(F.col("id").alias("DIFFERENT"))
    write_zarr(df, os.path.join(parent, "bad"), chunk_rows=4)
    with pytest.raises(ValueError, match="schema drift"):
        read_zarr_dir(spark, parent)


def test_read_zarr_dir_union_schema_evolution(spark, tmp_path):
    """schema_mode='union': stores with heterogeneous variable sets
    union like xr.open_mfdataset(combine='nested') — missing variables
    read as NULL (never a fill value), present variables keep exact
    values, and strict mode still rejects the same layout."""
    import pytest

    from deepicedrain_spark.sources.zarr import read_zarr_dir

    parent = str(tmp_path / "evolving")
    os.makedirs(parent)
    full = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"),
        (F.col("id") + 1000).alias("extra"),
    )
    write_zarr(full, os.path.join(parent, "s_full"), chunk_rows=16)
    write_zarr(full.select("k", "v"), os.path.join(parent, "s_nov_extra"),
               chunk_rows=16, zarr_format=3)
    write_zarr(full.select("k", "extra").where(F.col("k") < 10),
               os.path.join(parent, "s_nov_v"), chunk_rows=4)

    # strict rejects the drift
    with pytest.raises(ValueError, match="schema drift"):
        read_zarr_dir(spark, parent)

    back = read_zarr_dir(spark, parent, schema_mode="union")
    assert set(back.columns) == {"store", "row_index", "k", "v", "extra"}
    assert back.count() == 40 + 40 + 10
    # per-store null pattern: count(col) skips exactly the absent stores
    per = {
        r["store"]: (r["nv"], r["ne"])
        for r in back.groupBy("store")
        .agg(F.count("v").alias("nv"), F.count("extra").alias("ne"))
        .collect()
    }
    assert per == {"s_full": (40, 40), "s_nov_extra": (40, 0), "s_nov_v": (0, 10)}
    # present values exact; absent reads as NULL, not NaN or a fill value
    r = back.where((F.col("store") == "s_nov_v") & (F.col("k") == 3)).collect()[0]
    assert r["extra"] == 1003 and r["v"] is None
    # downstream dropna(thresh) prunes granules missing variables — the
    # reference's atlxi_dhdt.py:111 shape
    assert back.dropna(subset=["v", "extra"]).count() == 40

    # column restriction intersects per store; requesting only a column
    # some store lacks entirely raises a clear error
    sub = read_zarr_dir(spark, parent, columns=["k", "v"], schema_mode="union")
    assert set(sub.columns) == {"store", "row_index", "k", "v"}
    with pytest.raises(ValueError, match="none of the requested"):
        read_zarr_dir(spark, parent, columns=["v"], schema_mode="union")
    # a requested column in NO store must raise too — the per-store
    # check above can't see it when every store still has SOME
    # requested column (ADVICE r11: a typo'd name silently narrowed
    # the frame)
    with pytest.raises(ValueError, match="appear in no store"):
        read_zarr_dir(spark, parent, columns=["k", "typo"], schema_mode="union")

    # conflicting dtype for a PRESENT variable still raises in union mode
    bad = spark.range(0, 5).select(F.col("id").cast("double").alias("k"))
    write_zarr(bad, os.path.join(parent, "s_badtype"), chunk_rows=4)
    with pytest.raises(ValueError, match="schema drift for variable 'k'"):
        read_zarr_dir(spark, parent, schema_mode="union")


def test_read_zarr_dir_union_ignores_offaxis_aux(spark, tmp_path):
    """A store may carry an auxiliary array on another axis (xarray's
    per-cycle coordinate, length != the row axis). A column-restricted
    scan never touches it and must not trip the ragged check — in
    union AND strict mode; requesting everything still rejects it."""
    import json
    import shutil

    import numpy as np
    import pytest

    from deepicedrain_spark.sources.zarr import read_zarr_dir, write_zarr_local

    parent = str(tmp_path / "aux")
    os.makedirs(parent)
    main = os.path.join(parent, "m1")
    write_zarr_local(main, {"k": np.arange(40, dtype="i8"),
                            "v": (np.arange(40) * 2.0)}, chunk_rows=16)
    auxsrc = os.path.join(str(tmp_path), "auxsrc")
    write_zarr_local(auxsrc, {"cyc": np.arange(9, dtype="i8")}, chunk_rows=16)
    # graft the 9-long coordinate array into the 40-row store
    shutil.copytree(os.path.join(auxsrc, "cyc"), os.path.join(main, "cyc"))
    with open(os.path.join(main, ".zmetadata")) as f:
        zm = json.load(f)
    with open(os.path.join(auxsrc, ".zmetadata")) as f:
        zb = json.load(f)
    zm["metadata"]["cyc/.zarray"] = zb["metadata"]["cyc/.zarray"]
    with open(os.path.join(main, ".zmetadata"), "w") as f:
        json.dump(zm, f)

    for mode in ("strict", "union"):
        back = read_zarr_dir(spark, parent, columns=["k", "v"], schema_mode=mode)
        assert back.count() == 40
        assert set(back.columns) == {"store", "row_index", "k", "v"}
    # unrestricted scans still reject the genuinely ragged request
    with pytest.raises(ValueError, match="ragged"):
        read_zarr_dir(spark, parent)
    with pytest.raises(ValueError, match="ragged"):
        read_zarr_dir(spark, parent, schema_mode="union")
    # strict missing-column request errors clearly (not a KeyError)
    with pytest.raises(ValueError, match="no array"):
        read_zarr_dir(spark, parent, columns=["nope"])


def test_write_zarr_partitioned_per_key_stores(spark, tmp_path):
    """One store per key written on executors (the reference's
    per-track layout), read back by read_zarr_dir, byte-compatible with
    the single-store reader; zarr-python cross-check when available."""
    from deepicedrain_spark.sources.zarr import read_zarr_dir, write_zarr_partitioned

    parent = str(tmp_path / "tracks")
    df = spark.range(0, 3000).select(
        (F.col("id") % 4).alias("rgt"),
        F.col("id").alias("seq"),
        (F.col("id") * 0.5).alias("h"),
    )
    manifest = write_zarr_partitioned(
        df, parent, key_col="rgt", chunk_rows=128, sort_col="seq", zarr_format=2
    ).collect()
    assert sorted(r["rgt"] for r in manifest) == [0, 1, 2, 3]
    assert all(r["n_rows"] == 750 for r in manifest)
    assert sorted(os.listdir(parent)) == [f"store_{k}" for k in range(4)]

    back = read_zarr_dir(spark, parent)
    assert back.count() == 3000
    r = back.where(F.col("seq") == 1234).collect()[0]
    assert r["store"] == "store_2" and r["h"] == 617.0  # 1234 % 4 == 2
    # sort_col ordering inside each store: row_index follows seq order
    s0 = back.where(F.col("store") == "store_0").orderBy("row_index").collect()
    seqs = [x["seq"] for x in s0]
    assert seqs == sorted(seqs)

    # single-store reader agrees on one of the stores
    one = read_zarr(spark, os.path.join(parent, "store_3"))
    assert one.count() == 750

    try:
        import zarr
    except ImportError:
        return
    import numpy as np

    g = zarr.open_group(os.path.join(parent, "store_1"), mode="r")
    assert np.array_equal(np.asarray(g["seq"])[:4], np.array([1, 5, 9, 13]))


def test_zarr_2d_roundtrip_both_formats(spark, tmp_path):
    """Round 9: rank-2 arrays (the ATL11 h_corr[ref_pt, cycle] shape)
    write with a multi-axis chunk grid and read back exactly as
    array<float> columns, in BOTH v2 ('i.j' keys) and v3 ('c/i/j'
    keys), edge chunks on both axes."""
    import numpy as np

    from deepicedrain_spark.sources.zarr import read_zarr, write_zarr_local

    h = (np.arange(1003 * 9, dtype="f4").reshape(1003, 9) * 0.25)
    seg = np.arange(1003, dtype="i8")
    for fmt in (2, 3):
        p = str(tmp_path / f"store_v{fmt}")
        write_zarr_local(
            p, {"h_corr": h.copy(), "ref_pt": seg.copy()},
            zarr_format=fmt, chunk_shape=(256, 4),
        )
        df = read_zarr(spark, p)
        assert dict(df.dtypes)["h_corr"] == "array<float>"
        rows = {r["ref_pt"]: r["h_corr"] for r in df.collect()}
        assert len(rows) == 1003
        for i in (0, 255, 256, 511, 1002):
            assert rows[i] == pytest.approx(list(h[i])), (fmt, i)


def test_zarr_2d_crosscheck_against_zarr_python(tmp_path):
    """Multi-axis chunked 2-D stores interoperate with real
    zarr-python in both directions (skips when absent)."""
    zarr = pytest.importorskip("zarr")
    import numpy as np

    from deepicedrain_spark.sources.zarr import (
        _read_stripe,
        _store_arrays,
        write_zarr_local,
    )

    h = np.arange(300 * 6, dtype="f4").reshape(300, 6) * 0.5
    ours = str(tmp_path / "ours")
    write_zarr_local(ours, {"h_corr": h.copy()}, zarr_format=2, chunk_shape=(64, 3))
    za = zarr.open(ours, mode="r")
    assert np.array_equal(za["h_corr"][:], h)
    theirs = str(tmp_path / "theirs")
    g = zarr.open_group(theirs, mode="w", zarr_format=2)
    g.create_array("h_corr", data=h, chunks=(64, 3))
    try:
        zarr.consolidate_metadata(theirs)
    except Exception:
        pytest.skip("zarr-python cannot consolidate v2 metadata here")
    arrays = _store_arrays(theirs, None)
    a = arrays["h_corr"]
    got = np.vstack(
        [
            _read_stripe(theirs, "h_corr", a, cid, min(a["chunks"][0], 300 - cid * a["chunks"][0]))
            for cid in range((300 + a["chunks"][0] - 1) // a["chunks"][0])
        ]
    )
    assert np.array_equal(got, h)


def test_read_zarr_dir_2d_mixed_versions(spark, tmp_path):
    """read_zarr_dir concatenates 2-D stores of DIFFERENT zarr
    versions into one array-column frame, store tag attached."""
    import numpy as np

    from deepicedrain_spark.sources.zarr import read_zarr_dir, write_zarr_local

    for g, fmt in ((0, 2), (1, 3)):
        h = np.full((50, 3), float(g), dtype="f4")
        write_zarr_local(
            str(tmp_path / f"t{g}"), {"h_corr": h}, zarr_format=fmt, chunk_shape=(16, 2)
        )
    df = read_zarr_dir(spark, str(tmp_path))
    got = df.groupBy("store").count().collect()
    assert {(r["store"], r["count"]) for r in got} == {("t0", 50), ("t1", 50)}
    one = df.where("store = 't1'").limit(1).collect()[0]
    assert one["h_corr"] == [1.0, 1.0, 1.0]


def test_zarr_missing_chunk_reads_as_fill(spark, tmp_path):
    """The spec defines an ABSENT chunk key as fill_value everywhere
    (zarr-python omits all-fill chunks by default) — the reader must
    synthesize the fill block, not crash, for NaN and numeric fills,
    1-D and 2-D, v2 and v3."""
    import json
    import math
    import os

    import numpy as np

    from deepicedrain_spark.sources.zarr import read_zarr, write_zarr_local

    for fmt in (2, 3):
        p = str(tmp_path / f"s{fmt}")
        h = np.arange(40 * 4, dtype="f4").reshape(40, 4)
        seg = np.arange(40, dtype="i8")
        write_zarr_local(p, {"h_corr": h, "ref_pt": seg}, zarr_format=fmt, chunk_shape=(16, 2))
        # delete one interior 2-D chunk and one 1-D chunk; mark NaN fill
        if fmt == 2:
            os.unlink(os.path.join(p, "h_corr", "1.1"))
            os.unlink(os.path.join(p, "ref_pt", "2"))
            zp = os.path.join(p, "h_corr", ".zarray")
            m = json.load(open(zp)); m["fill_value"] = "NaN"
            json.dump(m, open(zp, "w"))
            mp = os.path.join(p, ".zmetadata")
            cm = json.load(open(mp)); cm["metadata"]["h_corr/.zarray"]["fill_value"] = "NaN"
            json.dump(cm, open(mp, "w"))
        else:
            os.unlink(os.path.join(p, "h_corr", "c", "1", "1"))
            os.unlink(os.path.join(p, "ref_pt", "c", "2"))

            def nanfill(m):
                m["fill_value"] = "NaN"

            _patch_v3_meta(p, "h_corr", nanfill)
        rows = {r["row_index"]: r for r in read_zarr(spark, p).collect()}
        # rows 16..31, cols 2..3 came from the deleted h_corr chunk
        assert all(math.isnan(v) for v in rows[20]["h_corr"][2:4])
        assert rows[20]["h_corr"][0] == h[20][0]  # present chunk intact
        assert rows[5]["h_corr"] == pytest.approx(list(h[5]))
        # ref_pt rows 32..39 came from the deleted 1-D chunk: int fill 0
        assert rows[35]["ref_pt"] == 0 and rows[10]["ref_pt"] == 10


def test_zarr_rejects_fortran_order(spark, tmp_path):
    """v2 order='F' chunks would decode silently transposed — reject."""
    import json
    import os

    import numpy as np

    from deepicedrain_spark.sources.zarr import read_zarr, write_zarr_local

    p = str(tmp_path / "s")
    write_zarr_local(
        p, {"h_corr": np.zeros((8, 3), dtype="f4")}, zarr_format=2, chunk_shape=(4, 3)
    )
    for mp, key in ((os.path.join(p, "h_corr", ".zarray"), None),
                    (os.path.join(p, ".zmetadata"), "h_corr/.zarray")):
        m = json.load(open(mp))
        (m["metadata"][key] if key else m)["order"] = "F"
        json.dump(m, open(mp, "w"))
    with pytest.raises(Exception, match="order"):
        read_zarr(spark, p).collect()


def test_read_zarr_dir_skips_staging_leftovers(spark, tmp_path):
    """A killed writer's complete '*.staging.*' / '*.tmp.*' store must
    not be scanned as an extra store."""
    import shutil

    import numpy as np

    from deepicedrain_spark.sources.zarr import read_zarr_dir, write_zarr_local

    good = str(tmp_path / "track_1")
    write_zarr_local(good, {"v": np.arange(10, dtype="i8")})
    shutil.copytree(good, str(tmp_path / "track_1.tmp.12345"))
    shutil.copytree(good, str(tmp_path / "track_1.staging.99"))
    df = read_zarr_dir(spark, str(tmp_path))
    assert {r["store"] for r in df.select("store").distinct().collect()} == {"track_1"}
    assert df.count() == 10


def test_zarr_rank1_fortran_order_reads(spark, tmp_path):
    """Rank-1 order='F' is byte-identical to C-order — must still read
    (ADVICE r9: the rank-2 rejection must not catch valid 1-D stores)."""
    import json
    import os

    import numpy as np

    from deepicedrain_spark.sources.zarr import read_zarr, write_zarr_local

    p = str(tmp_path / "s1d")
    write_zarr_local(p, {"v": np.arange(12, dtype="i8")}, zarr_format=2, chunk_shape=(5,))
    for mp, key in ((os.path.join(p, "v", ".zarray"), None),
                    (os.path.join(p, ".zmetadata"), "v/.zarray")):
        m = json.load(open(mp))
        (m["metadata"][key] if key else m)["order"] = "F"
        json.dump(m, open(mp, "w"))
    rows = sorted(r["v"] for r in read_zarr(spark, p).collect())
    assert rows == list(range(12))


def test_read_zarr_dir_keeps_tmp_named_store(spark, tmp_path):
    """Only the '<name>.(staging|tmp).<digits>' SUFFIX marks a leftover;
    a store legitimately NAMED 'track.tmp.archive' must scan (ADVICE r9)."""
    import numpy as np

    from deepicedrain_spark.sources.zarr import read_zarr_dir, write_zarr_local

    write_zarr_local(str(tmp_path / "track.tmp.archive"), {"v": np.arange(3, dtype="i8")})
    write_zarr_local(str(tmp_path / "plain"), {"v": np.arange(2, dtype="i8")})
    write_zarr_local(str(tmp_path / "plain.staging.777"), {"v": np.arange(9, dtype="i8")})
    # synth_once's rename-aside during a directory fixture swap
    # (round 10) must not scan as a phantom store either
    write_zarr_local(str(tmp_path / "plain.old.777"), {"v": np.arange(7, dtype="i8")})
    df = read_zarr_dir(spark, str(tmp_path))
    assert {r["store"] for r in df.select("store").distinct().collect()} == {
        "track.tmp.archive", "plain",
    }
    assert df.count() == 5


def _be_v2_store(root, name, arrays, chunk0):
    """Hand-built big-endian v2 store (NOT via the own writer): zlib
    chunks of '>'-order numpy bytes + consolidated metadata."""
    import json
    import os
    import zlib

    import numpy as np

    p = os.path.join(root, name)
    consolidated = {}
    for col, arr in arrays.items():
        os.makedirs(os.path.join(p, col))
        be = arr.astype(arr.dtype.newbyteorder(">"))
        meta = {
            "zarr_format": 2, "shape": list(arr.shape),
            "chunks": [chunk0] + list(arr.shape[1:]),
            "dtype": be.dtype.str, "compressor": {"id": "zlib", "level": 1},
            "fill_value": None, "order": "C", "filters": None,
            "dimension_separator": ".",
        }
        json.dump(meta, open(os.path.join(p, col, ".zarray"), "w"))
        consolidated[f"{col}/.zarray"] = meta
        for i in range(0, arr.shape[0], chunk0):
            block = np.zeros((chunk0,) + arr.shape[1:], dtype=be.dtype)
            seg = be[i : i + chunk0]
            block[: len(seg)] = seg
            key = str(i // chunk0) if arr.ndim == 1 else f"{i // chunk0}.0"
            open(os.path.join(p, col, key), "wb").write(zlib.compress(block.tobytes()))
    json.dump({"zarr_format": 2, "metadata": consolidated},
              open(os.path.join(p, ".zmetadata"), "w"))
    return p


def test_zarr_bigendian_v2_reads_native(spark, tmp_path):
    """'>i8'/'>f4' v2 stores written by another toolchain read with
    values identical to the LE equivalent (round 10, VERDICT r9 #3)."""
    import numpy as np

    h = (np.arange(90, dtype="f4").reshape(30, 3) * 0.5 - 7).astype("f4")
    seg = np.arange(30, dtype="i8") * 11
    p = _be_v2_store(str(tmp_path), "be_store", {"h_corr": h, "ref_pt": seg}, 8)
    rows = {r["row_index"]: r for r in read_zarr(spark, p).collect()}
    assert len(rows) == 30
    for i in (0, 7, 8, 29):
        assert rows[i]["ref_pt"] == seg[i]
        assert rows[i]["h_corr"] == pytest.approx(list(h[i]))
    # declared schema is the LOGICAL type — long / array<float>
    df = read_zarr(spark, p)
    assert dict(df.dtypes)["ref_pt"] == "bigint"
    assert dict(df.dtypes)["h_corr"] == "array<float>"


def test_zarr_bigendian_v3_reads_native(spark, tmp_path):
    """v3 bytes codec 'endian: big' reads, values LE-identical."""
    import json
    import os

    import numpy as np

    from deepicedrain_spark.sources.zarr import write_zarr_local

    p = str(tmp_path / "v3be")
    v = np.arange(25, dtype="f8") * 1.25
    write_zarr_local(p, {"v": v}, zarr_format=3, chunk_shape=(10,))
    # byteswap the chunk payloads and flip the codec declaration
    import zlib

    def gz(b):
        co = zlib.compressobj(1, zlib.DEFLATED, 31)
        return co.compress(b) + co.flush()

    def flip_be(m):
        for c in m["codecs"]:
            if c["name"] == "bytes":
                c["configuration"]["endian"] = "big"

    _patch_v3_meta(p, "v", flip_be)
    for i in range(3):
        cp = os.path.join(p, "v", "c", str(i))
        blk = np.zeros(10, dtype="f8")
        seg = v[i * 10 : i * 10 + 10]
        blk[: len(seg)] = seg
        open(cp, "wb").write(gz(blk.astype(">f8").tobytes()))
    rows = sorted((r["row_index"], r["v"]) for r in read_zarr(spark, p).collect())
    assert [x for _, x in rows] == pytest.approx(list(v))


def test_zarr_dir_mixes_be_and_le_stores(spark, tmp_path):
    """Cross-store schema signature uses the NORMALIZED dtype, so a BE
    granule and an LE granule union in one scan."""
    import numpy as np

    from deepicedrain_spark.sources.zarr import read_zarr_dir, write_zarr_local

    seg = np.arange(6, dtype="i8")
    write_zarr_local(str(tmp_path / "le_track"), {"ref_pt": seg})
    _be_v2_store(str(tmp_path), "be_track", {"ref_pt": seg + 100}, 4)
    df = read_zarr_dir(spark, str(tmp_path))
    got = sorted(r["ref_pt"] for r in df.collect())
    assert got == sorted(list(seg) + list(seg + 100))


# --- v3 sharding_indexed reads (round 10) ------------------------------
def _write_sharded_store(
    path: str,
    col: str,
    data,
    outer,
    inner,
    gzip_inner: bool = True,
    crc: bool = True,
    index_location: str = "end",
    drop_inner: set | None = None,
    fill_value=0,
):
    """Hand-construct a v3 store whose array uses sharding_indexed —
    built byte-by-byte from the spec (NOT via the repo's writer), so
    the test validates the reader against the wire format: per shard,
    concatenated encoded inner chunks + a uint64-LE (offset, nbytes)
    index (2^64-1 pairs for missing inner chunks), crc32c-stamped,
    at index_location."""
    import json
    import os
    import zlib

    import numpy as np

    from deepicedrain_spark.sources.zarr import _NP_TO_V3, _crc32c

    data = np.asarray(data)
    drop_inner = drop_inner or set()
    os.makedirs(os.path.join(path, col), exist_ok=True)
    with open(os.path.join(path, "zarr.json"), "w") as f:
        json.dump({"zarr_format": 3, "node_type": "group", "attributes": {}}, f)
    inner_codecs = [{"name": "bytes", "configuration": {"endian": "little"}}]
    if gzip_inner:
        inner_codecs.append({"name": "gzip", "configuration": {"level": 1}})
    index_codecs = [{"name": "bytes", "configuration": {"endian": "little"}}]
    if crc:
        index_codecs.append({"name": "crc32c"})
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(data.shape),
        "data_type": _NP_TO_V3[np.dtype(data.dtype).newbyteorder("<").str],
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": list(outer)}},
        "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        "codecs": [
            {
                "name": "sharding_indexed",
                "configuration": {
                    "chunk_shape": list(inner),
                    "codecs": inner_codecs,
                    "index_codecs": index_codecs,
                    "index_location": index_location,
                },
            }
        ],
        "fill_value": fill_value,
        "attributes": {},
    }
    with open(os.path.join(path, col, "zarr.json"), "w") as f:
        json.dump(meta, f)

    def gz(b: bytes) -> bytes:
        if not gzip_inner:
            return b
        co = zlib.compressobj(1, zlib.DEFLATED, 31)
        return co.compress(b) + co.flush()

    grid = [o // i for o, i in zip(outer, inner)]
    n_inner = 1
    for g in grid:
        n_inner *= g
    n_shards = [(s + o - 1) // o for s, o in zip(data.shape, outer)]

    def shard_coords():
        if len(n_shards) == 1:
            return [(i,) for i in range(n_shards[0])]
        return [(i, j) for i in range(n_shards[0]) for j in range(n_shards[1])]

    for sc in shard_coords():
        # full-size shard holding the data slice (edges zero-padded)
        full = np.full(outer, fill_value, dtype=data.dtype)
        src = tuple(
            slice(c * o, min((c + 1) * o, s)) for c, o, s in zip(sc, outer, data.shape)
        )
        dst = tuple(slice(0, sl.stop - sl.start) for sl in src)
        full[dst] = data[src]
        blobs, index = [], []
        offset = 0
        for k in range(n_inner):
            pos, rem = [], k
            for g in reversed(grid):
                pos.append(rem % g)
                rem //= g
            pos = pos[::-1]
            if (sc, k) in drop_inner or k in drop_inner:
                index.append((0xFFFFFFFFFFFFFFFF, 0xFFFFFFFFFFFFFFFF))
                continue
            sl = tuple(slice(p * i, (p + 1) * i) for p, i in zip(pos, inner))
            blob = gz(np.ascontiguousarray(full[sl]).tobytes())
            index.append((offset, len(blob)))
            blobs.append(blob)
            offset += len(blob)
        idx = np.array(index, dtype="<u8").tobytes()
        if index_location == "start":
            head_len = len(idx) + (4 if crc else 0)
            index = [
                (o + head_len, n) if o != 0xFFFFFFFFFFFFFFFF else (o, n)
                for o, n in index
            ]
            idx = np.array(index, dtype="<u8").tobytes()
        if crc:
            idx += _crc32c(idx).to_bytes(4, "little")
        body = b"".join(blobs)
        payload = idx + body if index_location == "start" else body + idx
        key = os.path.join(path, col, "c", *[str(c) for c in sc])
        os.makedirs(os.path.dirname(key), exist_ok=True)
        with open(key, "wb") as f:
            f.write(payload)


def test_v3_sharded_1d_reads_exactly(spark, tmp_path):
    import numpy as np

    from deepicedrain_spark.sources.zarr import read_zarr

    data = (np.arange(1000, dtype="i8") * 3) % 997
    store = str(tmp_path / "shard1d")
    _write_sharded_store(store, "v", data, outer=[512], inner=[128])
    got = read_zarr(spark, store, columns=["v"]).orderBy("row_index").collect()
    assert [r["v"] for r in got] == data.tolist()


def test_v3_sharded_2d_with_missing_inner_chunks(spark, tmp_path):
    import math

    import numpy as np

    from deepicedrain_spark.sources.zarr import read_zarr

    h = (np.arange(300, dtype="f4")[:, None] * 0.5 + np.arange(9)[None, :]).astype("f4")
    store = str(tmp_path / "shard2d")
    # drop inner chunk #1 of EVERY shard -> reads as NaN fill there
    _write_sharded_store(
        store, "h", h, outer=[128, 4], inner=[64, 2],
        drop_inner={1}, fill_value="NaN",
    )
    rows = read_zarr(spark, store, columns=["h"]).orderBy("row_index").collect()
    assert len(rows) == 300
    for i, r in enumerate(rows):
        vec = r["h"]
        assert len(vec) == 9
        for j, v in enumerate(vec):
            # inner grid: axis0 64-blocks x axis1 2-blocks; chunk #1 of
            # each shard = rows [0,64) of the shard, cols [2,4)
            in_dropped = (i % 128) < 64 and 2 <= (j % 4) < 4
            if in_dropped:
                assert math.isnan(v), (i, j, v)
            else:
                assert v == float(np.float32(i * 0.5 + j)), (i, j, v)


def test_v3_sharded_index_at_start_uncompressed_nocrc(spark, tmp_path):
    import numpy as np

    from deepicedrain_spark.sources.zarr import read_zarr

    data = np.arange(200, dtype="f8") / 4.0
    store = str(tmp_path / "shardstart")
    _write_sharded_store(
        store, "v", data, outer=[128], inner=[32],
        gzip_inner=False, crc=False, index_location="start",
    )
    got = read_zarr(spark, store, columns=["v"]).orderBy("row_index").collect()
    assert [r["v"] for r in got] == data.tolist()


def test_v3_shard_crc_mismatch_raises(tmp_path):
    import glob

    import numpy as np
    import pytest

    from deepicedrain_spark.sources.zarr import _read_stripe, _store_arrays

    data = np.arange(64, dtype="i8")
    store = str(tmp_path / "shardbad")
    _write_sharded_store(store, "v", data, outer=[64], inner=[16])
    shard_file = glob.glob(f"{store}/v/c/*")[0]
    raw = bytearray(open(shard_file, "rb").read())
    raw[-1] ^= 0xFF  # flip a crc byte
    open(shard_file, "wb").write(bytes(raw))
    arrays = _store_arrays(store, ["v"])
    with pytest.raises(ValueError, match="crc32c mismatch"):
        _read_stripe(store, "v", arrays["v"], 0, 64)


def test_v3_sharded_mixes_with_plain_stores_in_dir_scan(spark, tmp_path):
    import numpy as np

    from deepicedrain_spark.sources.zarr import read_zarr_dir, write_zarr_local

    parent = str(tmp_path)
    a = np.arange(100, dtype="i8")
    _write_sharded_store(str(tmp_path / "s_shard"), "v", a, outer=[64], inner=[16])
    write_zarr_local(str(tmp_path / "s_plain"), {"v": a * 2}, zarr_format=3)
    df = read_zarr_dir(spark, parent, columns=["v"])
    got = {(r["store"], r["row_index"]): r["v"] for r in df.collect()}
    assert len(got) == 200
    assert got[("s_shard", 10)] == 10 and got[("s_plain", 10)] == 20


def test_writer_sharded_roundtrip_and_guards(spark, tmp_path):
    """write_zarr_local(shard_shape=...) -> read_zarr round trip (2-D +
    rank-mixed 1-D sharing the axis-0 shard extent), plus the two
    writer guards: sharding is v3-only, and shards must be chunk
    multiples."""
    import numpy as np
    import pytest

    from deepicedrain_spark.sources.zarr import read_zarr, write_zarr_local

    h = (np.arange(300, dtype="f4")[:, None] * 0.25 + np.arange(9)[None, :]).astype(
        "f4"
    )
    rp = np.arange(300, dtype="i8")
    store = str(tmp_path / "s")
    write_zarr_local(
        store, {"ref_pt": rp, "h_corr": h}, zarr_format=3,
        chunk_shape=(64, 2), shard_shape=(128, 4),
    )
    rows = read_zarr(spark, store, columns=["ref_pt", "h_corr"]).orderBy(
        "row_index"
    ).collect()
    assert len(rows) == 300
    for i, r in enumerate(rows):
        assert r["ref_pt"] == i
        assert r["h_corr"] == [float(np.float32(i * 0.25 + j)) for j in range(9)]
    with pytest.raises(ValueError, match="requires zarr_format=3"):
        write_zarr_local(
            str(tmp_path / "b1"), {"v": rp}, zarr_format=2,
            chunk_shape=(64,), shard_shape=(128,),
        )
    with pytest.raises(ValueError, match="multiple of"):
        write_zarr_local(
            str(tmp_path / "b2"), {"v": rp}, zarr_format=3,
            chunk_shape=(48,), shard_shape=(128,),
        )


def test_invalid_shard_args_leave_no_staging_residue(tmp_path):
    """Every write_zarr_local guard fires BEFORE any disk mutation — an
    invalid shard_shape call must not leave a .staging.<pid> dir
    behind (round-10 review)."""
    import os

    import numpy as np
    import pytest

    from deepicedrain_spark.sources.zarr import write_zarr_local

    a = np.arange(100, dtype="i8")
    with pytest.raises(ValueError, match="requires zarr_format=3"):
        write_zarr_local(str(tmp_path / "s1"), {"v": a}, zarr_format=2,
                         chunk_shape=(64,), shard_shape=(128,))
    with pytest.raises(ValueError, match="multiple of"):
        write_zarr_local(str(tmp_path / "s2"), {"v": a}, zarr_format=3,
                         chunk_shape=(48,), shard_shape=(128,))
    assert os.listdir(tmp_path) == []


def test_v3_consolidated_metadata_is_the_read_path(spark, tmp_path):
    """The reader must take array metadata from the root's
    consolidated_metadata when present (one driver open per store, the
    1387-store metadata-loop fix): a consolidated store still reads
    after its per-array zarr.json files are DELETED, and a store
    without consolidation (the spec-byte sharded helper) falls back to
    per-array opens (covered by the sharded tests above)."""
    import os

    import numpy as np

    from deepicedrain_spark.sources.zarr import read_zarr, write_zarr_local

    store = str(tmp_path / "cons")
    write_zarr_local(
        store,
        {"k": np.arange(100, dtype="i8"), "v": (np.arange(100) * 0.5).astype("f8")},
        zarr_format=3,
        chunk_rows=32,
    )
    for c in ("k", "v"):
        os.remove(os.path.join(store, c, "zarr.json"))
    rows = read_zarr(spark, store).orderBy("k").collect()
    assert len(rows) == 100 and rows[7]["k"] == 7 and rows[7]["v"] == 3.5


def test_sharded_store_crosscheck_against_zarr_python(spark, tmp_path):
    """When zarr-python 3 is available: (a) a sharded store written by
    OUR writer opens under zarr-python with identical values, and (b) a
    sharded store written by zarr-python reads back through OUR scan.
    Env-gated like the plain cross-check above — flips on without code
    change when the env ships zarr>=3."""
    zarr = pytest.importorskip("zarr")
    if int(getattr(zarr, "__version__", "0").split(".")[0]) < 3:
        pytest.skip("sharding needs zarr-python 3")
    import numpy as np

    from deepicedrain_spark.sources.zarr import read_zarr, write_zarr_local

    # ours -> zarr-python
    h = (np.arange(300, dtype="f4")[:, None] * 0.25 + np.arange(9)[None, :]).astype("f4")
    ours = str(tmp_path / "ours")
    write_zarr_local(
        ours, {"ref_pt": np.arange(300, dtype="i8"), "h_corr": h},
        zarr_format=3, chunk_shape=(64, 2), shard_shape=(128, 4),
    )
    g = zarr.open_group(ours, mode="r")
    assert np.array_equal(np.asarray(g["h_corr"]), h)
    assert np.array_equal(np.asarray(g["ref_pt"]), np.arange(300))

    # zarr-python -> ours
    theirs = str(tmp_path / "theirs")
    root = zarr.open_group(theirs, mode="w")
    root.create_array(
        "v", shape=(500,), chunks=(32,), shards=(128,), dtype="int64",
    )
    root["v"][:] = np.arange(500, dtype="i8") * 3
    back = read_zarr(spark, theirs, columns=["v"]).orderBy("row_index").collect()
    assert [r["v"] for r in back] == [i * 3 for i in range(500)]


def test_read_zarr_unconsolidated_v2(spark, tmp_path):
    """v2 store WITHOUT .zmetadata (zarr-python's default: nobody
    called consolidate_metadata) reads via the per-array .zarray walk;
    single-store read_zarr and mixed-parent read_zarr_dir both work,
    and an empty directory still errors clearly."""
    import pytest

    from deepicedrain_spark.sources.zarr import read_zarr, read_zarr_dir

    parent = str(tmp_path / "uncons")
    os.makedirs(parent)
    df = spark.range(0, 40).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
    write_zarr(df, os.path.join(parent, "s0"), chunk_rows=16)
    os.remove(os.path.join(parent, "s0", ".zmetadata"))
    back = read_zarr(spark, os.path.join(parent, "s0"))
    assert back.count() == 40
    assert back.where(F.col("k") == 7).collect()[0]["v"] == 14.0
    # mixed parent: consolidated sibling + un-consolidated one
    write_zarr(df.withColumn("k", F.col("k") + 100), os.path.join(parent, "s1"), chunk_rows=16)
    both = read_zarr_dir(spark, parent)
    assert both.count() == 80
    assert {r["store"] for r in both.select("store").distinct().collect()} == {"s0", "s1"}
    # not-a-store errors with the full diagnosis
    os.makedirs(os.path.join(str(tmp_path), "empty"))
    with pytest.raises(ValueError, match="un-consolidated"):
        read_zarr(spark, os.path.join(str(tmp_path), "empty"))
