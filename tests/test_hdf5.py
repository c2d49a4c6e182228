"""HDF5 source seam: the chunk planning and schema mapping are pure
and tested here; the h5py-dependent scan is exercised when the
environment ships h5py (skipped otherwise — the documented seam)."""

import pytest

from deepicedrain_spark.sources.hdf5 import (
    plan_chunks,
    read_hdf5,
    spark_schema_for,
)


def test_plan_chunks_covers_exactly():
    assert plan_chunks(10, 4) == [(0, 4), (4, 4), (8, 2)]
    assert plan_chunks(8, 4) == [(0, 4), (4, 4)]
    assert plan_chunks(0, 4) == []
    assert plan_chunks(3, 100) == [(0, 3)]
    with pytest.raises(ValueError):
        plan_chunks(10, 0)


def test_schema_mapping():
    s = spark_schema_for({"h_li": "float32", "segment_id": "int64", "q": "uint8"})
    assert s == "row_index long, `h_li` float, `segment_id` long, `q` int"
    with pytest.raises(TypeError):
        spark_schema_for({"s": "object"})


def test_hdf5_roundtrip_if_available(spark, tmp_path):
    try:
        import h5py
        import numpy as np
    except ImportError:
        pytest.skip("h5py not available (documented ingest seam)")
    p = str(tmp_path / "granule.h5")
    with h5py.File(p, "w") as f:
        g = f.create_group("gt1l/land_ice_segments")
        g.create_dataset("latitude", data=np.arange(100, dtype="f8"))
        g.create_dataset("h_li", data=np.arange(100, dtype="f4") * 0.5)
    df = read_hdf5(spark, p, "gt1l/land_ice_segments", ["latitude", "h_li"], chunk_rows=32)
    rows = sorted((r["row_index"], r["latitude"]) for r in df.collect())
    assert len(rows) == 100 and rows[99] == (99, 99.0)
