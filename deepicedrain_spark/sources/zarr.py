"""Zarr v2 columnar source/sink — pure numpy + stdlib, no zarr lib
(SURVEY S3/S4: the reference's canonical store is per-track Zarr;
``ds.to_zarr(store, mode='w', consolidated=True)`` at
/root/reference/atl06_to_atl11.py:299-303, multi-store scan at
/root/reference/atlxi_dhdt.py:73-82).

Layout written (readable by the real zarr-python):

    path/.zgroup                 {"zarr_format": 2}
    path/.zmetadata              consolidated metadata
    path/<col>/.zarray           dtype/shape/chunks/compressor(zlib)
    path/<col>/<i>               chunk i = rows [i*chunk, (i+1)*chunk)

Both directions are distributed and chunk-parallel:

- **write**: per-partition counts → driver cumsum → contiguous global
  row index per row (the zipWithIndex pattern: one cheap count pass,
  no single-task bottleneck) → one shuffle keyed on chunk id →
  each task writes its chunk files. Chunks are uniform by construction
  (last one ragged), as the v2 spec requires.
- **read**: chunk index enumerated from .zarray driver-side; a
  mapInPandas over the (col-independent) chunk ids decodes all column
  chunks for that stripe into Arrow batches. At 100 TB each chunk is
  an independent task — same parallelism story as parquet row groups.

Supported dtypes: little-endian ints/floats/bool (the reference's
data model §1.3); strings are out of scope (Zarr object dtypes need
msgpack codecs — use parquet for string-bearing tables).
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_SPARK_TO_NP = {
    "bigint": "<i8",
    "int": "<i4",
    "smallint": "<i2",
    "tinyint": "<i1",
    "double": "<f8",
    "float": "<f4",
    "boolean": "|b1",
}


def _zarray_meta(n_rows: int, chunk_rows: int, np_dtype: str) -> dict:
    return {
        "zarr_format": 2,
        "shape": [n_rows],
        "chunks": [chunk_rows],
        "dtype": np_dtype,
        "compressor": {"id": "zlib", "level": 1},
        "fill_value": None,
        "order": "C",
        "filters": None,
    }


def write_zarr(df: DataFrame, path: str, chunk_rows: int = 65536) -> None:
    """Distributed Zarr v2 sink: one array per column, zlib chunks.

    Overwrite semantics: a pre-existing ``path`` is deleted first, so
    stale chunk files from an earlier write (different schema or
    chunk_rows) can never sit alongside new metadata.

    NULLs are rejected (detected during the count pass, per column):
    Zarr numeric arrays have no null representation, so fill or drop
    before writing."""
    import shutil

    cols = df.columns
    dtypes = dict(df.dtypes)
    np_dtypes = {}
    for c in cols:
        if dtypes[c] not in _SPARK_TO_NP:
            raise TypeError(f"write_zarr: unsupported column type {c}:{dtypes[c]}")
        np_dtypes[c] = _SPARK_TO_NP[dtypes[c]]

    # contiguous global row index without a single-task window:
    # count rows per partition, cumsum the (tiny) counts driver-side,
    # then re-walk partitions adding each one's starting offset.
    # localCheckpoint pins ONE materialization: the count pass and the
    # index pass would otherwise be two independent jobs over a
    # possibly nondeterministic upstream plan (shuffle order, AQE
    # coalesce, sample), silently corrupting the global index.
    rdd = df.rdd
    rdd.localCheckpoint()  # in-place (returns None), materialized by the count job
    n_cols = len(cols)

    def count_partition(i, it):
        n = 0
        nulls = [0] * n_cols
        for row in it:
            n += 1
            for j in range(n_cols):
                if row[j] is None:
                    nulls[j] += 1
        return [(i, n, nulls)]

    counts = rdd.mapPartitionsWithIndex(count_partition).collect()
    null_totals = [sum(c[2][j] for c in counts) for j in range(n_cols)]
    bad = {cols[j]: null_totals[j] for j in range(n_cols) if null_totals[j]}
    if bad:
        raise ValueError(
            f"write_zarr: NULL values in column(s) {bad}; Zarr numeric arrays "
            "have no null representation — fill (na.fill) or drop (na.drop) first"
        )
    offsets = {}
    acc = 0
    for i, n, _ in sorted(counts):
        offsets[i] = acc
        acc += n
    n_rows = acc
    if os.path.exists(path):
        shutil.rmtree(path)
    spark = df.sparkSession
    b_offsets = spark.sparkContext.broadcast(offsets)

    def index_partition(pid, it):
        base = b_offsets.value[pid]
        for j, row in enumerate(it):
            yield (base + j, tuple(row))

    indexed = rdd.mapPartitionsWithIndex(index_partition)

    os.makedirs(path, exist_ok=True)
    for c in cols:
        os.makedirs(os.path.join(path, c), exist_ok=True)
    meta = {"metadata": {".zgroup": {"zarr_format": 2}}, "zarr_format": 1}
    for c in cols:
        meta["metadata"][f"{c}/.zarray"] = _zarray_meta(
            n_rows, chunk_rows, np_dtypes[c]
        )
        with open(os.path.join(path, c, ".zarray"), "w") as f:
            json.dump(meta["metadata"][f"{c}/.zarray"], f)
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    with open(os.path.join(path, ".zmetadata"), "w") as f:
        json.dump(meta, f)

    # one shuffle keyed on chunk id; each reducer materializes full,
    # uniform chunks and writes them — chunk-parallel, order-exact
    def write_chunk(kv):
        cid, rows = kv
        rows = sorted(rows)  # (global_idx, values) within the chunk
        expected = min(chunk_rows, n_rows - cid * chunk_rows)
        if len(rows) != expected:
            raise ValueError(
                f"write_zarr: chunk {cid} materialized {len(rows)} rows, "
                f"expected {expected} — upstream recomputation diverged"
            )
        arrays = {
            c: np.empty(len(rows), dtype=np_dtypes[c]) for c in cols
        }
        for k, (_, vals) in enumerate(rows):
            for c, v in zip(cols, vals):
                arrays[c][k] = v
        for c in cols:
            payload = zlib.compress(arrays[c].tobytes(order="C"), 1)
            with open(os.path.join(path, c, str(cid)), "wb") as f:
                f.write(payload)
        return cid

    (
        indexed.map(lambda t: (t[0] // chunk_rows, t))
        .groupByKey(numPartitions=max(1, (n_rows + chunk_rows - 1) // chunk_rows))
        .map(write_chunk)
        .count()
    )
    rdd.unpersist()


def read_zarr(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Distributed Zarr v2 scan: one task per chunk stripe, all columns
    of a stripe decoded together; adds ``row_index`` (the global array
    position — Zarr's implicit key, which parquet has no analogue for)."""
    with open(os.path.join(path, ".zmetadata")) as f:
        consolidated = json.load(f)["metadata"]
    arrays = {
        k.split("/")[0]: v for k, v in consolidated.items() if k.endswith("/.zarray")
    }
    if columns:
        arrays = {c: arrays[c] for c in columns}
    cols = sorted(arrays)
    first = arrays[cols[0]]
    n_rows, chunk_rows = first["shape"][0], first["chunks"][0]
    for c in cols:
        if arrays[c]["shape"][0] != n_rows or arrays[c]["chunks"][0] != chunk_rows:
            raise ValueError(f"read_zarr: ragged array {c}")
    n_chunks = (n_rows + chunk_rows - 1) // chunk_rows
    _REV = {"<i8": "long", "<i4": "int", "<i2": "short", "<i1": "byte",
            "<f8": "double", "<f4": "float", "|b1": "boolean"}
    schema = "row_index long, " + ", ".join(
        f"`{c}` {_REV[arrays[c]['dtype']]}" for c in cols
    )
    chunks_df = spark.range(n_chunks).withColumnRenamed("id", "cid")
    dtypes = {c: arrays[c]["dtype"] for c in cols}
    compressors = {c: arrays[c]["compressor"] for c in cols}

    def decode(batches):
        for pdf in batches:
            for cid in pdf["cid"]:
                cid = int(cid)
                start = cid * chunk_rows
                length = min(chunk_rows, n_rows - start)
                out = {"row_index": np.arange(start, start + length, dtype=np.int64)}
                for c in cols:
                    with open(os.path.join(path, c, str(cid)), "rb") as f:
                        raw = f.read()
                    comp = compressors[c]
                    if comp is not None and comp.get("id") == "zlib":
                        raw = zlib.decompress(raw)
                    elif comp is not None:
                        raise ValueError(f"unsupported compressor {comp}")
                    out[c] = np.frombuffer(raw, dtype=dtypes[c])[:length]
                yield pd.DataFrame(out)

    return chunks_df.mapInPandas(decode, schema=schema)
