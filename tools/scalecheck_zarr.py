"""Multi-store Zarr scan probe at the reference's REAL store count.

The reference ingests 1387 per-track ATL11 Zarr stores in one
open_mfdataset call (/root/reference/atlxi_dhdt.py:73-82).
read_zarr_dir was unit-tested at 3 shards; this probe builds the full
1387-store layout (file-per-track via write_zarr_partitioned, written
on executors) and measures, separately:

  1. the sink fan-out (one applyInPandas job, 1387 store writes),
  2. the driver-side metadata loop (open 1387 .zmetadata files and
     build the (store x chunk) task table — the only O(stores) driver
     work),
  3. the distributed scan itself (single mapInPandas over the task
     table, capped at 512 partitions).

Usage: python tools/scalecheck_zarr.py [n_stores] [rows_per_store]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N_STORES = int(sys.argv[1]) if len(sys.argv) > 1 else 1387
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 2000


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from deepicedrain_spark.sources.zarr import read_zarr_dir, write_zarr_partitioned

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    parent = tempfile.mkdtemp(prefix="zarr1387_")
    try:
        n = N_STORES * ROWS
        df = (
            spark.range(n)
            .select(
                (F.col("id") % N_STORES).alias("track"),
                F.col("id").alias("ref_pt"),
                (F.col("id") % 997 * 0.5).alias("h_corr"),
            )
        )
        t0 = time.time()
        write_zarr_partitioned(df, parent, key_col="track", chunk_rows=4096).count()
        t_write = time.time() - t0

        # metadata loop alone: build the plan, don't run it
        t0 = time.time()
        scan = read_zarr_dir(spark, parent)
        t_meta = time.time() - t0
        n_parts = scan.rdd.getNumPartitions()

        t0 = time.time()
        got = scan.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("store").alias("n_stores"),
            F.sum("ref_pt").alias("s"),
        ).collect()[0]
        t_scan = time.time() - t0
        assert got["n"] == n, (got["n"], n)
        assert got["n_stores"] == N_STORES
        assert got["s"] == n * (n - 1) // 2
        print(
            f"stores={N_STORES} rows/store={ROWS} | write(fan-out) {t_write:.1f}s | "
            f"driver metadata loop {t_meta:.2f}s | scan {t_scan:.1f}s "
            f"({n / max(t_scan, 1e-9) / 1e6:.1f} M rows/s) | "
            f"scan partitions {n_parts} (cap 512)"
        )
    finally:
        shutil.rmtree(parent, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
