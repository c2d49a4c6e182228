"""Scale probe for the streaming LSH near-dup gate (SCALE.md
evidence): stage a synthetic corpus at N× the sf0.1 document count
(same generator as scalecheck_queries — hashed token streams, 1-in-50
planted near-dups), split it into K feed batches, run the gate, and
report per-batch wall, state footprint, and verdict counts.

The quantity that must hold at scale is the SHAPE, not the wall: each
batch's cost is map-side signature work over the batch plus one band
equi-join against state that grows with distinct content — so
per-batch wall should grow with BATCH size, not with how many batches
preceded it (state joins stay index-bound). A super-linear drift of
late-batch walls would flag the state join as the bottleneck.

Usage: python tools/scalecheck_gate.py [mult] [n_batches]
       (default: mult=4 → 20k docs, 4 batches)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from deepicedrain_spark.session import get_spark
from deepicedrain_spark.streaming.neardup import near_dup_gate, read_gate_result


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    spark = get_spark(app_name="scalecheck_gate")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    from scalecheck_queries import stage

    data_dir = f"/tmp/sg_gate_sfx{mult}"
    if not os.path.isdir(os.path.join(data_dir, "documents.parquet")):
        stage(spark, data_dir, mult)
    docs = spark.read.parquet(os.path.join(data_dir, "documents.parquet"))
    n_docs = docs.count()

    state = f"/tmp/sg_gate_state_{mult}"
    shutil.rmtree(state, ignore_errors=True)
    gate = near_dup_gate(spark, state, threshold=0.8)

    walls = []
    for b in range(n_batches):
        t0 = time.time()
        gate(docs.filter(F.col("doc_id") % n_batches == b), b)
        walls.append(round(time.time() - t0, 2))

    res = read_gate_result(spark, state)
    kept = res.filter("kept").count()
    total = res.count()
    state_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(state)
        for f in fs
    )
    print(
        json.dumps(
            {
                "metric": "gate_scale",
                "n_docs": n_docs,
                "n_batches": n_batches,
                "batch_walls_sec": walls,
                "kept": kept,
                "dropped": total - kept,
                "state_mb": round(state_bytes / 1e6, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
