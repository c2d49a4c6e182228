"""Scale gate for semantic_dedup (SemDeDup cluster-then-prune).

The prune's pair work is Σ_c n_c² — quadratic in CLUSTER OCCUPANCY,
linear in corpus size when k grows with N (the SemDeDup deployment
contract: the paper runs 110k clusters for LAION; you size k so
n_c ≈ const). This probe measures exactly that contract: synthetic
64-dim embeddings in well-separated latent clusters with 1-in-50
planted near-twins, semantic_dedup timed at increasing N with
k = N / OCCUPANCY — the wall ratio between scale points should track
the DATA ratio (≈linear), not its square.

A fixed-k run at two scales would instead measure the documented
failure mode (pair work ×(scale²)); pass --fixed-k to see it.

Usage: python tools/scalecheck_semdedup.py [mult1 mult2 ...] [--fixed-k]
  default mults: 10 40  (sf1, sf4 — 20k / 80k vectors)
Prints one JSON line; human summary goes to SCALE.md by hand.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deepicedrain_spark.session import get_spark

D = 64
OCCUPANCY = 800  # target mean cluster size; k = max(8, N // OCCUPANCY)
LATENT = 32      # latent directions the synthetic vectors scatter around


def stage(spark, n_vecs: int, out_dir: str) -> None:
    """n_vecs unit-ish vectors around LATENT well-separated anchors
    (deterministic hash-derived), plus a near-twin for every 50th id
    (id + 10_000_000, nudged ±0.01 on a 3-periodic mask) and a
    deterministic quality column."""
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    rows = spark.range(n_vecs)
    anchor = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(LATENT))
    # component j: anchor direction (one-hot-ish ramp) + small hash noise
    # per-dim noise ±0.1: within-anchor cosine lands ~0.74 (well below
    # the 0.98 prune threshold — anchor-mates are NEIGHBORS, not dups),
    # while the ±0.01-nudged planted twin stays ~0.999 — so the prune
    # drops exactly the planted 1-in-50 and the pair scan still pays
    # full same-cluster cost (the thing the gate measures)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(D - 1)),
        lambda j: (
            F.when(F.pmod(anchor + j, F.lit(D)) < 4, F.lit(1.0)).otherwise(F.lit(0.0))
            + (F.pmod(F.xxhash64("id", j, F.lit(7)), F.lit(1000)) - 500.0) / 5_000.0
        ),
    )
    base = rows.select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    twins = (
        rows.where(F.pmod("id", F.lit(50)) == 0)
        .select(
            (F.col("id") + F.lit(10_000_000)).alias("vec_id"),
            F.transform(
                vec, lambda x, i: x + 0.01 * ((i + 1) % 3 - 1)
            ).alias("embedding"),
        )
    )
    base.unionByName(twins).withColumn(
        "q", F.pmod("vec_id", F.lit(7)).cast("double")
    ).coalesce(16).write.mode("overwrite").parquet(
        os.path.join(out_dir, "vectors.parquet")
    )


def run_point(spark, mult: int, fixed_k: int | None) -> dict:
    from deepicedrain_spark.operators.dedup import semantic_dedup

    n = 2_000 * mult
    out_dir = f"/tmp/spark_graft_semdedup_x{mult}"
    t0 = time.time()
    stage(spark, n, out_dir)
    t_stage = time.time() - t0
    df = spark.read.parquet(os.path.join(out_dir, "vectors.parquet"))
    k = fixed_k if fixed_k else max(8, n // OCCUPANCY)
    t0 = time.time()
    out = semantic_dedup(
        df, "vec_id", "embedding", quality_col="q", k=k, iters=2,
        threshold=0.98, cache_key=None,
    )
    kept = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
    ).collect()[0]
    wall = time.time() - t0
    return {
        "mult": mult, "n_vecs": n + n // 50, "k": k,
        "stage_sec": round(t_stage, 1), "sec": round(wall, 1),
        "rows": kept["n"], "kept": kept["kept"],
        "pruned": kept["n"] - kept["kept"],
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--fixed-k"]
    fixed = 8 if "--fixed-k" in sys.argv else None
    mults = [int(a) for a in args] or [10, 40]
    spark = get_spark(app_name="scalecheck_semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    points = [run_point(spark, m, fixed) for m in mults]
    ratios = [
        round(points[i]["sec"] / max(points[i - 1]["sec"], 0.1), 2)
        for i in range(1, len(points))
    ]
    print(json.dumps(
        {"metric": "semdedup_scale", "fixed_k": bool(fixed),
         "points": points, "wall_ratios": ratios},
        separators=(",", ":"),
    ))


if __name__ == "__main__":
    main()
