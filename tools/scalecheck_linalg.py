"""Scale probe for the round-10 linear-algebra operators (SCALE.md
evidence, not a linearity-gated BENCH_SCALE entry — exact all-pairs
k-NN is quadratic in n BY DEFINITION; what this probe certifies is the
CONSTANT: the blocked-GEMM path's cosines/s against the pure-Catalyst
expression brute force, and the covariance pass's row throughput with
its constant-size shuffle).

Usage: python tools/scalecheck_linalg.py [n_vecs_thousands ...]
       (default: 10 20 — i.e. 10k and 20k vectors, 64-dim)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deepicedrain_spark.session import get_spark
from deepicedrain_spark.operators.linalg import covariance_long
from deepicedrain_spark.operators.similarity import cosine_topk, knn_graph_blocked


def synth_vectors(spark, n: int):
    """64-dim float vectors — the shared generator from
    scalecheck_queries, so linalg/gate/query probes measure the same
    distribution."""
    from scalecheck_queries import embedding_exprs

    _, emb = embedding_exprs()
    return spark.range(n).select(F.col("id").alias("vec_id"), emb.alias("embedding"))


def main() -> None:
    sizes = [int(a) * 1000 for a in sys.argv[1:]] or [10_000, 20_000]
    spark = get_spark(app_name="scalecheck_linalg")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"metric": "linalg_scale", "dims": 64, "points": []}
    for n in sizes:
        vecs = synth_vectors(spark, n)
        vecs.write.mode("overwrite").parquet(f"/tmp/sg_linalg_{n}.parquet")
        df = spark.read.parquet(f"/tmp/sg_linalg_{n}.parquet")

        t0 = time.time()
        rows = knn_graph_blocked(df, k=3, block_rows=2048).count()
        t_gemm = time.time() - t0

        # Catalyst-expression brute force on the same data: only run at
        # sizes where it finishes in reasonable wall (it is the slow
        # baseline this probe exists to beat)
        t_expr = None
        if n <= 10_000:
            t0 = time.time()
            cosine_topk(df, df, k=3).count()
            t_expr = time.time() - t0

        t0 = time.time()
        cov_rows = covariance_long(df, dims=64).count()
        t_cov = time.time() - t0

        pairs = n * (n - 1)
        point = {
            "n_vecs": n,
            "knn_rows": rows,
            "gemm_knn_sec": round(t_gemm, 1),
            "gemm_cosines_per_sec": round(pairs / t_gemm),
            "expr_bruteforce_sec": round(t_expr, 1) if t_expr else None,
            "gemm_speedup": round(t_expr / t_gemm, 1) if t_expr else None,
            "covariance_sec": round(t_cov, 1),
            "covariance_rows_out": cov_rows,
        }
        out["points"].append(point)
        print(json.dumps(point))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
