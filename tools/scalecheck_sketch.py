"""Scale experiment: sketch operators + k-means at fact-table scale.

Synthesizes N·10⁶ rows with spark.range (keys/vectors from pure
Catalyst expressions — no Python in the data path) and times the
production sketch plans end-to-end:

  - hll: HyperLogLog distinct over a ~50%-distinct key column
    (registers = one O(2^b) groupBy; the estimate is checked against
    the known true cardinality)
  - bloom: filter build over half the corpus + membership probe of
    the other half (bit set broadcast)
  - cms: count-min counter build over a skewed token column +
    heavy-hitter estimation
  - kmeans_iter: ONE Lloyd iteration (map-only literal-centroid
    assignment + O(k*d) mean update) over 64-dim synthetic vectors

Usage: python tools/scalecheck_sketch.py [n_rows_millions]
Prints one JSON line; human summary goes to SCALE.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deepicedrain_spark.operators import sketches as sk
from deepicedrain_spark.operators.kmeans import assign_to_centroids
from deepicedrain_spark.session import get_spark

N = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 10_000_000


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 1)


def main() -> None:
    spark = get_spark("scalecheck_sketch")
    spark.sparkContext.setLogLevel("ERROR")
    res: dict = {"n_rows": N}

    # ~50% distinct keys: ids folded into N/2 buckets
    keys = spark.range(N).select((F.col("id") % (N // 2)).alias("k"))

    def run_hll():
        return sk.hll_estimate(keys, "k", b=12).collect()[0]

    est, res["hll_sec"] = timed(run_hll)
    res["hll_estimate"] = int(est["estimate"])
    res["hll_true"] = N // 2
    res["hll_rel_err"] = round(abs(est["estimate"] - N // 2) / (N // 2), 4)

    # Bloom: build over even ids' key strings, probe odd ids.
    # Size the filter ~13 bits/key (next power of two) — the classic
    # ~1% fp operating point for k=4; a production build would pack
    # the positions into an m/8-byte bitmap for broadcast, the row
    # form here is the oracle-friendly equivalent.
    m_bits = 1 << max(16, (N // 2 * 13).bit_length())
    res["bloom_m_bits"] = m_bits
    half_a = spark.range(0, N, 2).select(F.col("id").cast("string").alias("s"))
    half_b = spark.range(1, N, 2).select(
        F.col("id").alias("rid"), F.col("id").cast("string").alias("s")
    )

    def run_bloom():
        bits = sk.bloom_bits(half_a, F.col("s"), k=4, m=m_bits)
        probed = sk.bloom_probe(half_b, bits, F.col("s"), "rid", k=4, m=m_bits)
        return probed.agg(F.sum(F.col("maybe_member").cast("long"))).collect()[0][0]

    fp, res["bloom_sec"] = timed(run_bloom)
    # odd ids are never inserted → every hit is a false positive
    res["bloom_fp"] = int(fp or 0)
    res["bloom_fp_rate"] = round((fp or 0) / (N / 2), 6)

    # CMS over a skewed token stream (token t_j appears ~N/2^(j+1) times)
    toks = spark.range(N).select(
        F.concat(F.lit("t"), F.floor(F.log2(F.col("id") + 1)).cast("long").cast("string")).alias("t")
    )

    def run_cms():
        sketch = sk.cms_table(toks, "t", d=3, w=1 << 12)
        cand = toks.groupBy("t").agg(F.count(F.lit(1)).alias("exact_cnt"))
        est_df = sk.cms_estimate(cand.select("t"), sketch, "t", d=3, w=1 << 12)
        rows = est_df.join(cand, "t").orderBy(F.desc("est"), "t").limit(5).collect()
        return [(r["t"], int(r["est"]), int(r["exact_cnt"])) for r in rows]

    top, res["cms_sec"] = timed(run_cms)
    res["cms_top"] = top

    # One Lloyd iteration over 64-dim vectors (deterministic synth)
    d, k = 64, 8
    vecs = spark.range(N).select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda i: F.sin(F.col("id") * (i + 1)),
        ).alias("v"),
    )
    cents = [[float(((c + 1) * (i + 1)) % 7 - 3) for i in range(d)] for c in range(k)]

    def run_kmeans_iter():
        from deepicedrain_spark.operators.kmeans import updated_centroids

        assigned = assign_to_centroids(vecs, "v", cents)
        return len(updated_centroids(assigned, "v", cents))

    nm, res["kmeans_iter_sec"] = timed(run_kmeans_iter)
    res["kmeans_clusters"] = int(nm)
    res["rows_per_sec_kmeans"] = int(N / res["kmeans_iter_sec"])

    print(json.dumps(res, separators=(",", ":")))


if __name__ == "__main__":
    main()
