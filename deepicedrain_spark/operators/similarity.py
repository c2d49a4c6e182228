"""Similarity search over embedding columns (beyond-reference
extension): brute-force cosine top-k baseline and an LSH-bucketed
(random-hyperplane) variant as the scale path.

Everything stays in Catalyst (zip_with / aggregate HOFs — JVM,
codegen); hyperplanes are derived from md5 so the bucketing is
deterministic and engine-reproducible. At cluster scale:
- top-k: broadcast the (small) query set against the partitioned
  corpus; Spark ≥3.5 rewrites rank-filter windows into per-partition
  WindowGroupLimit (local top-k before the shuffle), so the shuffle
  carries O(queries × k × partitions), not the corpus.
- LSH: candidates come from an equi-join on the signature bucket —
  linear shuffle; raise `planes` to narrow buckets at higher N.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: str, b: str) -> Column:
    """Σ aᵢ·bᵢ in double (left-to-right fold — reproducible)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def norm2_expr(a: str) -> Column:
    return F.expr(
        f"aggregate(transform({a}, x -> cast(x as double) * cast(x as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def cosine_expr(a: str, b: str) -> Column:
    return dot_expr(a, b) / F.sqrt(norm2_expr(a) * norm2_expr(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force exact top-k neighbors per query (self-matches
    excluded). Output: (query_id, cand_id, rank, cos)."""
    # norms fold ONCE per row before the join (inside the join output
    # each query norm would re-fold per candidate and vice versa — a 3x
    # O(d) overhead per scored pair); sqrt(qn*cn) is the identical IEEE
    # value, so results are bit-unchanged
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .withColumn("qn", norm2_expr("qv"))
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv")
    ).withColumn("cn", norm2_expr("cv"))
    scored = (
        c.join(q, F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "cos",
            F.round(dot_expr("qv", "cv") / F.sqrt(F.col("qn") * F.col("cn")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cos")
    )


def _plane_weight(p: int, d: int) -> int:
    """(md5-derived int mod 2001) − 1000 — a fixed pseudo-random
    ±integer grid any engine can rebuild from the same recipe."""
    import hashlib

    h = hashlib.md5(f"{p}_{d}".encode()).hexdigest()
    return int(h[:15], 16) % 2001 - 1000


def hyperplane_signature(vec_col: str, planes: int = 8, dims: int = 64) -> Column:
    """Deterministic random-hyperplane LSH signature (sign bits).

    The weight grid is md5-derived but CONSTANT per (plane, dim), so it
    is materialized driver-side and embedded as literal arrays — the
    per-row work is just ``planes`` dot products in codegen, with no
    runtime hashing (512 md5 calls/row otherwise)."""
    bits = []
    first_terms = None
    for p in range(planes):
        w = F.lit([float(_plane_weight(p, d)) for d in range(dims)])
        terms = F.aggregate(
            F.zip_with(F.col(vec_col), w, lambda x, wt: x.cast("double") * wt),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        if first_terms is None:
            first_terms = terms
        bits.append(F.when(terms > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    # guard: a vector whose length differs from `dims` (zip_with pads
    # with NULL -> every plane's dot is NULL -> signature 0 for EVERY
    # row, silently collapsing the LSH into one bucket) or that carries
    # NULL elements must fail loudly, not mis-bucket
    valid = (F.size(F.col(vec_col)) == F.lit(dims)) & first_terms.isNotNull()
    return F.when(valid, sig.cast("int")).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"hyperplane_signature: expected a null-free {dims}-dim "
                    "vector, got length "
                ),
                F.size(F.col(vec_col)).cast("string"),
            )
        ).cast("int")
    )


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's hyperplane
    bucket are scored (recall < 1 by design; raise planes→buckets for
    precision/cost trade)."""
    sig = hyperplane_signature(vec_col, planes, dims)
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), sig.alias("qsig")
        ).withColumn("qn", norm2_expr("qv"))
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"), sig.alias("csig")
    ).withColumn("cn", norm2_expr("cv"))
    scored = (
        c.join(q, (F.col("qsig") == F.col("csig")) & (F.col("query_id") != F.col("cand_id")))
        .withColumn(
            "cos",
            F.round(dot_expr("qv", "cv") / F.sqrt(F.col("qn") * F.col("cn")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cos")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: corpus vectors are assigned to their nearest
    centroid (coarse quantizer); a query scans only its ``nprobe``
    nearest centroid cells. ``centroids``: (centroid_id, embedding) —
    typically k-means output; any fixed codebook works.

    Shuffle profile: corpus assignment is a broadcast join + argmin;
    the search is an equi-join on centroid_id — linear, no O(N·Q)."""
    cent = F.broadcast(
        centroids.select(F.col("centroid_id"), F.col(vec_col).alias("centv"))
    )

    def assign(df: DataFrame, idc: str, vc: str, n: int) -> DataFrame:
        # round(9) before ranking: the argmin must not depend on the
        # last-ulp of a float sum (engines fold in different orders)
        scored = df.join(cent).withColumn("_d", F.round(cosine_expr(vc, "centv"), 9))
        w = Window.partitionBy(idc).orderBy(F.col("_d").desc(), F.col("centroid_id"))
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= n)
            .drop("_d", "_r", "centv")
        )

    c = assign(
        corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv")),
        "cand_id",
        "cv",
        1,
    )
    q = assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "query_id",
        "qv",
        nprobe,
    )
    scored = (
        c.withColumn("cn", norm2_expr("cv"))
        .join(q.withColumn("qn", norm2_expr("qv")), "centroid_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "cos",
            F.round(dot_expr("qv", "cv") / F.sqrt(F.col("qn") * F.col("cn")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cos")
    )
