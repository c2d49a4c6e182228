"""Unit tests for the distributed linear-algebra operators: the
blocked-GEMM exact k-NN graph and single-pass covariance / PCA."""

import numpy as np
import pytest

from deepicedrain_spark.io import load_table
from deepicedrain_spark.operators.linalg import (
    covariance_long,
    covariance_matrix,
    pca_components,
    pca_project,
    project_expr,
)
from deepicedrain_spark.operators.similarity import cosine_topk, knn_graph_blocked

from conftest import SF_SMALL


def _embeddings_np(spark, sf_dir):
    pdf = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .toPandas()
    )
    return pdf["vec_id"].to_numpy(), np.vstack(pdf["embedding"].to_numpy()).astype(
        np.float64
    )


def test_knn_graph_matches_brute_force_any_blocking(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    expected = [
        tuple(r) for r in cosine_topk(emb, emb, k=3).orderBy("query_id", "rank").collect()
    ]
    # B = 1 (single GEMM), a mid grid, and more blocks than rows/k
    # would ever need — the result must be identical for every grid
    for n_blocks in (1, 5, 64):
        got = [
            tuple(r)
            for r in knn_graph_blocked(emb, k=3, n_blocks=n_blocks)
            .orderBy("query_id", "rank")
            .collect()
        ]
        assert got == expected, f"n_blocks={n_blocks}"


def test_knn_graph_k_larger_than_block(spark):
    emb = load_table(spark, SF_SMALL, "embeddings").filter("vec_id < 40")
    expected = [
        tuple(r) for r in cosine_topk(emb, emb, k=7).orderBy("query_id", "rank").collect()
    ]
    # blocks of ~5 rows << k=7: the local prune caps at the block size
    # and the global merge must still assemble the exact top-7
    got = [
        tuple(r)
        for r in knn_graph_blocked(emb, k=7, n_blocks=8)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert got == expected


def test_covariance_long_matches_numpy(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    _, x = _embeddings_np(spark, SF_SMALL)
    ref = np.cov(x, rowvar=False, bias=True)
    rows = covariance_long(emb, dims=64).collect()
    assert len(rows) == 64 * 65 // 2
    for r in rows:
        assert r["i"] <= r["j"]
        assert r["cov"] == pytest.approx(ref[r["i"], r["j"]], abs=5.1e-7)
        # -0.0 is normalized away (DuckDB/Spark round sign mismatch)
        assert not (r["cov"] == 0.0 and np.signbit(r["cov"]))


def test_covariance_matrix_and_pca_match_numpy(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    ids, x = _embeddings_np(spark, SF_SMALL)
    n, mean, cov = covariance_matrix(emb, dims=64)
    assert n == len(x)
    np.testing.assert_allclose(mean, x.mean(axis=0), atol=1e-12)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False, bias=True), atol=1e-12)

    comps, ev, mean2 = pca_components(emb, k=3)
    w, v = np.linalg.eigh(np.cov(x, rowvar=False, bias=True))
    order = np.argsort(w)[::-1][:3]
    ref = v[:, order].T.copy()
    for c in ref:
        p = np.argmax(np.abs(c))
        if c[p] < 0:
            c *= -1.0
    np.testing.assert_allclose(comps, ref, atol=1e-9)
    np.testing.assert_allclose(ev, w[order], atol=1e-12)

    proj = (
        pca_project(emb, comps, mean2)
        .select("vec_id", "pc0", "pc1", "pc2")
        .orderBy("vec_id")
        .toPandas()
    )
    ref_proj = (x - x.mean(axis=0)) @ ref.T
    np.testing.assert_allclose(
        proj[["pc0", "pc1", "pc2"]].to_numpy(), ref_proj, atol=1e-9
    )


def test_project_expr_uncentered(spark):
    df = spark.createDataFrame([(0, [1.0, 2.0, 3.0])], "id long, v array<double>")
    got = df.select(project_expr("v", [2.0, 0.5, -1.0]).alias("p")).collect()[0]["p"]
    assert got == pytest.approx(2.0 + 1.0 - 3.0)


def test_covariance_matrix_empty_raises(spark):
    emb = load_table(spark, SF_SMALL, "embeddings").filter("vec_id < 0")
    with pytest.raises(ValueError, match="empty"):
        covariance_matrix(emb, dims=64)


def test_moment_pass_rejects_wrong_dims(spark):
    emb = load_table(spark, SF_SMALL, "embeddings").limit(5)
    with pytest.raises(Exception) as ei:
        covariance_long(emb, dims=32).collect()
    assert "32" in str(ei.value)


def test_drift_per_dim_matches_numpy(spark):
    from pyspark.sql import functions as F

    from deepicedrain_spark.operators.linalg import drift_per_dim

    emb = load_table(spark, SF_SMALL, "embeddings").withColumn(
        "grp",
        F.when(F.col("label") % 2 == 0, F.lit("even")).otherwise(F.lit("odd")),
    )
    out = drift_per_dim(emb, "grp", "even", "odd").orderBy("i").toPandas()
    assert len(out) == 64

    pdf = emb.select("grp", "embedding").toPandas()
    x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    g = pdf["grp"].to_numpy()
    for name, grp in (("a", "even"), ("b", "odd")):
        np.testing.assert_allclose(
            out[f"mean_{name}"], x[g == grp].mean(axis=0), atol=5.1e-7
        )
        np.testing.assert_allclose(
            out[f"var_{name}"], x[g == grp].var(axis=0), atol=5.1e-7
        )
    smd_ref = (out["mean_a"] - out["mean_b"]) / np.sqrt(
        (out["var_a"] + out["var_b"]) / 2
    )
    np.testing.assert_allclose(out["smd"], np.round(smd_ref, 6), atol=1e-12)


def test_drift_missing_group_empty(spark):
    from pyspark.sql import functions as F

    from deepicedrain_spark.operators.linalg import drift_per_dim

    emb = load_table(spark, SF_SMALL, "embeddings").withColumn(
        "grp", F.lit("only")
    )
    assert drift_per_dim(emb, "grp", "only", "missing").count() == 0


def test_frechet_distance_properties(spark):
    from pyspark.sql import functions as F

    from deepicedrain_spark.operators.linalg import frechet_distance

    emb = load_table(spark, SF_SMALL, "embeddings").withColumn(
        "grp",
        F.when(F.col("label") % 2 == 0, F.lit("even")).otherwise(F.lit("odd")),
    )
    # identical slices → 0
    same = emb.withColumn("grp", F.when(F.col("vec_id") % 2 == 0, "a").otherwise("b"))
    mirrored = same.select(
        "vec_id", "embedding", F.lit("a").alias("grp")
    ).unionByName(
        same.select("vec_id", "embedding", F.lit("b").alias("grp"))
    )
    assert frechet_distance(mirrored, "grp", "a", "b") == pytest.approx(0.0, abs=1e-9)

    d = frechet_distance(emb, "grp", "even", "odd")
    assert d > 0
    # symmetric
    assert d == pytest.approx(frechet_distance(emb, "grp", "odd", "even"), rel=1e-9)

    # cross-check against a direct numpy computation
    pdf = emb.select("grp", "embedding").toPandas()
    x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    g = pdf["grp"].to_numpy()
    xa, xb = x[g == "even"], x[g == "odd"]
    ca = np.cov(xa, rowvar=False, bias=True)
    cb = np.cov(xb, rowvar=False, bias=True)

    def sqrtm(m):
        w, v = np.linalg.eigh((m + m.T) / 2)
        return (v * np.sqrt(np.clip(w, 0, None))) @ v.T

    s = sqrtm(ca)
    ref = (
        ((xa.mean(0) - xb.mean(0)) ** 2).sum()
        + np.trace(ca)
        + np.trace(cb)
        - 2 * np.trace(sqrtm(s @ cb @ s))
    )
    assert d == pytest.approx(ref, rel=1e-9)


def test_drift_zero_variance_dim_yields_null_smd(spark):
    from pyspark.sql import functions as F

    from deepicedrain_spark.operators.linalg import drift_per_dim

    # dim 0 is constant in BOTH groups -> rounded pooled variance 0;
    # smd must be NULL (like the DuckDB oracle's x/0.0), not an ANSI
    # DIVIDE_BY_ZERO crash
    rows = [
        (i, "a" if i % 2 == 0 else "b", [5.0, float(i % 7), float((i * 3) % 11)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, embedding array<double>")
    out = {r["i"]: r for r in drift_per_dim(df, "grp", "a", "b", dims=3).collect()}
    assert out[0]["var_a"] == 0.0 and out[0]["var_b"] == 0.0
    assert out[0]["smd"] is None
    assert out[1]["smd"] is not None and out[2]["smd"] is not None
