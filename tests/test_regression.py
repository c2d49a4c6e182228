"""Golden-value tests for the flagship per-group regression (SURVEY A2),
mirroring /root/reference/deepicedrain/tests/test_nanlinregress.py:31-42."""

import math

from pyspark.sql import Row

from deepicedrain_spark.operators.regression import grouped_linregress


def test_linregress_golden(spark):
    # reference micro-fixture: NaN pair masked out
    rows = [
        Row(g=1, x=100.0, y=20.0),
        Row(g=1, x=200.0, y=35.0),
        Row(g=1, x=None, y=None),
        Row(g=1, x=400.0, y=25.0),
        Row(g=1, x=500.0, y=30.0),
    ]
    df = spark.createDataFrame(rows)
    out = grouped_linregress(df, ["g"], "y", "x").collect()[0]
    assert out["n"] == 4
    assert math.isclose(out["slope"], 0.01, rel_tol=1e-9)
    assert math.isclose(out["intercept"], 24.5, rel_tol=1e-9)
    assert math.isclose(out["rvalue"], 0.28284271247461906, rel_tol=1e-9)
    assert math.isclose(out["stderr"], 0.023979157616563596, rel_tol=1e-9)


def test_linregress_perfect_fit(spark):
    rows = [Row(g=1, x=float(i), y=2.0 * i + 1.0) for i in range(5)]
    df = spark.createDataFrame(rows)
    out = grouped_linregress(df, ["g"], "y", "x").collect()[0]
    assert math.isclose(out["slope"], 2.0, rel_tol=1e-12)
    assert math.isclose(out["intercept"], 1.0, rel_tol=1e-12)
    assert math.isclose(out["r2"], 1.0, rel_tol=1e-12)


def test_betainc_against_t_tables():
    """Container-runnable p-value check (no scipy): two-sided t-test
    p-values against published t-distribution constants, via
    p = I_{df/(df+t²)}(df/2, 1/2)."""
    from deepicedrain_spark.operators.regression import betainc_regularized

    cases = [
        # (t, df, two-sided p) — standard t-table values
        (2.0, 10, 0.07338803),
        (1.0, 5, 0.36321747),
        (12.7062047362, 1, 0.05),  # df=1 97.5% quantile
        (4.3026527297, 2, 0.05),  # df=2 97.5% quantile
        (1.9599639845, 1e9, 0.05000000),  # ≈ normal limit
    ]
    for t, df, expected in cases:
        x = df / (df + t * t)
        p = float(betainc_regularized(df / 2.0, 0.5, x))
        assert math.isclose(p, expected, abs_tol=5e-7), (t, df, p, expected)


def test_pvalue_udf_golden(spark):
    """pvalue on the reference micro-fixture. For df = n-2 = 2 the
    t-CDF is elementary and the two-sided p collapses to 1 - |r| —
    an independent closed form the CF implementation must reproduce."""
    from pyspark.sql import functions as F

    from deepicedrain_spark.operators.regression import linregress_aggs, pvalue_udf

    rows = [
        Row(g=1, x=100.0, y=20.0),
        Row(g=1, x=200.0, y=35.0),
        Row(g=1, x=None, y=None),
        Row(g=1, x=400.0, y=25.0),
        Row(g=1, x=500.0, y=30.0),
    ]
    agg = spark.createDataFrame(rows).groupBy("g").agg(*linregress_aggs("y", "x"))
    out = agg.select(
        pvalue_udf()(F.col("r2"), F.col("n").cast("double")).alias("pvalue"),
        "rvalue",
    ).collect()[0]
    expected = 1.0 - abs(out["rvalue"])  # = 0.7171572875253809
    assert math.isclose(out["pvalue"], expected, rel_tol=1e-9)
    assert math.isclose(out["pvalue"], 0.7171572875253809, rel_tol=1e-9)


def test_pvalue_edge_cases(spark):
    """Perfect fit → p=0; n=2 (df=0) → NULL."""
    from pyspark.sql import functions as F

    from deepicedrain_spark.operators.regression import linregress_aggs, pvalue_udf

    rows = [Row(g=1, x=float(i), y=2.0 * i + 1.0) for i in range(5)] + [
        Row(g=2, x=0.0, y=0.0),
        Row(g=2, x=1.0, y=3.0),
    ]
    agg = spark.createDataFrame(rows).groupBy("g").agg(*linregress_aggs("y", "x"))
    got = {
        r["g"]: r["pvalue"]
        for r in agg.select(
            "g", pvalue_udf()(F.col("r2"), F.col("n").cast("double")).alias("pvalue")
        ).collect()
    }
    assert got[1] == 0.0
    assert got[2] is None


def test_linregress_scipy_parity(spark):
    try:
        from scipy import stats
    except ImportError:
        import pytest

        pytest.skip("scipy not available")
    import random

    random.seed(42)
    rows = [
        Row(g=g, x=float(i), y=random.uniform(0, 100))
        for g in range(3)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows)
    got = {r["g"]: r for r in grouped_linregress(df, ["g"], "y", "x").collect()}
    import collections

    by_g = collections.defaultdict(list)
    for r in rows:
        by_g[r.g].append((r.x, r.y))
    for g, pts in by_g.items():
        ref = stats.linregress([p[0] for p in pts], [p[1] for p in pts])
        assert math.isclose(got[g]["slope"], ref.slope, rel_tol=1e-9)
        assert math.isclose(got[g]["intercept"], ref.intercept, rel_tol=1e-9)
        assert math.isclose(got[g]["rvalue"], ref.rvalue, rel_tol=1e-9)
        assert math.isclose(got[g]["stderr"], ref.stderr, rel_tol=1e-9)
