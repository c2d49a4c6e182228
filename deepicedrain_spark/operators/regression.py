"""Per-group linear regression — the flagship aggregate (SURVEY A2).

Reference: ``nan_linregress`` at
/root/reference/deepicedrain/deltamath.py:45-67 runs
``scipy.stats.linregress(x=time, y=height)`` per point over ≤9 cycles
(NaN-masked) and returns (slope, intercept, rvalue, pvalue, stderr);
driven over ~190 M points at /root/reference/atlxi_dhdt.py:255-280,
with slope × ns-per-year → dhdt_slope m/yr.

Spark-first: this is a single shuffle-on-group-key aggregation using
built-in ``regr_*`` aggregates (JVM-side, whole-stage codegen, partial
aggregation map-side — shuffle volume is O(groups), not O(rows)).
scipy's extra outputs are derived in closed form from the same moments:

    t      = slope / stderr
    stderr = sqrt( (syy/sxx - slope^2) / (n-2) )
    pvalue = 2 * (1 - T_cdf(|t|, df=n-2))   [via regularized beta]

The p-value needs the regularized incomplete beta function I_x(a,b)
(pvalue = I_{1-r²}(df/2, 1/2), df = n-2 — no t statistic needed), which
neither Spark SQL nor scipy-free Python ships; `betainc_regularized`
implements it with the standard Lentz continued-fraction evaluation
(public algorithm, e.g. Numerical Recipes §6.4 "betacf"; written here
independently, vectorized in numpy) and `pvalue_udf` exposes it as an
Arrow-batched pandas UDF applied AFTER aggregation — one call per
group row, never per observation. The scipy-parity path
(`grouped_linregress_pandas`) remains import-gated for environments
that have scipy.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve via get_type_hints
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def betainc_regularized(a, b, x, iters: int = 100):
    """Regularized incomplete beta I_x(a,b), vectorized over numpy
    arrays. Modified-Lentz continued fraction, ``iters`` double-steps
    (machine precision long before 100 for the t-test parameter family
    a=df/2, b=1/2). Uses the symmetry I_x(a,b) = 1 - I_{1-x}(b,a) to
    stay in the fast-converging region."""
    import math

    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    swap = x >= (a + 1.0) / (a + b + 2.0)
    A = np.where(swap, b, a)
    B = np.where(swap, a, b)
    X = np.where(swap, 1.0 - x, x)
    tiny = 1e-300

    def g(z):
        return np.where(np.abs(z) < tiny, tiny, z)

    d = 1.0 / g(1.0 - (A + B) * X / (A + 1.0))
    c = np.ones_like(d)
    h = d.copy()
    for m in range(1, iters + 1):
        aa = m * (B - m) * X / ((A + 2 * m - 1.0) * (A + 2 * m))
        d = 1.0 / g(1.0 + aa * d)
        c = g(1.0 + aa / c)
        h = h * d * c
        aa = -(A + m) * (A + B + m) * X / ((A + 2 * m) * (A + 2 * m + 1.0))
        d = 1.0 / g(1.0 + aa * d)
        c = g(1.0 + aa / c)
        h = h * d * c
    lgamma = np.vectorize(math.lgamma)
    ln_pre = A * np.log(X) + B * np.log(1.0 - X) + lgamma(A + B) - lgamma(A) - lgamma(B)
    val = np.exp(ln_pre) * h / A
    return np.clip(np.where(swap, 1.0 - val, val), 0.0, 1.0)


def regression_pvalue_np(r2, n):
    """Two-sided p-value of the slope t-test from (r², n) alone:
    p = I_{1-r²}(df/2, 1/2) with df = n-2. NaN where df ≤ 0 or r²
    undefined; exact 0/1 at the r²∈{1,0} boundaries (where the beta
    prefactor would log(0))."""
    import numpy as np

    r2 = np.asarray(r2, dtype=np.float64)
    n = np.asarray(n, dtype=np.float64)
    df = n - 2.0
    x = 1.0 - r2
    ok = (df > 0) & np.isfinite(r2)
    safe_x = np.where(ok & (x > 0.0) & (x < 1.0), x, 0.5)
    safe_df = np.where(ok, df, 1.0)
    p = betainc_regularized(safe_df / 2.0, 0.5, safe_x)
    p = np.where(x <= 0.0, 0.0, np.where(x >= 1.0, 1.0, p))
    return np.where(ok, p, np.nan)


def pvalue_udf() -> "F.pandas_udf":
    """pandas UDF (double) computing regression_pvalue_np(r2, n).
    Post-aggregation: input cardinality is O(groups)."""

    @F.pandas_udf("double")
    def _pvalue(r2: pd.Series, n: pd.Series) -> pd.Series:
        import numpy as np

        out = regression_pvalue_np(r2.to_numpy(dtype=np.float64), n.to_numpy(dtype=np.float64))
        return pd.Series(out).where(pd.Series(np.isfinite(out)), None)

    return _pvalue


def linregress_aggs(y: str, x: str, suffix: str = "") -> list[Column]:
    """Column list of regression aggregates for .agg().

    Output columns: n, slope, intercept, rvalue, r2, stderr (each with
    ``suffix``). NULL-pair rows are ignored by regr_* semantics, which
    matches the reference's NaN masking (NaN must be translated to NULL
    on ingest — §1.3 NaN-as-null convention).
    """
    n = F.expr(f"regr_count({y}, {x})")
    slope = F.expr(f"regr_slope({y}, {x})")
    intercept = F.expr(f"regr_intercept({y}, {x})")
    r2 = F.expr(f"regr_r2({y}, {x})")
    sxx = F.expr(f"regr_sxx({y}, {x})")
    syy = F.expr(f"regr_syy({y}, {x})")
    # rvalue carries the slope's sign (scipy returns signed r).
    rvalue = F.signum(slope) * F.sqrt(r2)
    # Guarded: ANSI mode (the default, and the driver session's) turns
    # sxx=0 (constant x, incl. fp-underflow of tiny spreads) or n=2
    # into DIVIDE_BY_ZERO errors; those groups have no defined stderr →
    # NULL. greatest(.,0) absorbs fp cancellation driving the residual
    # variance a hair negative on exact-fit groups.
    stderr = F.when(
        (n > F.lit(2)) & (sxx != F.lit(0.0)),
        F.sqrt(F.greatest(syy / sxx - slope * slope, F.lit(0.0)) / (n - F.lit(2))),
    )
    return [
        n.alias(f"n{suffix}"),
        slope.alias(f"slope{suffix}"),
        intercept.alias(f"intercept{suffix}"),
        rvalue.alias(f"rvalue{suffix}"),
        r2.alias(f"r2{suffix}"),
        stderr.alias(f"stderr{suffix}"),
    ]


def grouped_linregress(df: DataFrame, group_cols: list[str], y: str, x: str) -> DataFrame:
    """groupBy(group_cols).agg(regr_*): one row per group.

    This is the Spark rewrite of the reference's 190M independent
    regressions — the wide xarray apply_ufunc becomes one hash
    aggregation; at 100 TB it is a single shuffle keyed on the point id
    with map-side partial moments.
    """
    return df.groupBy(*group_cols).agg(*linregress_aggs(y, x))


def grouped_linregress_pandas(df: DataFrame, group_cols: list[str], y: str, x: str) -> DataFrame:
    """scipy-parity fallback (includes pvalue) via applyInPandas.

    Slow path (Arrow batches + Python): use only when pvalue/stderr must
    match scipy bit-for-bit. Requires scipy (import-gated).
    """
    import pandas as pd
    from scipy import stats  # import-gated: raises if absent

    schema = (
        ", ".join(f"`{c}` " + dict(df.dtypes)[c] for c in group_cols)
        + ", n long, slope double, intercept double, rvalue double, pvalue double, stderr double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        sub = pdf[[x, y]].dropna()
        keys = {c: pdf[c].iloc[0] for c in group_cols}
        if len(sub) < 2:
            row = {**keys, "n": len(sub), "slope": None, "intercept": None,
                   "rvalue": None, "pvalue": None, "stderr": None}
        else:
            r = stats.linregress(sub[x].to_numpy("float64"), sub[y].to_numpy("float64"))
            row = {**keys, "n": len(sub), "slope": r.slope, "intercept": r.intercept,
                   "rvalue": r.rvalue, "pvalue": r.pvalue, "stderr": r.stderr}
        return pd.DataFrame([row])

    return df.groupBy(*group_cols).applyInPandas(fit, schema=schema)
