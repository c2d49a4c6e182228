"""Wide↔long reshaping (SURVEY F11/F12, §1.1).

Reference: ``wide_to_long`` at
/root/reference/deepicedrain/extraload.py:176-200 melts suffixed
per-cycle columns (h_corr_3..h_corr_9, utc_time_3..) into tidy rows
and drops NaNs; ``array_to_dataframe`` at extraload.py:14-51 expands a
2-D array into suffixed columns.

Spark-first: unpivot is a map-side-only ``stack`` (no shuffle); the
long form is the engine's canonical shape (§7) because grouped
aggregates (regr_*) apply directly and partitioning by point id
shuffles evenly.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suffix_cycles(df: DataFrame, stub: str) -> list[int]:
    """Discover cycle numbers from suffixed columns (reference
    spatiotemporal.py:399-402 reverse-parses them)."""
    pat = re.compile(rf"^{re.escape(stub)}_(\d+)$")
    return sorted(int(m.group(1)) for c in df.columns for m in [pat.match(c)] if m)


def wide_to_long(
    df: DataFrame,
    stubnames: list[str],
    i: list[str],
    j: str = "cycle_number",
    dropna: bool = True,
) -> DataFrame:
    """Melt suffixed stub columns into long rows.

    ``stubnames=['h_corr','utc_time'], i=['id'], j='cycle_number'`` turns
    columns h_corr_3..9/utc_time_3..9 into rows
    (id, cycle_number, h_corr, utc_time). When ``dropna``, rows where
    ANY stub value is null are dropped — pandas ``dropna(how='any')``,
    the reference's exact call (extraload.py wide_to_long ->
    df_long.dropna()).
    """
    cycles = suffix_cycles(df, stubnames[0])
    for s in stubnames[1:]:
        if suffix_cycles(df, s) != cycles:
            raise ValueError(f"stub {s!r} has mismatched cycle suffixes")
    if not cycles:
        raise ValueError(f"no columns match stub {stubnames[0]!r}_<n>")

    # One struct per cycle, exploded — map-side only, no shuffle.
    structs = [
        F.struct(
            F.lit(c).alias(j),
            *[F.col(f"{s}_{c}").alias(s) for s in stubnames],
        )
        for c in cycles
    ]
    out = (
        df.select(*i, F.explode(F.array(*structs)).alias("_kv"))
        .select(*i, f"_kv.{j}", *[f"_kv.{s}" for s in stubnames])
    )
    if dropna:
        cond = None
        for s in stubnames:
            c = F.col(s).isNotNull()
            cond = c if cond is None else (cond & c)
        out = out.filter(cond)
    return out


def long_to_wide(
    df: DataFrame,
    i: list[str],
    j: str,
    values: list[str],
    cycles: list[int] | None = None,
) -> DataFrame:
    """Inverse pivot: long rows → suffixed wide columns.

    ``groupBy(i).pivot(j)`` with ``first()`` per value column. Passing
    ``cycles`` explicitly avoids the extra distinct-values job (a full
    scan) — always do so at scale.
    """
    p = df.groupBy(*i).pivot(j, cycles)
    aggs = [F.first(v).alias(v) for v in values]
    wide = p.agg(*aggs)
    if len(values) == 1:
        # Spark names single-agg pivot columns '<cycle>'; normalize.
        v = values[0]
        ren = {c: f"{v}_{c}" for c in wide.columns if c not in i}
        for old, new in ren.items():
            wide = wide.withColumnRenamed(old, new)
    else:
        ren = {}
        for c in wide.columns:
            if c in i:
                continue
            cyc, _, v = c.partition("_")
            ren[c] = f"{v}_{cyc}"
        for old, new in ren.items():
            wide = wide.withColumnRenamed(old, new)
    return wide


def array_to_columns(df: DataFrame, array_col: str, n: int, start: int = 0) -> DataFrame:
    """ArrayType column → n suffixed scalar columns (F12; reference
    extraload.py:14-51 ``array_to_dataframe`` with startcol)."""
    others = [c for c in df.columns if c != array_col]
    return df.select(
        *others,
        *[F.col(array_col)[i].alias(f"{array_col}_{i + start}") for i in range(n)],
    )
