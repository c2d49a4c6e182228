"""String / filename / JSON scalar functions (SURVEY F6-F9).

Reference: track-id formatting ``f"{rgt:04d}_{pairtrack}"``
(/root/reference/deepicedrain/extraload.py:170), crossover-pair split
on 'x' (/root/reference/atlxi_xover.py:248), pipe-joined distinct
track lists (/root/reference/atlxi_lake.py:281-283), filename pattern
parsing via intake ``reverse_format`` (/root/reference/atlxi_dhdt.py:65-70),
JSON normalize (/root/reference/atlxi_lake.py:364-369).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def track_id(rgt: Column, pairtrack: Column) -> Column:
    """'%04d_%s' track key (F6)."""
    return F.format_string("%04d_%s", rgt.cast("int"), pairtrack)


def split_track_pair(pair: Column) -> tuple[Column, Column]:
    """'0111_pt1x0222_pt2' → two track ids (F6)."""
    parts = F.split(pair, "x")
    return parts.getItem(0), parts.getItem(1)


def piped_distinct(col_name: str) -> Column:
    """Aggregate: sorted distinct values pipe-joined (F6; reference
    atlxi_lake.py:281-283). Use inside .agg()."""
    return F.concat_ws("|", F.sort_array(F.collect_set(col_name)))


def filename_field(pattern: str, group: int = 1) -> Column:
    """Regex-extract a field from the source file path (F7; replaces
    intake reverse_format — e.g. r'ATL11_(\\d{4})' → rgt)."""
    return F.regexp_extract(F.input_file_name(), pattern, group)


def json_field(col: Column, path: str) -> Column:
    """Extract a scalar from a JSON string column (F8)."""
    return F.get_json_object(col, path)


def replace_value(col: Column, to_replace, value=None) -> Column:
    """NULL-out or substitute a sentinel (F9; reference
    atlxi_lake.py:239,273 ``.replace(to_replace=label, value=None)``)."""
    return F.when(col == F.lit(to_replace), F.lit(value)).otherwise(col)


def bin_label(col: Column, edges: list[float], labels: list[str]) -> Column:
    """pd.cut equivalent (F5; reference extraload.py:162-166 bins
    y_atc at (−∞,−100,100,∞) → pt1/pt2/pt3). NULL and NaN inputs map
    to NULL, matching pd.cut's NaN — without the explicit guard they
    would fall through every `<= edge` WHEN into the TOP bin."""
    assert len(labels) == len(edges) + 1
    expr = F.when(col.isNull() | F.isnan(col), F.lit(None).cast("string"))
    expr = expr.when(col <= F.lit(edges[0]), F.lit(labels[0]))
    for i in range(1, len(edges)):
        expr = expr.when(col <= F.lit(edges[i]), F.lit(labels[i]))
    return expr.otherwise(F.lit(labels[-1]))
