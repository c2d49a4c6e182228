"""Local correctness harness mirroring the driver's oracle compare.

For each query in __spark_entry__.queries(): run the Spark DataFrame
and the DuckDB oracle at the given sf dir, then compare
  - row count
  - column names (sorted)
  - values: columns sorted by name, rows sorted by all columns,
    compared EXACTLY (stricter than any plausible driver hash).

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(rows, cols):
    """Sort columns by name, rows by repr of all values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif v == int(v) and abs(v) < 1e15:
                    v = round(v, 9)  # normalize -0.0 / 5.0 forms
                else:
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def main() -> int:
    from deepicedrain_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("check")
    con = duck_connection(SF_DIR)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"weak {name}: rows={len(srows)} ({time.time()-t0:.1f}s, no oracle)")
            n_weak += 1
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue

        ok = True
        msgs = []
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"schema spark={sorted(scols)} duck={sorted(dcols)}")
        if ok:
            _, sc = canon(srows, scols)
            _, dc = canon(drows, dcols)
            mism = sum(1 for a, b in zip(sc, dc) if a != b)
            if mism:
                ok = False
                msgs.append(f"{mism}/{len(sc)} rows differ")
                for a, b in list(zip(sc, dc))[:2000]:
                    if a != b:
                        msgs.append(f"  spark={a}")
                        msgs.append(f"  duck ={b}")
                        break
        if ok:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: " + "; ".join(msgs))
            n_fail += 1
        spark.catalog.clearCache()  # drop per-query persisted intermediates

    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
