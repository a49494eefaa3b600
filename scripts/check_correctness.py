#!/usr/bin/env python
"""Replay the driver's correctness gate locally: run every queries() entry on
Spark and its oracle_sql() on DuckDB at the given sf dir (default sf0.01),
compare row count + column set + sorted values exactly.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from gdal_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    return a == b


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = queries[name](spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  {name:24s} rows-only: {len(srows)} rows "
                  f"({time.time() - t0:.1f}s)")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        status = "OK"
        if sorted(scols) != sorted(dcols):
            status = f"COLS {sorted(scols)} vs {sorted(dcols)}"
        elif len(srows) != len(drows):
            status = f"ROWS {len(srows)} vs {len(drows)}"
        else:
            sr, dr = norm(srows, scols), norm(drows, dcols)
            for i, (a, b) in enumerate(zip(sr, dr)):
                if not all(eq(x, y) for x, y in zip(a, b)):
                    status = f"VALUES row {i}: {a} vs {b}"
                    break
        print(f"  {name:24s} {status} [{len(srows)} rows, "
              f"{time.time() - t0:.1f}s]")
        if status != "OK":
            failed.append(name)

    if failed:
        print(f"FAILED: {failed}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
