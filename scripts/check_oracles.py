#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its DuckDB oracle on the
same parquet tables, sort columns by name and rows by value, and compare.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if hasattr(v, "as_py"):
        v = v.as_py()
    # Decimal and int normalization
    import decimal

    if isinstance(v, decimal.Decimal):
        return repr(float(v)) if v % 1 else str(int(v))
    return str(v)


def canon(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from airbyte_module_spark import get_spark

    spark = get_spark(app_name="check_oracles", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        status = ""
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            if sql is None:
                print(f"{name:24s} rows={len(s_rows):6d} (no oracle — rows-only)")
                continue
            rel = con.execute(sql)
            d_cols = [d[0] for d in rel.description]
            d_rows = rel.fetchall()
            if sorted(s_cols) != sorted(d_cols):
                status = f"COLUMN MISMATCH spark={sorted(s_cols)} duck={sorted(d_cols)}"
            else:
                cs, cd = canon(s_cols, s_rows), canon(d_cols, d_rows)
                if len(cs) != len(cd):
                    status = f"ROWCOUNT spark={len(cs)} duck={len(cd)}"
                elif cs != cd:
                    bad = next(
                        (i, a, b) for i, (a, b) in enumerate(zip(cs, cd)) if a != b
                    )
                    status = f"VALUE MISMATCH at sorted row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}"
            if status:
                failures.append(name)
                print(f"{name:24s} FAIL {status}")
            else:
                print(f"{name:24s} OK   rows={len(s_rows)}")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} ERROR {type(e).__name__}: {str(e)[:500]}")
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    main()
