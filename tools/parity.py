#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/parity.py <verify_out_dir> <sf_dir> [query ...]

Reads <verify_out_dir>/<name>/ parquet written by graft.Verify plus
oracle_sql.json, runs each oracle in DuckDB against the parquet tables
in <sf_dir>, sorts columns by name, and value-compares row by row.
Exact compare (no float tolerance) — our queries emit exact types on
purpose; a mismatch here means the driver's gate would likely fail too.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_tbl = ds.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            failures.append((name, f"spark output unreadable: {e}"))
            continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            failures.append((name, f"schema mismatch: spark={s_cols} duck={d_cols}"))
            continue
        if spark_tbl.num_rows != duck.num_rows:
            failures.append((name, f"row count: spark={spark_tbl.num_rows} duck={duck.num_rows}"))
            continue
        s_rows = list(zip(*[spark_tbl.column(c).to_pylist() for c in s_cols]))
        d_rows = list(zip(*[duck.column(c).to_pylist() for c in d_cols]))
        bad = None
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            if tuple(norm(x) for x in sr) != tuple(norm(x) for x in dr):
                bad = (i, dict(zip(s_cols, sr)), dict(zip(d_cols, dr)))
                break
        if bad:
            failures.append((name, f"value mismatch at row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}"))
        else:
            print(f"  OK  {name}: {spark_tbl.num_rows} rows")
    if failures:
        for name, why in failures:
            print(f"FAIL  {name}: {why}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
