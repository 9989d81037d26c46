#!/usr/bin/env python3
"""Stricter replica of the driver's hash gate: compares arrow SCHEMA
(exact types) and exact value representations between Spark parquet
output and the DuckDB oracle, column-name-sorted. Any difference here
is a candidate for the driver's hash_match:false.

Usage: python3 tools/strict_parity.py <verify_out_dir> <sf_dir> [query ...]
"""
import json
import sys

import duckdb
import pyarrow as pa
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_tbl = ds.dataset(f"{out_dir}/{name}").to_table()
        duck = con.execute(sql).fetch_arrow_table()
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck.column_names)
        problems = []
        if s_cols != d_cols:
            problems.append(f"columns: spark={s_cols} duck={d_cols}")
        else:
            for c in s_cols:
                st = spark_tbl.schema.field(c).type
                dt = duck.schema.field(c).type
                if st != dt:
                    problems.append(f"type[{c}]: spark={st} duck={dt}")
            if spark_tbl.num_rows != duck.num_rows:
                problems.append(
                    f"rows: spark={spark_tbl.num_rows} duck={duck.num_rows}")
            else:
                # exact repr compare, in output order
                for c in s_cols:
                    sv = spark_tbl.column(c).to_pylist()
                    dv = duck.column(c).to_pylist()
                    for i, (a, b) in enumerate(zip(sv, dv)):
                        if repr(a) != repr(b):
                            problems.append(
                                f"value[{c}] row {i}: spark={a!r} duck={b!r}")
                            break
        if problems:
            n_bad += 1
            print(f"DIFF {name}:")
            for p in problems[:8]:
                print(f"    {p}")
        else:
            print(f"  OK {name}: {spark_tbl.num_rows} rows, types+values exact")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
