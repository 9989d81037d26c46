#!/usr/bin/env python3
"""EXACT replica of the driver's hash gate (validated: reproduces
CORRECTNESS_r03's hash_match verdict 40/40).

Mechanics the driver uses (inferred + empirically confirmed):
  spark side: pandas.read_parquet  -> DECIMAL columns stay Decimal objects
  oracle side: duckdb .df()        -> DECIMAL columns become float64
  canonicalize: columns sorted by name, serialized (CSV-equivalent),
  hashed. So a decimal output column hash-matches ONLY when every
  value's str(Decimal) equals the pandas float64 string — i.e. decimal
  values with trailing zeros at their scale ('221589.0000' vs
  '221589.0') ALWAYS mismatch, even though types and values compare
  equal. Integer sums that DuckDB returns as HUGEINT become float64
  the same way ('158754.0' vs '158754').

Rule for query authors: final output columns must be BIGINT, DOUBLE,
DATE, or STRING. Do decimal arithmetic internally for exactness, then
cast the result to DOUBLE (identically rounded on both engines).
DECIMAL outputs are only safe when no value can have a trailing zero —
don't rely on that.

Usage: python3 tools/hashgate.py <verify_out_dir> <sf_dir> [query ...]
"""
import hashlib
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()


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
        try:
            sp = pd.read_parquet(f"{out_dir}/{name}")
            du = con.execute(sql).df()
        except Exception as e:
            print(f"ERR  {name}: {e}")
            n_bad += 1
            continue
        if canon(sp) == canon(du):
            print(f"  OK {name}: hash match ({len(sp)} rows)")
        else:
            n_bad += 1
            print(f"HASH-DIFF {name}:")
            sp_s = sp[sorted(sp.columns)]
            du_s = du[sorted(du.columns)]
            if list(sp_s.columns) != list(du_s.columns):
                print(f"    columns: spark={list(sp_s.columns)}"
                      f" duck={list(du_s.columns)}")
                continue
            if len(sp_s) != len(du_s):
                print(f"    rows: spark={len(sp_s)} duck={len(du_s)}")
                continue
            # find first serialized cell difference
            shown = 0
            for c in sp_s.columns:
                a = sp_s[c].astype(str).values
                b = du_s[c].astype(str).values
                for i in range(len(a)):
                    if a[i] != b[i]:
                        print(f"    [{c}] row {i}: spark={a[i]!r} "
                              f"(dtype {sp_s[c].dtype}) duck={b[i]!r} "
                              f"(dtype {du_s[c].dtype})")
                        shown += 1
                        break
                if shown >= 4:
                    break
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
