#!/usr/bin/env python3
"""Local pre-check mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result) and runs the
matching SQL from oracle_sql.json in DuckDB against views named after the
testdata tables. Compares: row count, column names (sorted), and values
(rows sorted by all columns, exact equality; floats compared exactly after
a round-trip through repr — mismatches print a diff head).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            rr.append(repr(v))
        out.append(tuple(rr))
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            g_cols, g_rows = canon(got.fetchall(), got.columns)
            exp = con.sql(sql)
            e_cols, e_rows = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if g_cols != e_cols:
            print(f"FAIL {name}: cols spark={g_cols} duckdb={e_cols}")
            n_fail += 1
        elif len(g_rows) != len(e_rows):
            print(f"FAIL {name}: rows spark={len(g_rows)} duckdb={len(e_rows)}")
            n_fail += 1
        elif g_rows != e_rows:
            bad = [i for i, (a, b) in enumerate(zip(g_rows, e_rows)) if a != b]
            print(f"FAIL {name}: {len(bad)} differing rows; first: "
                  f"spark={g_rows[bad[0]]} duckdb={e_rows[bad[0]]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
