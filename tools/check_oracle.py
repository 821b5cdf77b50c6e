#!/usr/bin/env python3
"""Local pre-check mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> \
           [--timeout SECONDS] [--json OUTFILE] [--skip name1,name2,...]

Reads each <verifyOutDir>/<name> parquet (Spark result) and runs the
matching SQL from oracle_sql.json in DuckDB against views named after the
testdata tables. Compares: row count, column names (sorted), and values
(rows sorted by all columns, exact equality; floats compared exactly after
a round-trip through repr — mismatches print a diff head).

--timeout interrupts any single oracle SQL after N seconds (DuckDB's
recursive-CTE mirrors of the definitional quadratics are themselves
quadratic at sf>=1; a timeout is recorded as SKIP, not FAIL).
--json writes a machine-readable per-query result map (the ORACLE_sf1
certification artifact format). --skip records the named queries as
skipped without running their oracle (the documented-quadratic list).
"""
import json
import sys
import threading

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
    timeout = None
    json_out = None
    skip = set()
    args = sys.argv[3:]
    while args:
        a = args.pop(0)
        if a == "--timeout":
            timeout = float(args.pop(0))
        elif a == "--json":
            json_out = args.pop(0)
        elif a == "--skip":
            skip.update(x for x in args.pop(0).split(",") if x)
        else:
            sys.exit(f"unknown arg {a}")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    results = {}

    def run_with_timeout(sql):
        """Evaluate sql fully; a watchdog thread interrupts past timeout."""
        timer = None
        timed_out = [False]
        if timeout:
            def kill():
                timed_out[0] = True
                con.interrupt()
            timer = threading.Timer(timeout, kill)
            timer.start()
        try:
            rel = con.sql(sql)
            return rel.fetchall(), rel.columns, False
        except duckdb.InterruptException:
            return None, None, timed_out[0]
        finally:
            if timer:
                timer.cancel()

    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name} (documented skip)")
            results[name] = {"status": "skip", "reason": "documented"}
            n_skip += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            g_cols, g_rows = canon(got.fetchall(), got.columns)
            e_fetched, e_colnames, was_timeout = run_with_timeout(sql)
            if e_fetched is None:
                if was_timeout:
                    print(f"SKIP {name} (oracle timeout after {timeout}s)")
                    results[name] = {"status": "skip",
                                     "reason": f"oracle_timeout_{timeout}s"}
                    n_skip += 1
                    continue
                raise RuntimeError("interrupted outside the watchdog")
            e_cols, e_rows = canon(e_fetched, e_colnames)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            results[name] = {"status": "fail", "reason": f"exception: {e}"}
            n_fail += 1
            continue
        if g_cols != e_cols:
            print(f"FAIL {name}: cols spark={g_cols} duckdb={e_cols}")
            results[name] = {"status": "fail", "reason": "schema"}
            n_fail += 1
        elif len(g_rows) != len(e_rows):
            print(f"FAIL {name}: rows spark={len(g_rows)} duckdb={len(e_rows)}")
            results[name] = {"status": "fail", "reason": "rowcount"}
            n_fail += 1
        elif g_rows != e_rows:
            bad = [i for i, (a, b) in enumerate(zip(g_rows, e_rows)) if a != b]
            print(f"FAIL {name}: {len(bad)} differing rows; first: "
                  f"spark={g_rows[bad[0]]} duckdb={e_rows[bad[0]]}")
            results[name] = {"status": "fail", "reason": "values"}
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g_rows)} rows)")
            results[name] = {"status": "pass", "rows": len(g_rows)}
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir,
                       "pass": n_pass, "fail": n_fail, "skip": n_skip,
                       "queries": results}, f, indent=1, sort_keys=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
