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
--alt registers the xxh64 Python UDF (XXH64 seed 42 over UTF-8 bytes,
bit-equal to Spark's xxhash64) and overlays oracle_sql.json with any
spellings found in oracle_sql_alt.json — the certification-sweep mode
that checks the xxhash-id queries (d06/d12) under the engine's OWN id
assignment instead of the dictionary-id approximation. The driver gate
never passes --alt: oracle_sql.json stays vanilla DuckDB.
--staged evaluates the queries listed in oracle_staged.json through
their per-round temp-table programs (init / loop / until_zero / swap /
final — see graft.graph.StagedOracles) instead of the monolithic
recursive-CTE spellings that time out at sf>=1. Like --alt, a
certification-sweep mode only; the driver gate runs the monolithic SQL.
"""
import json
import sys
import threading

import duckdb

# XXH64 (Collet's public xxHash spec), the same algorithm Spark's
# catalyst XXH64 ports; seed fixed at 42 = Spark's xxhash64() seed.
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        vs = [(seed + _P1 + _P2) & _M64, (seed + _P2) & _M64,
              seed & _M64, (seed - _P1) & _M64]
        while i + 32 <= n:
            for j in range(4):
                k = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                v = (vs[j] + k * _P2) & _M64
                vs[j] = (_rotl(v, 31) * _P1) & _M64
            i += 32
        h = (_rotl(vs[0], 1) + _rotl(vs[1], 7) + _rotl(vs[2], 12)
             + _rotl(vs[3], 18)) & _M64
        for v in vs:
            v = (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h ^= v
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = (int.from_bytes(data[i:i + 8], "little") * _P2) & _M64
        k = (_rotl(k, 31) * _P1) & _M64
        h ^= k
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_signed(s):
    """Spark-compatible xxhash64(string): signed-int64 view of XXH64.

    NULL-safe (ADVICE r12): Spark's xxhash64 is null-intolerant (NULL in,
    NULL out); mirroring that here (plus null_handling='special' at
    registration) means a NULL shingle produces a comparable NULL id on
    both sides instead of a Python traceback killing the whole oracle.
    """
    if s is None:
        return None
    h = _xxh64(s.encode("utf-8"))
    return h - (1 << 64) if h >= (1 << 63) else h


# Golden fixtures pinned against Spark's xxhash64 (seed 42); the Scala
# side pins the SAME values in XxHashSpec, so stream and oracle can
# never hash differently without one of the two checks failing.
# Covers: empty, tail-1, tail-3 (1-byte loop), 8+4-byte tail, >32-byte
# block loop, multibyte UTF-8.
_XXH64_GOLDENS = [
    ("", -7444071767201028348),
    ("a", -8582455328737087284),
    ("abc", 1423657621850124518),
    ("hello world", 7620854247404556961),
    ("the quick brown fox jumps over the lazy dog repeatedly and then "
     "some more to exceed 32 bytes", -1251745622146509217),
    ("héllo ünïcode ⚡", 625037590918019868),
]


def _xxh64_selftest():
    for s, want in _XXH64_GOLDENS:
        got = xxh64_signed(s)
        assert got == want, f"xxh64 selftest: {s!r} -> {got}, want {want}"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Documented float-snap boundary contracts (SCALE.md "Exact AND flat at
# sf10"): queries whose engine side accumulates raw doubles in machinery
# that admits no mid-loop decimal snap (GraphX Pregel), so at extreme
# accumulation depth a score can land on the round() half-boundary and
# differ from DuckDB by exactly one step of the snap grid. On a value
# mismatch for a contracted query, the comparer re-checks row-by-row
# (keyed by the non-float columns): non-float values must be identical,
# every float delta must be <= 10^-decimals, and at most max_rows rows
# may differ — then records pass_ulp_boundary with the measured count.
# Anything outside that envelope (bigger deltas, more rows, key or
# non-float drift) still FAILS, which is what makes a real regression
# distinguishable from the documented boundary.
ULP_CONTRACTS = {
    "g08b_graphx_capped": {"decimals": 10, "max_rows": 5},
}


def ulp_boundary_check(name, g_raw, g_cols, e_raw, e_cols):
    """Returns (ok, detail) for a contracted query's value mismatch.

    Duplicate-key rows (same non-float key on both sides) are paired by
    repr-sort of the full row — deterministic, but an arbitrary pairing
    when several rows share a key AND differ only in float columns; in
    the worst case that inflates a delta and FAILs (the safe direction,
    never a false pass). g08b's key columns are unique, so the contract
    in force never hits this.
    """
    c = ULP_CONTRACTS[name]
    tol = 10.0 ** (-c["decimals"]) * 1.5  # one snap-grid step, with slack
    if sorted(g_cols) != sorted(e_cols) or len(g_raw) != len(e_raw):
        return False, "schema/rowcount under ulp contract"
    order_g = [g_cols.index(x) for x in sorted(g_cols)]
    order_e = [e_cols.index(x) for x in sorted(e_cols)]
    g = [[r[i] for i in order_g] for r in g_raw]
    e = [[r[i] for i in order_e] for r in e_raw]
    # Column floatness from the FULL column on BOTH sides (ADVICE r12): a
    # float column that happened to be all-NULL in a prefix sample would
    # otherwise be treated as a key column and degrade to a spurious FAIL.
    # any() over a generator short-circuits on the first float, so this
    # stays cheap on the real (non-null) case.
    is_f = [any(isinstance(r[i], float) for r in g)
            or any(isinstance(r[i], float) for r in e)
            for i in range(len(order_g))]

    def key(row):
        return tuple(repr(v) for i, v in enumerate(row) if not is_f[i])
    gd, ed = {}, {}
    for row in g:
        gd.setdefault(key(row), []).append(row)
    for row in e:
        ed.setdefault(key(row), []).append(row)
    if sorted(gd) != sorted(ed):
        return False, "non-float key sets differ under ulp contract"
    n_diff = 0
    for k in gd:
        a, b = gd[k], ed[k]
        if len(a) != len(b):
            return False, f"duplicate-key count differs at {k}"
        a = sorted(a, key=repr)
        b = sorted(b, key=repr)
        for ra, rb in zip(a, b):
            deltas = [abs(ra[i] - rb[i]) for i in range(len(ra))
                      if is_f[i] and ra[i] is not None and rb[i] is not None]
            nulls = [(ra[i] is None) != (rb[i] is None)
                     for i in range(len(ra)) if is_f[i]]
            if any(nulls):
                return False, f"float null-mismatch at {k}"
            if any(d > tol for d in deltas):
                return False, (f"delta {max(deltas):.3e} > {tol:.1e} at {k}")
            if any(d > 0 for d in deltas):
                n_diff += 1
    if n_diff > c["max_rows"]:
        return False, f"{n_diff} boundary rows > contract max {c['max_rows']}"
    return True, f"{n_diff} rows within 1 snap-step (10^-{c['decimals']})"


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
    alt = False
    staged = False
    args = sys.argv[3:]
    while args:
        a = args.pop(0)
        if a == "--timeout":
            timeout = float(args.pop(0))
        elif a == "--json":
            json_out = args.pop(0)
        elif a == "--skip":
            skip.update(x for x in args.pop(0).split(",") if x)
        elif a == "--alt":
            alt = True
        elif a == "--staged":
            staged = True
        else:
            sys.exit(f"unknown arg {a}")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if alt:
        _xxh64_selftest()
        con.create_function("xxh64", xxh64_signed,
                            [duckdb.typing.VARCHAR], duckdb.typing.BIGINT,
                            null_handling="special")
        try:
            alts = json.load(open(f"{out_dir}/oracle_sql_alt.json"))
        except FileNotFoundError:
            alts = {}
        overlaid = {k: v for k, v in alts.items() if k in oracle}
        oracle.update(overlaid)
        print(f"[alt] xxh64 UDF registered; "
              f"{len(overlaid)} spellings overlaid: {sorted(overlaid)}")
    staged_progs = {}
    if staged:
        try:
            progs = json.load(open(f"{out_dir}/oracle_staged.json"))
        except FileNotFoundError:
            progs = {}
        staged_progs = {k: v for k, v in progs.items() if k in oracle}
        print(f"[staged] {len(staged_progs)} programs: {sorted(staged_progs)}")
    n_pass = n_fail = n_skip = 0
    results = {}

    def with_watchdog(body):
        """Run body() fully; a watchdog thread interrupts past timeout.
        Returns (result, was_timeout); result is None on interrupt."""
        timer = None
        timed_out = [False]
        if timeout:
            def kill():
                timed_out[0] = True
                con.interrupt()
            timer = threading.Timer(timeout, kill)
            timer.start()
        try:
            return body(), False
        except duckdb.InterruptException:
            return None, timed_out[0]
        finally:
            if timer:
                timer.cancel()

    def run_with_timeout(sql):
        def body():
            rel = con.sql(sql)
            return rel.fetchall(), rel.columns
        res, was_timeout = with_watchdog(body)
        if res is None:
            return None, None, was_timeout
        return res[0], res[1], False

    def exec_program(prog):
        """init / loop / until_zero / swap, to the fixpoint or max_iter.
        A loop entry may itself be a nested program object (same keys,
        minus final) — a nested fixpoint run to completion inside each
        outer iteration. Needed by decompositions whose peel round
        contains its own propagation (g23's FB-coloring: a forward
        max-color fixpoint and a backward within-class closure per
        peeling round)."""
        for sql in prog.get("init", []):
            con.execute(sql)
        until = prog.get("until_zero")
        for _ in range(prog["max_iter"]):
            for st in prog.get("loop", []):
                if isinstance(st, dict):
                    exec_program(st)
                else:
                    con.execute(st)
            z = con.sql(until).fetchone()[0] if until else None
            for sql in prog.get("swap", []):
                con.execute(sql)
            if until and z == 0:
                break

    def run_staged(prog):
        """Execute a staged temp-table program under the same watchdog;
        returns like run_with_timeout. The full program — including all
        (nested) iteration — counts against the one timeout budget."""
        def body():
            exec_program(prog)
            rel = con.sql(prog["final"])
            return rel.fetchall(), rel.columns
        res, was_timeout = with_watchdog(body)
        if res is None:
            return None, None, was_timeout
        return res[0], res[1], False

    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name} (documented skip)")
            results[name] = {"status": "skip", "reason": "documented"}
            n_skip += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            g_raw, g_colnames = got.fetchall(), got.columns
            g_cols, g_rows = canon(g_raw, g_colnames)
            if name in staged_progs:
                e_fetched, e_colnames, was_timeout = \
                    run_staged(staged_progs[name])
            else:
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
            if name in ULP_CONTRACTS:
                ok, detail = ulp_boundary_check(
                    name, g_raw, list(g_colnames), e_fetched, list(e_colnames))
                if ok:
                    print(f"PASS {name} (ulp boundary: {detail})")
                    results[name] = {"status": "pass_ulp_boundary",
                                     "rows": len(g_rows), "detail": detail}
                    n_pass += 1
                    continue
                print(f"FAIL {name}: outside ulp contract: {detail}")
                results[name] = {"status": "fail",
                                 "reason": f"ulp_contract: {detail}"}
                n_fail += 1
                continue
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
