#!/usr/bin/env python3
"""Per-family sf0.1 -> sf1 bench slope table.

Usage: python3 tools/slopes.py [BENCH_sf0.1.json] [BENCH_sf1.json]

Matches queries present in BOTH artifacts, groups them by id prefix
family, and prints per-family total times and slopes plus the aggregate.
"""
import json
import re
import sys


def fam(q):
    m = re.match(r"([a-z]+)", q)
    return m.group(1) if m else q


def main():
    lo_p = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r05_final.json"
    hi_p = sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf1_full.json"
    lo = json.load(open(lo_p))["queries"]
    hi = json.load(open(hi_p))["queries"]
    common = sorted(set(lo) & set(hi))
    common = [q for q in common if lo[q] > 0 and hi[q] > 0]
    if not common:
        sys.exit(f"no successful queries shared by {lo_p} and {hi_p} "
                 f"({len(lo)} vs {len(hi)} queries; -1 = failed)")
    fams = {}
    for q in common:
        fams.setdefault(fam(q), []).append(q)
    print(f"matched {len(common)} queries "
          f"(skipped: {len(set(hi)) - len(common)} hi-side-only/failed, "
          f"{len(set(lo)) - len(common)} lo-side-only/failed)")
    print(f"{'family':10} {'n':>3} {'sf0.1 s':>9} {'sf1 s':>9} {'slope':>7}  worst (slope)")
    tl = th = 0.0
    for f in sorted(fams):
        qs = fams[f]
        l = sum(lo[q] for q in qs)
        h = sum(hi[q] for q in qs)
        tl += l
        th += h
        worst = max(qs, key=lambda q: hi[q] / lo[q])
        print(f"{f:10} {len(qs):>3} {l:>9.2f} {h:>9.2f} {h / l:>6.1f}x"
              f"  {worst} ({hi[worst] / lo[worst]:.1f}x)")
    print(f"{'TOTAL':10} {len(common):>3} {tl:>9.2f} {th:>9.2f} {th / tl:>6.1f}x")
    slopes = sorted((hi[q] / lo[q], q) for q in common)
    med = slopes[len(slopes) // 2]
    print(f"median per-query slope: {med[0]:.2f}x ({med[1]})")
    print("top-5 slopes:")
    for s, q in slopes[-5:][::-1]:
        print(f"  {q}: {s:.1f}x ({lo[q]:.2f}s -> {hi[q]:.2f}s)")


if __name__ == "__main__":
    main()
