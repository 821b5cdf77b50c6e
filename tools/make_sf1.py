#!/usr/bin/env python3
"""Deterministic sf1 scale-up of the driver's sf0.1 testdata (10x), for
the round-5 judge item "sf1 scale certification": Verify + check_oracle
+ Bench at 10x the bench SF, so scaling SLOPES are measurable, not just
levels.

Replication scheme (referential-integrity-preserving, no randomness):
each fact/dim table is unioned 10x with every KEY column shifted by
replica*STRIDE — foreign keys shift by the same stride, so replica i's
orders reference replica i's customers and join selectivities/ratios
match sf0.1 exactly. region/nation stay as-is (true dimensions).
Non-key payload columns (text, embeddings, prices) repeat verbatim;
both engines see the same bytes, so every oracle stays an exact check.

pyarrow (driver-side tooling, same as the oracle mirror) because the
events.ts column is parquet TIMESTAMP(NANOS): Spark cannot WRITE nanos,
and the oracle gate needs the sf1 schema byte-identical to sf0.1's.

Usage: python3 tools/make_sf1.py [src=/root/testdata/sf0.1] [dst=testdata-sf1] [factor=10]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 1_000_000_000  # > any sf0.1 key; keeps all shifted keys int64-safe

KEYS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "testdata-sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for name, keys in KEYS.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        if not keys:  # true dimensions copy through
            out = t
        else:
            reps = []
            for i in range(factor):
                r = t
                for k in keys:
                    idx = r.schema.get_field_index(k)
                    shifted = pc.add(r.column(k), pa.scalar(i * STRIDE,
                                                            r.schema.field(k).type))
                    r = r.set_column(idx, r.schema.field(k), shifted)
                reps.append(r)
            out = pa.concat_tables(reps)
        pq.write_table(out, f"{dst}/{name}.parquet", version="2.6")
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
