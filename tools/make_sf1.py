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

Round 14 (VERDICT r13 item 3): the verbatim replication multiplies every
shingle's document frequency by the factor, so at factor 100 every
text shingle crosses the MaxShingleDf=64 boilerplate cap and the
text-dedup tier (d04b/d06/d12/d13/d14) certified on EMPTY pair sets.
The generator now PLANTS surviving near-dups: ~1% of documents
(base doc_id % 101 == 0) get, per replica, (a) their tokens salted
with a replica+doc suffix — shingles become unique to the (doc,
replica) pair, df=2, immune to the cap at ANY factor — and (b) an
appended lightly-edited twin (doc_id = base + replica*STRIDE +
TWIN_OFF, arriving AFTER its original so arrival-order dedup keeps
the original). Edits alternate deterministically: LIGHT (one token
substituted — shingle Jaccard ~0.9, inside the SimHash hamming band
so d04b finds it too) and HEAVY (every 10th token substituted —
Jaccard ~0.55, the MinHash-band regime). Everything is a pure
function of (base doc_id, replica); no randomness.

Usage: python3 tools/make_sf1.py [src=/root/testdata/sf0.1] [dst=testdata-sf1] [factor=10]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 1_000_000_000  # > any sf0.1 key; keeps all shifted keys int64-safe
TWIN_OFF = 500_000_000  # twin ids sit mid-stride: unique, same replica
PLANT_MOD = 101         # ~1% of base docs carry a planted near-dup


def plant_rows(base_rows, i):
    """Per-replica planted documents: salted originals + edited twins.

    Token salting keeps every planted shingle's df at 2 (the orig/twin
    pair) regardless of the replication factor; substitutions write
    tokens that exist nowhere else, so planted pairs can never be
    capped away or accidentally merged across replicas.
    """
    out = []
    for row in base_rows:
        d = row["doc_id"]
        toks = [t for t in row["text"].split(" ") if t != ""]
        salt = f"q{i}z{d}"
        salted = [f"{t}{salt}" for t in toks]
        orig_text = " ".join(salted)
        out.append({"doc_id": d + i * STRIDE, "text": orig_text,
                    "lang": row["lang"], "source": row["source"],
                    "n_chars": len(orig_text)})
        twin = list(salted)
        if (d // PLANT_MOD + i) % 2 == 0:  # LIGHT: one substitution
            j = 3 + (d * 7 + i) % max(1, len(twin) - 6)
            twin[j] = f"e{j}{salt}"
        else:  # HEAVY: every 10th token
            for j in range(5, len(twin), 10):
                twin[j] = f"e{j}{salt}"
        twin_text = " ".join(twin)
        out.append({"doc_id": d + i * STRIDE + TWIN_OFF, "text": twin_text,
                    "lang": row["lang"], "source": row["source"],
                    "n_chars": len(twin_text)})
    return out

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
            planted_base = None
            if name == "documents":
                # no modulo kernel in this pyarrow: a % m == a - a//m*m
                ids = t.column("doc_id")
                mask = pc.equal(pc.subtract(ids, pc.multiply(
                    pc.divide(ids, pa.scalar(PLANT_MOD, ids.type)),
                    pa.scalar(PLANT_MOD, ids.type))), 0)
                planted_base = t.filter(mask).to_pylist()
                t_rest = t.filter(pc.invert(mask))
            else:
                t_rest = t
            reps = []
            for i in range(factor):
                r = t_rest
                for k in keys:
                    idx = r.schema.get_field_index(k)
                    shifted = pc.add(r.column(k), pa.scalar(i * STRIDE,
                                                            r.schema.field(k).type))
                    r = r.set_column(idx, r.schema.field(k), shifted)
                reps.append(r)
                if planted_base is not None:
                    reps.append(pa.Table.from_pylist(
                        plant_rows(planted_base, i), schema=t.schema))
            out = pa.concat_tables(reps)
        pq.write_table(out, f"{dst}/{name}.parquet", version="2.6")
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
