#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run Verify's parquet output
against the DuckDB oracle and diff exactly.

Usage: python3 tools/compare.py [sfdir] [outdir]
(Driver-side tooling only; the Scala library never depends on this.)
"""
import sys, json, glob, math
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v

def fetch(cur):
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return cols_sorted, out

n_pass = n_fail = 0
for name in sorted(oracle):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    try:
        gc, gr = fetch(con.execute(f"SELECT * FROM '{OUT}/{name}/*.parquet'"))
        ec, er = fetch(con.execute(oracle[name]))
    except Exception as e:
        print(f"FAIL {name}: {e}")
        n_fail += 1
        continue
    if gc != ec:
        print(f"FAIL {name}: columns {gc} != {ec}")
        n_fail += 1
        continue
    if len(gr) != len(er):
        print(f"FAIL {name}: rowcount {len(gr)} != {len(er)}")
        n_fail += 1
        continue
    # exact in-order compare first (the driver may hash in row order),
    # fall back to sorted compare to distinguish order-only mismatches
    if gr == er:
        print(f"PASS {name} ({len(gr)} rows)")
        n_pass += 1
    else:
        sg, se = sorted(map(repr, gr)), sorted(map(repr, er))
        if sg == se:
            print(f"FAIL {name}: rows equal but ORDER differs")
        else:
            diffs = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs:")
            for a, b in diffs:
                print(f"   spark: {a}\n   duck : {b}")
        n_fail += 1

print(f"\n{n_pass} passed, {n_fail} failed")
sys.exit(1 if n_fail else 0)
