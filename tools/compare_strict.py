#!/usr/bin/env python3
"""Stricter replica of the driver's correctness gate.

Reads the Spark output with pandas/pyarrow (NOT through DuckDB) and the
oracle with duckdb -> pandas, then compares the *string rendering* of every
cell. This surfaces type-level divergences (hugeint->float64, ns vs us
timestamps, decimal scale, NaN rendering) that tools/compare.py — which
routes both sides through DuckDB's value model — can never see.

Usage: python3 tools/compare_strict.py [sfdir] [outdir] [only_query...]
"""
import sys, json, glob, math
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
ONLY = set(sys.argv[3:])
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))


def cell(v):
    """Render a cell the way a dtype-sensitive hasher would.

    Dates and midnight timestamps collapse to the same rendering (the
    driver tolerates DATE vs DATETIME); numeric renderings are NOT
    normalized (int64 '1' != float64 '1.0'), matching the driver.
    """
    if v is None:
        return "NULL"
    if isinstance(v, pd.Timestamp):
        if (v.hour, v.minute, v.second, v.microsecond, v.nanosecond) == (0, 0, 0, 0, 0):
            return v.strftime("%Y-%m-%d")
        return str(v)
    # pandas NaN / NaT
    try:
        if v is pd.NaT:
            return "NULL"
        if isinstance(v, float) and math.isnan(v):
            return "NULL"  # pandas uses NaN for SQL NULL in float cols
    except (TypeError, ValueError):
        pass
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, float):
        return repr(v)
    if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
        try:
            return "[" + ",".join(cell(x) for x in v.tolist()) + "]"
        except TypeError:
            return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def frame(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    dtypes = {c: str(df[c].dtype) for c in cols}
    return cols, dtypes, rows


n_pass = n_fail = 0
for name in sorted(oracle):
    if ONLY and name not in ONLY:
        continue
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    try:
        gdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        edf = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        n_fail += 1
        continue
    gc, gt, gr = frame(gdf)
    ec, et, er = frame(edf)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} != {ec}")
        n_fail += 1
        continue
    if len(gr) != len(er):
        print(f"FAIL {name}: rowcount {len(gr)} != {len(er)}")
        n_fail += 1
        continue
    if gr == er:
        print(f"PASS {name} ({len(gr)} rows)")
        n_pass += 1
        continue
    n_fail += 1
    if gt != et:
        dd = {c: (gt[c], et[c]) for c in gc if gt[c] != et[c]}
        print(f"FAIL {name}: dtype diff {dd}")
    ndiff = 0
    for ri, (a, b) in enumerate(zip(gr, er)):
        if a != b:
            for ci, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"FAIL {name} row {ri} col {gc[ci]}: spark={x!r} duck={y!r}")
                    ndiff += 1
                    if ndiff >= 6:
                        break
        if ndiff >= 6:
            break

print(f"\n{n_pass} passed, {n_fail} failed")
sys.exit(1 if n_fail else 0)
