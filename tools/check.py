#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Registers each parquet table as a DuckDB view, runs every oracle SQL from
outDir/oracle_sql.json, and compares against the Spark result parquet:
columns sorted by name, rows sorted by all columns, exact value equality
(doubles must match bitwise — no tolerance; queries quantize to make
cross-engine double arithmetic deterministic, see QueryUtil.scala).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

with open(f"{OUT}/oracle_sql.json") as f:
    oracles = json.load(f)

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cells_equal(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b): return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or hasattr(a, "__len__") and not isinstance(a, str):
        try:
            la, lb = list(a), list(b)
            return len(la) == len(lb) and all(cells_equal(x, y) for x, y in zip(la, lb))
        except TypeError:
            pass
    return a == b

n_pass = n_fail = 0
for name, sql in sorted(oracles.items()):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
    try:
        got = norm(con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df())
        want = norm(con.sql(sql).df())
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
    bad = []
    for col in got.columns:
        ga, wa = got[col].tolist(), want[col].tolist()
        for i, (a, b) in enumerate(zip(ga, wa)):
            if not cells_equal(a, b):
                bad.append((col, i, a, b))
                if len(bad) > 3: break
        if len(bad) > 3: break
    if bad:
        print(f"FAIL {name}: {len(bad)}+ mismatches, first: {bad[:3]}")
        n_fail += 1
        continue
    # dtype check: the driver's hash compare is dtype-sensitive (r2's
    # agg_stats failed on int64-vs-float64 with equal values), so a
    # dtype mismatch is a FAIL here too.
    dd = [(c, str(got[c].dtype), str(want[c].dtype))
          for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
    if dd:
        print(f"FAIL {name}: dtype mismatch {dd}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1

print(f"\n{n_pass} passed, {n_fail} failed of {len(oracles)}")
sys.exit(1 if n_fail else 0)
