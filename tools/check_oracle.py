#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet tables, load the Spark result parquet,
sort columns by name, and value-compare. Dev tool only (driver-side deps)."""
import json, sys, glob, math
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    sql = oracle[name]
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output"))
        continue
    sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    o = odf[sorted(odf.columns)].reset_index(drop=True)
    s = sdf[sorted(sdf.columns)].reset_index(drop=True)
    if list(o.columns) != list(s.columns):
        fails.append((name, f"cols oracle={list(o.columns)} spark={list(s.columns)}"))
        continue
    if len(o) != len(s):
        fails.append((name, f"rows oracle={len(o)} spark={len(s)}"))
        continue
    def norm(x):
        if hasattr(x, "tolist"):
            return x.tolist()
        return x
    bad = None
    for c in o.columns:
        ov = [norm(x) for x in o[c].tolist()]
        sv = [norm(x) for x in s[c].tolist()]
        for i, (a, b) in enumerate(zip(ov, sv)):
            eq = (a == b) or (a is None and b is None)
            if not eq and isinstance(a, float) and isinstance(b, float):
                eq = (math.isnan(a) and math.isnan(b)) or a == b
            if not eq:
                try:
                    if pd.isna(a) and pd.isna(b):
                        eq = True
                except Exception:
                    pass
            if not eq:
                bad = f"col {c} row {i}: oracle={a!r} spark={b!r}"
                break
        if bad:
            break
    if bad:
        fails.append((name, bad))
    else:
        print(f"PASS {name} ({len(o)} rows)")

print()
if fails:
    for n, m in fails:
        print(f"FAIL {n}: {m}")
    print(f"\n{len(fails)}/{len(oracle)} FAILED")
    sys.exit(1)
print(f"ALL {len(oracle)} MATCH")
