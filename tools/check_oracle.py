#!/usr/bin/env python
"""Local mimic of the driver's t2 gate: run Verify output vs DuckDB oracle.

Usage: python tools/check_oracle.py <sfDir> <verifyOutDir>
Compares, per query: row count, column names, and cell values (exact, after
sorting columns by name and rows by all columns).
"""
import json, os, sys, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    # driver testdata ships single-file tables; ScaleUp ladder fixtures are
    # Spark-written DIRECTORIES named t.parquet — glob their part files so
    # the oracle can gate the 10x fixture too (r17 verdict #2)
    path = f"{sf}/{t}.parquet"
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    try:
        sdf = pq.read_table(f"{out}/{name}").to_pandas()
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}"); fails += 1; continue
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        print(f"FAIL {name}: cols oracle={ocols} spark={scols}"); fails += 1; continue
    if len(odf) != len(sdf):
        print(f"FAIL {name}: rows oracle={len(odf)} spark={len(sdf)}"); fails += 1; continue
    o = odf[ocols].sort_values(ocols).reset_index(drop=True)
    s = sdf[scols].sort_values(scols).reset_index(drop=True)
    bad = None
    for c in ocols:
        ov, sv = o[c].tolist(), s[c].tolist()
        for i, (a, b) in enumerate(zip(ov, sv)):
            if a is None and b is None: continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b): continue
                if a == b: continue
                bad = (c, i, a, b); break
            # a string on one side only is a TYPE divergence the str()
            # fallback would mask (int 1 vs "1" printed identically) —
            # exactly the schema-drift class this mimic exists to pre-catch
            if isinstance(a, str) != isinstance(b, str):
                bad = (c, i, f"{a!r}(type)", f"{b!r}(type)"); break
            if str(a) != str(b):
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: col {c} row {i}: oracle={a!r} spark={b!r}"); fails += 1
    else:
        print(f"ok   {name}: {len(odf)} rows")
print(f"{'ALL OK' if fails==0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
