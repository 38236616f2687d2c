#!/usr/bin/env python
"""sf0.1 oracle sweep -> CORRECTNESS_sf01.json (same shape as the driver's
CORRECTNESS_rN artifact: per-query rows/schema/hash match).

Usage: python tools/sweep_oracle.py <sfDir> <verifyOutDir> <outJson>
"""
import json, os, sys, math
import duckdb
import pyarrow.parquet as pq

sf, out, dest = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    # same dir-glob fallback as check_oracle.py: ladder fixtures are
    # Spark-written DIRECTORIES named t.parquet (recursive, so a
    # partitioned layout is found too — r18 ADVICE)
    path = f"{sf}/{t}.parquet"
    src = f"{path}/**/*.parquet" if os.path.isdir(path) else path
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
report = {}
fails = 0
for name, sql in sorted(oracle.items()):
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    report[name] = rec
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        rec["err"] = f"oracle error: {e}"[:200]; fails += 1; continue
    try:
        sdf = pq.read_table(f"{out}/{name}").to_pandas()
    except Exception as e:
        rec["err"] = f"spark result missing: {e}"[:200]; fails += 1; continue
    rec["spark_rows"], rec["oracle_rows"] = len(sdf), len(odf)
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    rec["schema_match"] = ocols == scols
    rec["rows_match"] = len(odf) == len(sdf)
    if not (rec["schema_match"] and rec["rows_match"]):
        fails += 1; continue
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
            if str(a) != str(b):
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        c, i, a, b = bad
        rec["err"] = f"cell mismatch col={c} row={i}: oracle={a!r} spark={b!r}"[:200]
        fails += 1
    else:
        rec["hash_match"] = True

ok = sum(1 for r in report.values() if r["hash_match"])
json.dump(report, open(dest, "w"), indent=1)
print(f"{ok}/{len(report)} hash-green -> {dest}")
sys.exit(1 if fails else 0)
