#!/usr/bin/env python
"""Local mimic of the driver's t2 gate: run Verify output vs DuckDB oracle.

Usage: python tools/check_oracle.py <sfDir> <verifyOutDir> [--json out.json]
Compares, per query: row count, column names, and cell values (exact, after
sorting columns by name and rows by all columns). With --json, also writes a
machine-readable per-query result map (the SCALE_r*.json building block —
r18 verdict #3: ladder-gate evidence must be a committed artifact, not
round-log prose).

Connected-components queries (CC_DERIVED below: dd08's semantic clusters,
dd06's text clusters) get a second, always-feasible oracle: their
recursive reachability CTE enumerates (node, reachable-root) pairs —
quadratic in component size — and OOMs DuckDB at the 30x ladder fixture's
giant component (r18 verdict #1). Union-find over the SAME pair set is
linear and exact, so each is always gated against it; the SQL oracle runs
IN ADDITION whenever its walk-state estimate fits the budget (all driver
scales), keeping this tool a faithful pre-check of the driver's own
DuckDB gate there.
"""
import json, os, re, sys, math
from collections import Counter
import duckdb
import pyarrow.parquet as pq
import pandas as pd

args = [a for a in sys.argv[1:] if not a.startswith("--")]
sf, out = args[0], args[1]
json_out = None
if "--json" in sys.argv:
    json_out = sys.argv[sys.argv.index("--json") + 1]
# above this sum-of-squared-component-sizes the recursive reachability
# oracle's walk state is DuckDB-infeasible (the 30x fixture OOMed a 32 GiB
# allocation at ~1e9); under it the SQL oracle runs alongside union-find
WALK_BUDGET = float(os.environ.get("ORACLE_WALK_BUDGET", 2e8))

con = duckdb.connect()
# bounded SPILL: an infeasible oracle (e.g. a recursive CTE quadratic in
# component size) must fail LOUDLY, not fill the disk — gr01's 30x
# PageRank oracle spilled >77 GB of temp before dying (r19). Memory stays
# generous (the 30x CC oracles legitimately hold tens of GB; a 48 GB cap
# sent dd06@30x into spill-thrash, 3x slower) — the DISK is what the
# guard protects.
con.sql("SET memory_limit='80GB'")
con.sql("SET max_temp_directory_size='20GB'")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    # driver testdata ships single-file tables; ScaleUp ladder fixtures are
    # Spark-written DIRECTORIES named t.parquet — glob their part files so
    # the oracle can gate the 10x fixture too (r17 verdict #2). Recursive
    # glob so a partitioned layout is also found (r18 ADVICE).
    path = f"{sf}/{t}.parquet"
    src = f"{path}/**/*.parquet" if os.path.isdir(path) else path
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
results = {}


def compare(name, odf, sdf, label="oracle"):
    """Exact compare (cols, rows, every cell); returns error string or None."""
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        return f"cols {label}={ocols} spark={scols}"
    if len(odf) != len(sdf):
        return f"rows {label}={len(odf)} spark={len(sdf)}"
    o = odf[ocols].sort_values(ocols).reset_index(drop=True)
    s = sdf[scols].sort_values(scols).reset_index(drop=True)
    for c in ocols:
        for i, (a, b) in enumerate(zip(o[c].tolist(), s[c].tolist())):
            if a is None and b is None: continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b): continue
                if a == b: continue
                return f"col {c} row {i}: {label}={a!r} spark={b!r}"
            # a string on one side only is a TYPE divergence the str()
            # fallback would mask (int 1 vs "1" printed identically) —
            # exactly the schema-drift class this mimic exists to pre-catch
            if isinstance(a, str) != isinstance(b, str):
                return f"col {c} row {i}: {label}={a!r}(type) spark={b!r}(type)"
            if str(a) != str(b):
                return f"col {c} row {i}: {label}={a!r} spark={b!r}"
    return None


# Connected-components queries whose recursive SQL oracle is quadratic in
# component size: each gets the linear union-find gate. `pairs_from` names
# the dumped oracle whose RESULT is the pair set (dd07 is dd08's regenerated
# pairs CTE; dd02 is dd06's shingle-candidate Jaccard pairs — both by
# construction, the engine splices one generator into both sides).
CC_DERIVED = {
    "dd08_semantic_clusters": {
        "pairs_from": "dd07_embedding_lsh_neardup",
        "universe": "SELECT vec_id FROM embeddings",
        "id_col": "vec_id", "keep": True},
    "dd06_dedup_clusters": {
        "pairs_from": "dd02_minhash_lsh",
        "universe": "SELECT doc_id FROM documents",
        "id_col": "doc_id", "keep": False},
}


def pairs_sql_for(name, oracle):
    """The pair-set SQL behind a CC query's clustering, at the dump's
    geometry. Preferred source: the dumped pair-query oracle (see
    CC_DERIVED). Fallback for a subset dump without it: extract the CTE
    chain between WITH RECURSIVE and the edges CTE from the CC query's
    own SQL — `pairs` is always the chain's final CTE.
    """
    psql = oracle.get(CC_DERIVED[name]["pairs_from"])
    if psql is not None:
        return psql
    m = re.search(r"WITH\s+RECURSIVE\s+(.*?),\s*edges\s+AS",
                  oracle[name], re.S)
    if not m:
        raise ValueError(f"cannot extract pairs CTE from {name} oracle SQL")
    return f"WITH {m.group(1)}\nSELECT id1, id2 FROM pairs"


def union_find_clusters(pairs, ids):
    """Min-label connected components: cluster_id = MIN(id) in component.

    Path-halving find; union always keeps the SMALLER root as root, so by
    induction every final root is its component's minimum id — exactly the
    MIN(reachable) the recursive SQL oracle computes, in O(E α(N)).
    """
    parent = {int(i): int(i) for i in ids}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra < rb: parent[rb] = ra
            else: parent[ra] = rb
    return {i: find(i) for i in parent}


def cc_expected(name):
    """A CC query's expected output via union-find over its pair set."""
    spec = CC_DERIVED[name]
    pdf = con.sql(pairs_sql_for(name, oracle)).df()
    ids = con.sql(spec["universe"]).df().iloc[:, 0].tolist()
    roots = union_find_clusters(zip(pdf["id1"], pdf["id2"]), ids)
    sizes = Counter(roots.values())
    df = pd.DataFrame({spec["id_col"]: [int(i) for i in ids]})
    df["cluster_id"] = df[spec["id_col"]].map(roots)
    df["cluster_size"] = df["cluster_id"].map(sizes)
    if spec["keep"]:
        df["keep"] = (df[spec["id_col"]] == df["cluster_id"]).astype("int64")
    # walk-state estimate for the SQL oracle: the recursive CTE's UNION
    # set is one (node, root) row per reachable pair — sum of size^2
    walk_state = sum(s * s for s in sizes.values())
    return df, walk_state


fails = 0
for name, sql in sorted(oracle.items()):
    spark_rows = None
    try:
        sdf = pq.read_table(f"{out}/{name}").to_pandas()
        spark_rows = len(sdf)
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}")
        results[name] = {"status": "fail", "detail": f"spark result missing: {e}"}
        fails += 1; continue

    checks = []  # (label, error-or-None)
    if name in CC_DERIVED:
        try:
            udf, walk_state = cc_expected(name)
            checks.append(("union-find", compare(name, udf, sdf, "uf")))
        except Exception as e:
            checks.append(("union-find", f"uf oracle error: {e}"))
            walk_state = 0
        if walk_state <= WALK_BUDGET:
            try:
                checks.append(("sql", compare(name, con.sql(sql).df(), sdf)))
            except Exception as e:
                checks.append(("sql", f"oracle error: {e}"))
        else:
            print(f"note {name}: sql oracle skipped — recursive walk state "
                  f"~{walk_state:.2e} exceeds budget {WALK_BUDGET:.0e} "
                  f"(union-find gate is exact)")
    else:
        try:
            checks.append(("sql", compare(name, con.sql(sql).df(), sdf)))
        except Exception as e:
            checks.append(("sql", f"oracle error: {e}"))

    errs = [(lbl, e) for lbl, e in checks if e is not None]
    gates = "+".join(lbl for lbl, _ in checks)
    if errs:
        for lbl, e in errs:
            print(f"FAIL {name} [{lbl}]: {e}")
        results[name] = {"status": "fail", "rows": spark_rows,
                         "gates": gates, "detail": "; ".join(e for _, e in errs)}
        fails += 1
    else:
        print(f"ok   {name}: {spark_rows} rows [{gates}]")
        results[name] = {"status": "exact", "rows": spark_rows, "gates": gates}

if json_out:
    with open(json_out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
print(f"{'ALL OK' if fails==0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
