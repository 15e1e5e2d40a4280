#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(`sbt "runMain graft.Verify <sfDir> <outDir>"`), then this script compares
each result parquet against the DuckDB oracle SQL, sorting columns by name
and rows by all columns, and reports per-query match + max numeric diff."""
import json, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # testdata ships single-file tables; replicas (ScaleUp) are Spark
    # parquet DIRECTORIES — glob the data files in that case
    p = f"{sf_dir}/{t}.parquet"
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out_dir)):
    p = os.path.join(out_dir, name)
    if not os.path.isdir(p):
        continue
    got = con.execute(f"SELECT * FROM read_parquet('{p}/*.parquet')").fetchdf()
    got = got[sorted(got.columns)]
    if name not in oracle:
        results[name] = f"rows-only: {len(got)} rows " + ("OK" if len(got) > 0 else "EMPTY!")
        continue
    try:
        # Representation gate: the driver hashes DuckDB's PHYSICAL output types,
        # so an uncast sum() that widens to HUGEINT (or a DECIMAL) hash-mismatches
        # a value-identical BIGINT/DOUBLE Spark column. Catch it locally.
        desc = con.execute(f"DESCRIBE {oracle[name]}").fetchdf()
        badty = [(r["column_name"], r["column_type"]) for _, r in desc.iterrows()
                 if r["column_type"].startswith(("HUGEINT", "UHUGEINT", "DECIMAL"))]
        if badty:
            results[name] = f"ORACLE TYPE GATE: cast these to BIGINT/DOUBLE: {badty}"
            continue
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE SQL ERROR: {e}"
        continue
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        results[name] = f"SCHEMA MISMATCH: got {list(got.columns)} vs exp {list(exp.columns)}"
        continue
    if len(got) != len(exp):
        results[name] = f"ROWCOUNT MISMATCH: got {len(got)} vs exp {len(exp)}"
        continue
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    bad = None
    for c in gs.columns:
        gcol, ecol = gs[c], es[c]
        if gcol.dtype.kind == "f" or ecol.dtype.kind == "f":
            import numpy as np
            g = gcol.astype(float).to_numpy()
            e = ecol.astype(float).to_numpy()
            m = ~(np.isnan(g) & np.isnan(e))
            diff = abs(g[m] - e[m])
            if len(diff) and diff.max() > 0:
                bad = f"col {c} max float diff {diff.max():.2e}"
                if diff.max() > 1e-12:
                    break
                bad = None
        else:
            neq = (gcol.astype(str) != ecol.astype(str))
            if neq.any():
                i = neq.idxmax()
                bad = f"col {c} differs at sorted row {i}: {gcol[i]!r} vs {ecol[i]!r}"
                break
    results[name] = bad if bad else f"OK ({len(got)} rows)"

n_ok = sum(1 for v in results.values() if v.startswith("OK") or "rows-only" in v and "EMPTY" not in v)
for k, v in results.items():
    flag = "  " if (v.startswith("OK") or ("rows-only" in v and "EMPTY" not in v)) else "XX"
    print(f"{flag} {k}: {v}")
print(f"\n{n_ok}/{len(results)} green")
missing = set(oracle) - set(results)
if missing:
    print("oracle entries with no result dir:", sorted(missing))
