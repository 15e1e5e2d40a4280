#!/usr/bin/env python3
"""Independent third-engine Zarr v2 reader: numpy + zlib + json ONLY (no
zarr-python, which this sandbox lacks). Reimplements the v2 chunk-store
contract from the public spec — .zarray geometry, "ci.cj" / nested keys,
raw | zlib | (store-level) missing-chunk fill — and compares the
materialized matrix against a DuckDB recomputation of the same query the
Spark side ran. A pass means graft's stores conform to the spec as a
FOREIGN implementation understands it, not merely roundtrip through
graft's own reader.

Usage: zarr_pyread.py <store_dir> <sf_dir>
The store must be the zarr_roundtrip artifact for <sf_dir> (lineitem
(orderkey, linenumber) -> sum(quantity) cells).
"""
import json, os, sys, zlib

import numpy as np
import duckdb

store, sf = sys.argv[1], sys.argv[2]
meta = json.load(open(os.path.join(store, ".zarray")))
assert meta["zarr_format"] == 2, meta
rows, cols = meta["shape"]
cr, cc = meta["chunks"]
comp = meta["compressor"]
fill = meta["fill_value"]
dtype = np.dtype(meta["dtype"])
assert meta.get("order", "C") == "C"
sep = meta.get("dimension_separator", ".")

X = np.full((rows, cols), fill, dtype=dtype)
grid_r = (rows + cr - 1) // cr
grid_c = (cols + cc - 1) // cc
read_chunks = 0
for ci in range(grid_r):
    for cj in range(grid_c):
        p = (os.path.join(store, f"{ci}.{cj}") if sep == "."
             else os.path.join(store, str(ci), str(cj)))
        if not os.path.exists(p):
            continue  # missing chunk == fill (the spec's contract)
        raw = open(p, "rb").read()
        if comp is None:
            buf = raw
        elif comp.get("id") == "zlib":
            buf = zlib.decompress(raw)
        else:
            sys.exit(f"unsupported compressor for the numpy reader: {comp}")
        a = np.frombuffer(buf, dtype=dtype).reshape(cr, cc)
        r0, c0 = ci * cr, cj * cc
        X[r0:r0 + cr, c0:c0 + cc] = a[:min(cr, rows - r0), :min(cc, cols - c0)]
        read_chunks += 1

con = duckdb.connect()
exp = con.execute(f"""
    SELECT CAST(l_orderkey AS BIGINT) AS i, CAST(l_linenumber AS BIGINT) AS j,
           sum(l_quantity) AS v
    FROM read_parquet('{sf}/lineitem.parquet') GROUP BY 1, 2
""").fetchall()
bad = 0
E = np.full((rows, cols), fill, dtype=dtype)
for i, j, v in exp:
    E[i, j] = v
if not np.array_equal(X, E):
    diff = np.argwhere(X != E)
    sys.exit(f"MISMATCH: {len(diff)} cells differ, first {diff[:3]}")
print(f"OK: {read_chunks} chunks, {rows}x{cols} matrix equals the DuckDB "
      f"recomputation cell-for-cell (independent numpy reader)")
