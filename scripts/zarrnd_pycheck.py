#!/usr/bin/env python3
"""Independent third-engine reader for RANK-N zarr v2 stores (numpy +
stdlib + duckdb only — the zarr_pyread.py contract extended past rank 2).
Reads the graft `zarr_cube_roundtrip` artifact — a rank-3 v2/zlib store —
by walking the PUBLIC v2 spec: .zarray geometry of arbitrary rank,
dot-joined chunk keys, fill-padded edge chunks in C order, missing chunk
= fill. The materialized tensor is compared cell-for-cell against a
DuckDB recomputation of the same lineitem cube aggregate, so a pass means
a FOREIGN implementation agrees with both the store bytes and the values.

Usage: zarrnd_pycheck.py <store_dir> <sf_dir>
"""
import json, os, sys, zlib

import numpy as np
import duckdb

DTYPES = {"<f8": "<f8", "<f4": "<f4", "<i8": "<i8", "<i4": "<i4"}


def read_v2_nd(store):
    with open(os.path.join(store, ".zarray")) as f:
        meta = json.load(f)
    assert meta["zarr_format"] == 2, meta
    assert meta.get("order", "C") == "C", "C-order only"
    shape = [int(x) for x in meta["shape"]]
    chunks = [int(x) for x in meta["chunks"]]
    assert len(shape) == len(chunks) and len(shape) >= 3, (shape, chunks)
    comp = meta.get("compressor")
    assert comp is None or comp.get("id") == "zlib", comp
    dt = np.dtype(DTYPES[meta["dtype"]])
    fill = meta.get("fill_value", 0) or 0
    sep = meta.get("dimension_separator", ".")
    grid = [(s + c - 1) // c for s, c in zip(shape, chunks)]
    out = np.full(shape, float(fill), dtype="f8")
    celems = int(np.prod(chunks))

    def walk(prefix):
        if len(prefix) == len(grid):
            key = sep.join(str(c) for c in prefix)
            p = os.path.join(store, *key.split("/")) if sep == "/" else \
                os.path.join(store, key)
            if not os.path.exists(p):
                return  # missing chunk reads as fill
            raw = open(p, "rb").read()
            if comp is not None:
                raw = zlib.decompress(raw)
            a = np.frombuffer(raw, dtype=dt)
            assert a.size == celems, (a.size, celems, "edge chunks are padded")
            a = a.reshape(chunks).astype("f8")
            sel_out, sel_in = [], []
            for d, c in enumerate(prefix):
                lo = c * chunks[d]
                hi = min(lo + chunks[d], shape[d])
                sel_out.append(slice(lo, hi))
                sel_in.append(slice(0, hi - lo))
            out[tuple(sel_out)] = a[tuple(sel_in)]
            return
        for c in range(grid[len(prefix)]):
            walk(prefix + [c])

    walk([])
    return out


def main():
    store, sf = sys.argv[1], sys.argv[2]
    X = read_v2_nd(store)
    con = duckdb.connect()
    rows = con.execute(f"""
        SELECT CAST(l_orderkey % 32 AS BIGINT) AS i0,
               CAST(l_linenumber % 8 AS BIGINT) AS i1,
               CAST(l_suppkey % 6 AS BIGINT) AS i2,
               CAST(sum(l_quantity) AS DOUBLE) AS v
        FROM read_parquet('{sf}/lineitem.parquet') GROUP BY 1, 2, 3
    """).fetchall()
    want = np.zeros(X.shape, dtype="f8")
    for i0, i1, i2, v in rows:
        want[int(i0), int(i1), int(i2)] = v
    assert X.shape == want.shape, (X.shape, want.shape)
    bad = np.argwhere(X != want)
    assert bad.size == 0, f"{bad.shape[0]} mismatching cells, first {bad[:3]}"
    nz = int(np.count_nonzero(X))
    print(f"   rank-3 cube: OK ({X.shape} tensor, {nz} non-fill cells, "
          f"cell-identical to DuckDB)")


if __name__ == "__main__":
    main()
