#!/usr/bin/env python3
"""Independent third-engine Zarr reader: numpy + stdlib + duckdb ONLY (no
zarr-python / lz4 / crc32c packages — this sandbox lacks them). Reimplements
the PUBLIC store contracts:

  * Zarr v2: .zarray geometry, "ci.cj" / nested keys, raw | zlib | BLOSC
    chunk frames, missing-chunk fill;
  * Zarr v3: zarr.json, named data types, "c/ci/cj" (default and "."-sep)
    chunk keys, codec chains (bytes endian, transpose, gzip, blosc-lz4),
    and the sharding_indexed codec — inner-chunk (offset, nbytes) uint64-LE
    index at the shard END, all-ones sentinels for unstored inner chunks,
    index crc32c VERIFIED (pure-python Castagnoli table);
  * blosc1 frames from the public c-blosc container format, including the
    not-in-frame splits convention (try typesize splits, then 1, accept
    the parse consuming the exact compressed extent) and pure-python LZ4
    block decode from the public LZ4 block spec.

The materialized matrix is compared against a DuckDB recomputation of the
same query the Spark side ran. A pass means graft's stores conform to the
spec as a FOREIGN implementation understands it, not merely roundtrip
through graft's own reader.

Usage: zarr_pyread.py <store_dir> <sf_dir>
The store must hold the lineitem (orderkey, linenumber) -> sum(quantity)
cell matrix (the zarr_roundtrip / zarr_v3_roundtrip / zarr_blosc_roundtrip
artifacts for <sf_dir>); v2 vs v3 is auto-detected.
"""
import gzip, json, os, struct, sys, zlib

import numpy as np
import duckdb

# ---------- pure-python LZ4 block decode (public block format) ----------

def lz4_block_decompress(src, out_len):
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]; i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]; i += 1; lit += b
                if b != 255:
                    break
        out += src[i:i + lit]; i += lit
        if i >= n:
            break  # last sequence carries literals only
        off = src[i] | (src[i + 1] << 8); i += 2
        if off == 0:
            raise ValueError("lz4: zero match offset")
        ml = token & 0xF
        if ml == 15:
            while True:
                b = src[i]; i += 1; ml += b
                if b != 255:
                    break
        ml += 4
        pos = len(out) - off
        for _ in range(ml):  # byte-by-byte: overlapping matches are legal
            out.append(out[pos]); pos += 1
    if len(out) != out_len:
        raise ValueError(f"lz4: decoded {len(out)} of {out_len} bytes")
    return bytes(out)

# ---------- crc32c (Castagnoli, reflected 0x82F63B78) ----------

_CRC32C_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)

def crc32c(data):
    c = 0xFFFFFFFF
    for b in data:
        c = (c >> 8) ^ _CRC32C_TABLE[(c ^ b) & 0xFF]
    return c ^ 0xFFFFFFFF

# ---------- blosc1 frame decode (public c-blosc container format) ----------

def _unshuffle(data, typesize):
    if typesize <= 1:
        return data
    n = len(data) // typesize
    a = np.frombuffer(data[:n * typesize], dtype=np.uint8)
    out = a.reshape(typesize, n).T.reshape(-1).tobytes()
    return out + data[n * typesize:]

def _inflate_split(payload, codec, out_len):
    if codec == 1:  # lz4 / lz4hc
        return lz4_block_decompress(payload, out_len)
    if codec == 3:  # zlib
        return zlib.decompress(payload)
    raise ValueError(f"unsupported blosc inner codec {codec} for the py reader")

def _try_block(frame, start, extent, bsize, nsplits, codec):
    if bsize % nsplits != 0 or start < 16 or start + extent > len(frame):
        return None
    neblock = bsize // nsplits
    pos, out = start, bytearray()
    try:
        for _ in range(nsplits):
            if pos + 4 > start + extent:
                return None
            (c,) = struct.unpack_from("<i", frame, pos); pos += 4
            if c < 0 or pos + c > start + extent:
                return None
            if c == neblock:
                out += frame[pos:pos + neblock]
            else:
                piece = _inflate_split(frame[pos:pos + c], codec, neblock)
                if len(piece) != neblock:
                    return None
                out += piece
            pos += c
    except Exception:
        return None
    if pos - start != extent or len(out) != bsize:
        return None
    return bytes(out)

def blosc_decompress(frame):
    assert len(frame) >= 16, "blosc frame truncated"
    flags, typesize = frame[2], frame[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", frame, 4)
    assert cbytes == len(frame), f"blosc cbytes {cbytes} != {len(frame)}"
    if flags & 0x2:  # pure memcpy
        return bytes(frame[16:16 + nbytes])
    codec = (flags >> 5) & 0x7
    nblocks = (nbytes + blocksize - 1) // blocksize
    bstarts = struct.unpack_from(f"<{nblocks}I", frame, 16)
    sorted_starts = sorted(bstarts)
    out = bytearray()
    for bi, bstart in enumerate(bstarts):
        ix = sorted_starts.index(bstart)
        extent = (sorted_starts[ix + 1] if ix + 1 < nblocks else cbytes) - bstart
        bsize = min(blocksize, nbytes - bi * blocksize)
        cands = (typesize, 1) if typesize > 1 and bsize % typesize == 0 else (1,)
        block = None
        for ns in cands:
            block = _try_block(frame, bstart, extent, bsize, ns, codec)
            if block is not None:
                break
        assert block is not None, f"blosc block {bi} does not parse"
        if flags & 0x1:
            block = _unshuffle(block, typesize)
        elif flags & 0x4:
            raise ValueError("bit-shuffle not implemented in the py reader")
        out += block
    assert len(out) == nbytes
    return bytes(out)

# ---------- v3 codec chains ----------

V3_DTYPES = {"float64": "f8", "float32": "f4", "float16": "f2",
             "int64": "i8", "int32": "i4", "int16": "i2", "int8": "i1",
             "uint16": "u2", "uint8": "u1", "bool": "b1"}

def codec_chain_decode(buf, codecs, shape_rc, dtype):
    """Apply a v3 codec list in reverse to one (inner) chunk buffer,
    returning a C-order (rows, cols) ndarray."""
    rows, cols = shape_rc
    f_order = False
    endian = "<"
    for c in codecs:
        name, conf = c["name"], c.get("configuration", {})
        if name == "transpose":
            assert conf.get("order") == [1, 0], conf
            f_order = True
        elif name == "bytes":
            endian = "<" if conf.get("endian", "little") == "little" else ">"
        elif name == "gzip":
            buf = gzip.decompress(buf)
        elif name == "blosc":
            buf = blosc_decompress(buf)
        else:
            sys.exit(f"unsupported v3 codec for the py reader: {name}")
    a = np.frombuffer(buf, dtype=np.dtype(endian + dtype))
    if f_order:
        return a.reshape(cols, rows).T  # stored column-major
    return a.reshape(rows, cols)

def shard_decode(raw, chunk_rc, inner_rc, codecs, dtype, fill):
    """sharding_indexed: concatenated encoded inner chunks + uint64-LE
    (offset, nbytes) index in row-major inner-grid order + index crc32c."""
    (cr, cc), (ir, ic) = chunk_rc, inner_rc
    grid_r, grid_c = cr // ir, cc // ic
    idx_len = grid_r * grid_c * 16
    idx_off = len(raw) - idx_len - 4
    assert idx_off >= 0, "shard shorter than its index"
    idx = raw[idx_off:idx_off + idx_len]
    (stored_crc,) = struct.unpack_from("<I", raw, idx_off + idx_len)
    assert stored_crc == crc32c(idx), "shard index crc32c mismatch"
    shard = np.full((cr, cc), fill, dtype=np.dtype(dtype))
    for gi in range(grid_r):
        for gj in range(grid_c):
            off, nb = struct.unpack_from("<QQ", idx, (gi * grid_c + gj) * 16)
            if off == 0xFFFFFFFFFFFFFFFF and nb == 0xFFFFFFFFFFFFFFFF:
                continue  # unstored inner chunk == fill
            a = codec_chain_decode(raw[off:off + nb], codecs, (ir, ic), dtype)
            shard[gi * ir:(gi + 1) * ir, gj * ic:(gj + 1) * ic] = a
    return shard

# ---------- v2 / v3 store readers ----------

def read_v2(store):
    meta = json.load(open(os.path.join(store, ".zarray")))
    rows, cols = meta["shape"]
    cr, cc = meta["chunks"]
    comp = meta["compressor"]
    fill = meta["fill_value"]
    dtype = np.dtype(meta["dtype"])
    assert meta.get("order", "C") == "C"
    sep = meta.get("dimension_separator", ".")
    X = np.full((rows, cols), fill, dtype=dtype)
    read_chunks = 0
    for ci in range((rows + cr - 1) // cr):
        for cj in range((cols + cc - 1) // cc):
            p = (os.path.join(store, f"{ci}.{cj}") if sep == "."
                 else os.path.join(store, str(ci), str(cj)))
            if not os.path.exists(p):
                continue  # missing chunk == fill (the spec's contract)
            raw = open(p, "rb").read()
            if comp is None:
                buf = raw
            elif comp.get("id") == "zlib":
                buf = zlib.decompress(raw)
            elif comp.get("id") == "blosc":
                buf = blosc_decompress(raw)
            else:
                sys.exit(f"unsupported v2 compressor for the py reader: {comp}")
            a = np.frombuffer(buf, dtype=dtype).reshape(cr, cc)
            r0, c0 = ci * cr, cj * cc
            X[r0:r0 + cr, c0:c0 + cc] = a[:min(cr, rows - r0), :min(cc, cols - c0)]
            read_chunks += 1
    return X, read_chunks, fill

def parse_fill(v):
    if isinstance(v, str):
        return {"NaN": np.nan, "Infinity": np.inf, "-Infinity": -np.inf}[v]
    return v

def read_v3(store):
    meta = json.load(open(os.path.join(store, "zarr.json")))
    assert meta["zarr_format"] == 3 and meta["node_type"] == "array", meta
    shape = meta["shape"]
    assert len(shape) == 2, f"py reader handles 2-D arrays, got {shape}"
    rows, cols = shape
    cr, cc = meta["chunk_grid"]["configuration"]["chunk_shape"]
    fill = parse_fill(meta["fill_value"])
    dtype = V3_DTYPES[meta["data_type"]]
    ke = meta["chunk_key_encoding"]
    ke_sep = ke.get("configuration", {}).get("separator", "/")
    codecs = meta["codecs"]
    sharded = codecs and codecs[0]["name"] == "sharding_indexed"
    X = np.full((rows, cols), fill, dtype=np.dtype(dtype))
    read_chunks = 0
    for ci in range((rows + cr - 1) // cr):
        for cj in range((cols + cc - 1) // cc):
            if ke["name"] == "default":
                key = f"c{ke_sep}{ci}{ke_sep}{cj}"
            else:  # "v2" encoding
                key = f"{ci}{ke_sep}{cj}"
            p = os.path.join(store, *key.split("/"))
            if not os.path.exists(p):
                continue
            raw = open(p, "rb").read()
            if sharded:
                conf = codecs[0]["configuration"]
                ir, ic = conf["chunk_shape"]
                assert conf.get("index_location", "end") == "end"
                a = shard_decode(raw, (cr, cc), (ir, ic), conf["codecs"],
                                 dtype, fill)
            else:
                a = codec_chain_decode(raw, codecs, (cr, cc), dtype)
            r0, c0 = ci * cr, cj * cc
            X[r0:r0 + cr, c0:c0 + cc] = a[:min(cr, rows - r0), :min(cc, cols - c0)]
            read_chunks += 1
    return X, read_chunks, fill

# ---------- compare against the DuckDB recomputation ----------

store, sf = sys.argv[1], sys.argv[2]
if os.path.exists(os.path.join(store, "zarr.json")):
    X, read_chunks, fill = read_v3(store)
    fmt = "v3"
else:
    X, read_chunks, fill = read_v2(store)
    fmt = "v2"
rows, cols = X.shape

con = duckdb.connect()
exp = con.execute(f"""
    SELECT CAST(l_orderkey AS BIGINT) AS i, CAST(l_linenumber AS BIGINT) AS j,
           sum(l_quantity) AS v
    FROM read_parquet('{sf}/lineitem.parquet') GROUP BY 1, 2
""").fetchall()
E = np.full((rows, cols), fill, dtype=X.dtype)
for i, j, v in exp:
    E[i, j] = v
if not np.array_equal(X, E):
    diff = np.argwhere(X != E)
    sys.exit(f"MISMATCH: {len(diff)} cells differ, first {diff[:3]}")
print(f"OK ({fmt}): {read_chunks} chunks, {rows}x{cols} matrix equals the "
      f"DuckDB recomputation cell-for-cell (independent numpy reader)")
