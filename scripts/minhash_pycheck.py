#!/usr/bin/env python3
"""Third-engine MinHash-LSH pair-set check (pure python + numpy + duckdb).

The `dedup_minhash_pairs` and `stream_neardup` queries hash with Spark's
xxhash64, which DuckDB cannot evaluate, so the driver's oracle gate records
them rows-only. XXH64 is a public, fully-specified integer algorithm
(https://github.com/Cyan4973/xxHash — the spec, not code, is what this
follows), so this script is the independent third engine: it reimplements
XXH64 from the spec, re-derives each query's ENTIRE pipeline (tokenize →
k-shingle → signature → bands → bucket pairs → exact-Jaccard verify) from
the documents parquet with zero shared code, and compares the resulting
pair set row-for-row against the Spark output staged by graft.Verify.

The XXH64 reimplementation is gated by embedded test vectors produced by
Spark's own XXH64 (graft.tools.HashVectors) — if the reimplementation ever
drifts from Spark's byte semantics the script fails closed.

Usage: minhash_pycheck.py [sf_dir] [verify_out_dir]
"""
import sys
import re
from decimal import Decimal, ROUND_HALF_UP

import numpy as np
import duckdb

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
LONG_MAX = (1 << 63) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def _fmix(h):
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def xxh64_long(v, seed):
    """XXH64 of one 8-byte little-endian long (Spark hashLong)."""
    v &= M64
    h = (seed + P5 + 8) & M64
    h ^= (_rotl((v * P2) & M64, 31) * P1) & M64
    h = (_rotl(h, 27) * P1 + P4) & M64
    return _fmix(h)


def xxh64_int(v, seed):
    """XXH64 of one 4-byte int (Spark hashInt)."""
    h = (seed + P5 + 4) & M64
    h ^= ((v & 0xFFFFFFFF) * P1) & M64
    h = (_rotl(h, 23) * P2 + P3) & M64
    return _fmix(h)


def xxh64_bytes(b, seed):
    """XXH64 of a byte string (Spark hashUnsafeBytes / hashUTF8String)."""
    n = len(b)
    off = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        while off + 32 <= n:
            v1 = (_rotl((v1 + int.from_bytes(b[off:off + 8], 'little') * P2) & M64, 31) * P1) & M64
            v2 = (_rotl((v2 + int.from_bytes(b[off + 8:off + 16], 'little') * P2) & M64, 31) * P1) & M64
            v3 = (_rotl((v3 + int.from_bytes(b[off + 16:off + 24], 'little') * P2) & M64, 31) * P1) & M64
            v4 = (_rotl((v4 + int.from_bytes(b[off + 24:off + 32], 'little') * P2) & M64, 31) * P1) & M64
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M64, 31) * P1) & M64
            h = (h * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while off + 8 <= n:
        k = int.from_bytes(b[off:off + 8], 'little')
        h ^= (_rotl((k * P2) & M64, 31) * P1) & M64
        h = (_rotl(h, 27) * P1 + P4) & M64
        off += 8
    if off + 4 <= n:
        h ^= (int.from_bytes(b[off:off + 4], 'little') * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        off += 4
    while off < n:
        h ^= (b[off] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        off += 1
    return _fmix(h)


def _signed(h):
    return h - (1 << 64) if h >= (1 << 63) else h


def _selftest():
    """Vectors produced by Spark's XXH64 (graft.tools.HashVectors)."""
    vecs_str = [
        ("", -7444071767201028348),
        ("a", -8582455328737087284),
        ("hello", -4367754540140381902),
        ("hello world xyz", -4050515338315231802),
        ("0123456789abcdef0123456789abcdef_tail", -6366897459234161831),
        ("日本語テスト", -7942590814827019238),
    ]
    for s, want in vecs_str:
        got = _signed(xxh64_bytes(s.encode('utf-8'), 42))
        assert got == want, f"STR {s!r}: {got} != {want}"
    assert _signed(xxh64_long(0, 42)) == -5252525462095825812
    assert _signed(xxh64_long(123456789, 42)) == 3415128141240069951
    assert _signed(xxh64_long(-1, 7)) == 8675408972835071817
    assert _signed(xxh64_int(10007, 42)) == 728125569318468670
    chain = xxh64_bytes(b"cd", xxh64_bytes(b"ab", 42))
    assert _signed(chain) == -7285194902502098777


# ---- the pipeline, re-derived from public semantics ----

# Spark: split(trim(text), "\\s+") — trim strips 0x20 only; Java \s is
# the ASCII class [ \t\n\x0B\f\r]; limit -1 keeps leading/trailing empties
_WS = re.compile(r'[ \t\n\x0b\f\r]+')


def tokens_of(text):
    return _WS.split(text.strip(' '))


def shingle_hashes(text, k):
    """Distinct xxhash64 values of the k-token shingles (chained from 42)."""
    toks = tokens_of(text)
    out = set()
    if len(toks) < k:
        return out
    tb = [t.encode('utf-8') for t in toks]
    for i in range(len(tb) - k + 1):
        h = 42
        for j in range(k):
            h = xxh64_bytes(tb[i + j], h)
        out.add(h)
    return out


# numpy-vectorized hashLong over an array of unsigned 64-bit hash values
def _hash_long_vec(v, seed):
    with np.errstate(over='ignore'):
        u = v.astype(np.uint64)
        h = np.uint64((seed + P5 + 8) & M64)
        t = u * np.uint64(P2)
        t = (t << np.uint64(31)) | (t >> np.uint64(33))
        h = h ^ (t * np.uint64(P1))
        h = ((h << np.uint64(27)) | (h >> np.uint64(37))) * np.uint64(P1) + np.uint64(P4)
        h ^= h >> np.uint64(33)
        h *= np.uint64(P2)
        h ^= h >> np.uint64(29)
        h *= np.uint64(P3)
        h ^= h >> np.uint64(32)
        return h


def signature(sh_hashes, num_hashes):
    """MinHash signature (signed longs) from a doc's shingle-hash set."""
    if not sh_hashes:
        return [LONG_MAX] * num_hashes
    arr = np.array(sorted(sh_hashes), dtype=np.uint64)
    sig = []
    for k in range(num_hashes):
        mixed = _hash_long_vec(arr, k).min()
        sig.append(_signed(int(mixed)))
    return sig


def band_buckets(sig, bands_n, rows_per_band):
    """(band, bucket) list: bucket = xxhash64(int-lit 10000+b, sig slice)."""
    out = []
    for b in range(bands_n):
        h = xxh64_int(10000 + b, 42)
        for r in range(rows_per_band):
            h = xxh64_long(sig[b * rows_per_band + r], h)
        out.append((b, _signed(h)))
    return out


def round6(x):
    """Spark round(x, 6): BigDecimal.valueOf(double) + HALF_UP."""
    return float(Decimal(repr(x)).quantize(Decimal('0.000001'), ROUND_HALF_UP))


def jaccard_pairs(pairs, sh_by_doc):
    out = set()
    for a, b in pairs:
        sa, sb = sh_by_doc[a], sh_by_doc[b]
        j = len(sa & sb) / len(sa | sb)
        out.add((a, b, round6(j)))
    return out


def load_docs(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()
    return rows


def spark_result(verify_out, name, cols):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT {', '.join(cols)} FROM read_parquet('{verify_out}/{name}/*.parquet')"
    ).fetchall()
    con.close()
    return set(rows)


def check_batch(docs, verify_out):
    """dedup_minhash_pairs: 32 hashes, 16 bands x 2, 3-shingles, minJ 0.5."""
    num_hashes, bands_n, rpb, k, min_j, max_bucket = 32, 16, 2, 3, 0.5, 1000
    sh = {d: shingle_hashes(t, k) for d, t in docs}
    buckets = {}
    for d, _ in docs:
        if not sh[d]:
            continue  # sentinel signature filtered before banding
        sig = signature(sh[d], num_hashes)
        for bb in band_buckets(sig, bands_n, rpb):
            buckets.setdefault(bb, []).append(d)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)[:max_bucket]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    expect = {p for p in jaccard_pairs(pairs, sh) if p[2] >= min_j}
    got = spark_result(verify_out, 'dedup_minhash_pairs', ['id1', 'id2', 'jaccard'])
    return expect, got


def check_stream(docs, verify_out):
    """stream_neardup: 128 hashes, 16 bands x 8, 5-shingles, minJ 0.8;
    incoming = doc_id%5==0 vs resident corpus, stream-static band join."""
    num_hashes, bands_n, rpb, k, min_j = 128, 16, 8, 5, 0.8
    sh = {d: shingle_hashes(t, k) for d, t in docs}
    in_idx, res_idx = {}, {}
    for d, _ in docs:
        # the streaming path bands every doc (no sentinel filter — the
        # stream-static join just never matches an all-MaxValue band of
        # one side unless the other side has one too)
        sig = signature(sh[d], num_hashes)
        tgt = in_idx if d % 5 == 0 else res_idx
        for bb in band_buckets(sig, bands_n, rpb):
            tgt.setdefault(bb, []).append(d)
    pairs = set()
    for bb, ins in in_idx.items():
        for a in ins:
            for b in res_idx.get(bb, ()):
                pairs.add((a, b))
    # jaccardVerify drops pairs where either side has an empty shingle set
    # (no rows in the exploded hash table -> inner joins drop the id)
    pairs = {(a, b) for a, b in pairs if sh[a] and sh[b]}
    expect = {p for p in jaccard_pairs(pairs, sh) if p[2] >= min_j}
    got = spark_result(verify_out, 'stream_neardup',
                       ['in_id', 'corpus_id', 'jaccard'])
    return expect, got


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    verify_out = sys.argv[2] if len(sys.argv) > 2 else 'target/verify_out'
    _selftest()
    print('xxh64 selftest: OK (11 Spark-produced vectors)')
    docs = load_docs(sf_dir)
    print(f'{len(docs)} documents loaded from {sf_dir}')
    ok = True
    for name, fn in (('dedup_minhash_pairs', check_batch),
                     ('stream_neardup', check_stream)):
        expect, got = fn(docs, verify_out)
        if expect == got:
            print(f'   {name}: OK ({len(got)} pairs, set-identical)')
        else:
            ok = False
            miss = sorted(expect - got)[:5]
            extra = sorted(got - expect)[:5]
            print(f'   {name}: MISMATCH expect={len(expect)} got={len(got)}')
            print(f'      missing from Spark: {miss}')
            print(f'      extra in Spark:     {extra}')
    if not ok:
        sys.exit(1)
    print('minhash third-engine: 2/2 pair sets reproduced by the '
          'independent XXH64 engine')


if __name__ == '__main__':
    main()
