#!/usr/bin/env python3
"""Transcendental-snap parity sweep (VERDICT r11 #2).

For every oracle-checked query that rounds a float derived from a
transcendental (libm `ln`) or an order-sensitive float sum, measure how
close the ACTUAL value set comes to the rounding half-grid at the query's
snap scale, and compare against a conservative cross-engine error model:

  * libm ln: <= 2 ulp disagreement between any two correctly-rounded-ish
    libms (JVM StrictMath is fdlibm; DuckDB uses the platform libm) —
    model 4 ulp of the pre-round value, propagated through the scale;
  * float-sum reorder (ANN cosine 64-term dots): n·ulp(partial) — model
    64 ulp of 1.0 at the 1e4 snap scale;
  * sqrt / + / * / -: IEEE correctly-rounded, bit-identical in both
    engines given identical inputs — no error term at all (listed for
    completeness with margin = inf).

A query is SAFE when min_half_dist >> bound (margin = min_dist/bound).
Emits the PARITY.md table rows. Usage: parity_sweep.py <sf_dir> [...]
"""
import math, sys

import duckdb

ULP = 2.220446049250313e-16


def half_dist(scaled):
    """Distance of scaled value to the nearest k+0.5 flip boundary."""
    f = scaled - math.floor(scaled)
    return abs(f - 0.5)


def sweep(sf):
    con = duckdb.connect()
    for t in ["documents", "embeddings", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    out = []

    # --- text_tfidf: round(tf * (ln((N+1)/(df+1)) + 1), 6) ---
    rows = con.execute("""
        WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
                      FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        n AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
        SELECT tf, df, n FROM tf JOIN df USING (token) CROSS JOIN n
    """).fetchall()
    md, mb = 1e18, 0.0
    for tf, df, n in rows:
        idf = math.log((n + 1.0) / (df + 1.0)) + 1.0
        v = tf * idf * 1e6
        md = min(md, half_dist(v))
        mb = max(mb, 4 * ULP * abs(math.log((n + 1.0) / (df + 1.0))) * tf * 1e6)
    out.append(("text_tfidf", "round(tf·idf, 6)", len(rows), md, mb, "libm ln"))

    # --- report_drift: round((p-q)*ln(p/q), 6) over 5 bins. The quality
    #     binning formula lives in Scala; its integer bin COUNTS are
    #     hash-green every round, so take them from the materialized
    #     verify output (exact integers — no float provenance concern) ---
    con2 = duckdb.connect()
    try:
        got = con2.execute(
            f"SELECT ref_n, cur_n FROM read_parquet("
            f"'/root/repo/target/verify_out/report_drift/*.parquet')").fetchall()
        rt = sum(r for r, _ in got) + 5.0
        ct = sum(c for _, c in got) + 5.0
        md, mb = 1e18, 0.0
        for r, c in got:
            p, qq = (r + 1.0) / rt, (c + 1.0) / ct
            v = (p - qq) * math.log(p / qq) * 1e6
            md = min(md, half_dist(v))
            mb = max(mb, 4 * ULP * abs(p - qq) * 1e6 + 4 * ULP * abs(v))
        out.append(("report_drift", "round((p−q)·ln(p/q), 6)", len(got), md, mb,
                    "libm ln"))
    except Exception as e:
        out.append(("report_drift", "round((p−q)·ln(p/q), 6)", 0, float("nan"),
                    float("nan"), f"verify_out missing: {e}"))

    # --- sample_temperature: round(sqrt(n_min/n), 6) — sqrt is IEEE
    #     correctly-rounded, so both engines see the SAME double; distance
    #     reported anyway ---
    rows = con.execute("""
        WITH b AS (SELECT CASE
             WHEN length(string_split_regex(trim(text), '\\s+')) < 40 THEN 'short'
             WHEN length(string_split_regex(trim(text), '\\s+')) < 80 THEN 'medium'
             ELSE 'long' END AS band FROM documents),
        c AS (SELECT band, count(*) AS n FROM b GROUP BY 1)
        SELECT n, (SELECT min(n) FROM c) FROM c
    """).fetchall()
    md = min(half_dist(math.sqrt(mn / n) * 1e6) for n, mn in rows)
    out.append(("sample_temperature", "round(sqrt(n_min/n), 6)", len(rows), md,
                0.0, "IEEE sqrt: engine-identical"))

    # --- ANN cosines: round(cos, 4) for queries 0..7 against all vectors ---
    vecs = {vid: v for vid, v in con.execute(
        "SELECT vec_id, embedding FROM embeddings").fetchall()}
    qs = [vecs[i] for i in sorted(vecs) if i < 8]
    md, cnt = 1e18, 0
    for q in qs:
        qn = math.sqrt(sum(x * x for x in q))
        for vid, v in vecs.items():
            d = sum(float(a) * float(b) for a, b in zip(v, q))
            nv = math.sqrt(sum(float(x) * float(x) for x in v))
            if nv == 0 or qn == 0:
                continue
            md = min(md, half_dist(d / (nv * qn) * 1e4))
            cnt += 1
    mb = 64 * ULP * 1e4
    out.append(("ann_*_topk / ann_classify", "round(cos, 4)", cnt, md, mb,
                "64-term sum reorder"))
    return out


for sf in sys.argv[1:] or ["/root/testdata/sf0.01"]:
    print(f"\n### {sf}")
    print("| query | snap | values | min half-grid dist | error bound | margin | class |")
    print("|---|---|---|---|---|---|---|")
    for name, expr, n, md, mb, cls in sweep(sf):
        margin = "inf" if mb == 0 else (f"{md / mb:.1e}" if md == md else "n/a")
        mds = f"{md:.3e}" if md == md else "n/a"
        mbs = f"{mb:.3e}" if mb == mb else "n/a"
        print(f"| {name} | {expr} | {n} | {mds} | {mbs} | {margin} | {cls} |")
