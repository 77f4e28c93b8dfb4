#!/usr/bin/env python3
"""Single-discount vs modified Kneser-Ney on the real corpus.

The r8 plan conditions a modified-KN operator (per-count discounts
D1/D2/D3+, Chen & Goodman 1998) on evidence that the shipped
single-discount interpolated form (LanguageModel.kneserNey, D=0.75)
actually degrades on this corpus. This script IS that comparison:
same reference slice (doc_id % 5 == 0), same normalization as the
Spark side (the oracle normSql), same smoothed continuation
distribution; scores every held-out bigram event under both forms
and reports

  - held-out mean ln p (the q103 metric, corpus level),
  - per-document avg-logp Spearman rank agreement (q103's consumers
    rank documents, so rank movement is what would matter),
  - the estimated discounts next to the fixed 0.75.

Usage: python3 tools/mkn_compare.py [sf_dir ...]
"""
import math
import sys

import duckdb

NORM = ("lower(trim(replace(replace(replace(replace(text, chr(13), ' '), "
        "chr(10), ' '), '\"', ''), ',', '')))")


def events(con, sf, ref):
    side = "= 0" if ref else "<> 0"
    return con.sql(f"""
        WITH t AS (SELECT doc_id, string_split({NORM}, ' ') w
                   FROM read_parquet('{sf}/documents.parquet')),
        g AS (SELECT doc_id, w, len(w) n FROM t WHERE len(w) >= 2)
        SELECT doc_id, w[i+1] w1, w[i+2] w2
        FROM g, LATERAL (SELECT unnest(generate_series(0, n - 2)) i)
        WHERE doc_id % 5 {side}
    """).fetchall()


def compare(sf):
    con = duckdb.connect()
    ref = events(con, sf, ref=True)
    held = events(con, sf, ref=False)

    c12, c1, left, right = {}, {}, {}, {}
    for _, w1, w2 in ref:
        c12[(w1, w2)] = c12.get((w1, w2), 0) + 1
        c1[w1] = c1.get(w1, 0) + 1
    for (w1, w2) in c12:
        left[w2] = left.get(w2, 0) + 1
        right[w1] = right.get(w1, 0) + 1
    # count-of-counts over bigram TYPES -> the closed-form discounts
    n = [0] * 5
    for c in c12.values():
        if c <= 4:
            n[c] += 1
    y = n[1] / (n[1] + 2 * n[2]) if (n[1] + 2 * n[2]) else 0.5
    d1 = max(1 - 2 * y * n[2] / n[1], 0.0) if n[1] else 0.5
    d2 = max(2 - 3 * y * n[3] / n[2], 0.0) if n[2] else 1.0
    d3 = max(3 - 4 * y * n[4] / n[3], 0.0) if n[3] else 1.5
    # per-w1 type counts at each discount level
    n1w, n2w, n3w = {}, {}, {}
    for (w1, _), c in c12.items():
        b = n1w if c == 1 else n2w if c == 2 else n3w
        b[w1] = b.get(w1, 0) + 1

    total_types = len(c12)
    v2 = len(left)
    alpha, d_single = 0.1, 0.75

    def pcont(w2):
        return (left.get(w2, 0) + alpha) / (total_types + alpha * v2)

    def p_single(w1, w2):
        cu = c1.get(w1)
        if cu is None:
            return pcont(w2)
        cb = c12.get((w1, w2), 0)
        return (max(cb - d_single, 0.0) / cu
                + d_single * right.get(w1, 0) / cu * pcont(w2))

    def p_mod(w1, w2):
        cu = c1.get(w1)
        if cu is None:
            return pcont(w2)
        cb = c12.get((w1, w2), 0)
        disc = 0.0 if cb == 0 else d1 if cb == 1 else d2 if cb == 2 else d3
        gamma = (d1 * n1w.get(w1, 0) + d2 * n2w.get(w1, 0)
                 + d3 * n3w.get(w1, 0)) / cu
        return max(cb - disc, 0.0) / cu + gamma * pcont(w2)

    tot_s = tot_m = 0.0
    by_doc = {}
    for doc, w1, w2 in held:
        ls, lm = math.log(p_single(w1, w2)), math.log(p_mod(w1, w2))
        tot_s += ls
        tot_m += lm
        s, m, k = by_doc.get(doc, (0.0, 0.0, 0))
        by_doc[doc] = (s + ls, m + lm, k + 1)

    def ranks(idx):
        avg = sorted((v[idx] / v[2], d) for d, v in by_doc.items())
        return {d: i for i, (_, d) in enumerate(avg)}
    rs, rm = ranks(0), ranks(1)
    nd = len(by_doc)
    rho = 1 - 6 * sum((rs[d] - rm[d]) ** 2 for d in by_doc) / (
        nd * (nd * nd - 1))

    print(f"sf_dir={sf}")
    print(f"  bigram types={total_types} n1..n4={n[1:]} "
          f"Y={y:.4f} D1={d1:.4f} D2={d2:.4f} D3+={d3:.4f} "
          f"(single fixed D={d_single})")
    print(f"  held-out events={len(held)} docs={nd}")
    print(f"  mean ln p  single={tot_s / len(held):.6f}  "
          f"modified={tot_m / len(held):.6f}  "
          f"delta={(tot_m - tot_s) / len(held):+.6f}")
    print(f"  per-doc avg-logp Spearman rho={rho:.6f}")
    flips = sum(1 for d in by_doc for e in by_doc
                if d < e and (rs[d] - rs[e]) * (rm[d] - rm[e]) < 0)
    pairs = nd * (nd - 1) // 2
    print(f"  rank inversions={flips}/{pairs} ({flips / pairs:.4%})")


if __name__ == "__main__":
    for sf in (sys.argv[1:] or ["/root/testdata/sf0.01"]):
        compare(sf)
