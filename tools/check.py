#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate — STRICT.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet produced by graft.Verify plus oracle_sql.json,
runs the oracle in DuckDB against the sf tables, and compares the way the
driver does: columns sorted by name, every value stringified, rows sorted,
EXACT equality (no float tolerance, which round 1 proved hides real
hash failures — a Decimal '205941.60' vs float '205941.6' mismatch).

`--lenient` restores the old tolerant compare as a diagnostic mode.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

LENIENT = "--lenient" in sys.argv


def canon_rows(df: pd.DataFrame):
    """Driver-style canonical form: sorted column names, all values as
    strings, rows sorted. Returns (columns, list-of-row-tuples)."""
    df = df.reindex(sorted(df.columns), axis=1)
    s = df.astype(str)
    rows = sorted(map(tuple, s.itertuples(index=False, name=None)))
    return list(df.columns), rows


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir, sf_dir = args[0], args[1]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok = fail = 0
    # q_dedup_embedding_strict's static oracle encodes the (8 bands x
    # 8 bits) autoBandConfig rung (n < 16000). Assert the graded corpus
    # still lands on that rung BEFORE comparing, so testdata growth
    # past the boundary fails loudly instead of silently hash-mismatching.
    if "q_dedup_embedding_strict" in oracles:
        n_vec = con.sql("SELECT count(*) + 5 FROM embeddings").fetchone()[0]
        if n_vec >= 16000:  # mirror of Similarity.autoBandConfig
            print(f"RUNG!    q_dedup_embedding_strict: corpus has {n_vec} "
                  f"vectors (incl. 5 planted) >= 16000 — Spark takes a "
                  f"higher rung than the static (8,8) oracle")
            fail += 1
            del oracles["q_dedup_embedding_strict"]
    # q_pq_encode_seeded's oracle slices 8 subvectors of 8 dims each:
    # true only while embeddings are 64-dim (Spark's side derives
    # dsub = dim/8, so a dim change silently shifts BOTH sides apart).
    # Guard loudly, RUNG!-style.
    if "q_pq_encode_seeded" in oracles:
        dim = con.sql(
            "SELECT len(embedding) FROM embeddings LIMIT 1").fetchone()[0]
        if dim != 64:
            print(f"DIM!     q_pq_encode_seeded: embeddings are {dim}-dim, "
                  f"the 8x8 subspace oracle assumes 64")
            fail += 1
            del oracles["q_pq_encode_seeded"]
    # q_multimodal_bytefold's oracle equates ord(char) with the utf-8
    # BYTE and length(chars) with length(bytes) — true only on an
    # all-ASCII corpus. Guard loudly (the RUNG! pattern) so a future
    # non-ASCII doc in testdata fails here, not as an opaque hash
    # mismatch.
    if "q_multimodal_bytefold" in oracles:
        n_nonascii = con.sql(
            r"SELECT count(*) FROM documents "
            r"WHERE regexp_matches(text, '[^\x00-\x7F]')").fetchone()[0]
        if n_nonascii > 0:
            print(f"ASCII!   q_multimodal_bytefold: {n_nonascii} docs have "
                  f"non-ASCII text — the ord==byte oracle equivalence no "
                  f"longer holds on this corpus")
            fail += 1
            del oracles["q_multimodal_bytefold"]
    for name in sorted(oracles):
        sql = oracles[name]
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"MISSING  {name}: no spark output"); fail += 1; continue
        got_df = con.sql(f"SELECT * FROM read_parquet({spark_files!r})").df()
        try:
            want_df = con.sql(sql).df()
        except Exception as e:
            print(f"ORACLE!  {name}: {e}"); fail += 1; continue
        gc, got = canon_rows(got_df)
        wc, want = canon_rows(want_df)
        if gc != wc:
            print(f"SCHEMA   {name}: spark={gc} oracle={wc}")
            fail += 1; continue
        if len(got) != len(want):
            print(f"ROWS     {name}: spark={len(got)} oracle={len(want)}")
            fail += 1; continue
        if got != want:
            if LENIENT and lenient_equal(got_df, want_df):
                print(f"OK~LEN   {name} ({len(got)} rows) — strict hash would FAIL")
                ok += 1; continue
            bad = [i for i, (a, b) in enumerate(zip(got, want)) if a != b][:3]
            print(f"VALUES   {name}: {len([1 for a,b in zip(got,want) if a!=b])} rows differ")
            for i in bad:
                print(f"  spark : {got[i]}")
                print(f"  oracle: {want[i]}")
            fail += 1
        else:
            print(f"OK       {name} ({len(got)} rows)")
            ok += 1
    # queries with no oracle: rows-only. Use the manifest when present
    # so a rows-only query whose output dir is MISSING still fails the
    # gate (directory listing alone cannot see it).
    manifest = os.path.join(out_dir, "queries.json")
    if os.path.exists(manifest):
        dirs = json.load(open(manifest))
    else:
        dirs = [d for d in os.listdir(out_dir)
                if os.path.isdir(os.path.join(out_dir, d))]
    for name in sorted(set(dirs) - set(oracles)):
        if not os.path.isdir(os.path.join(out_dir, name)):
            print(f"MISSING  {name}: no spark output"); fail += 1; continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        n = len(con.sql(f"SELECT * FROM read_parquet({files!r})").df()) if files else 0
        print(f"{'ROWSONLY' if n > 0 else 'EMPTY!  '} {name} ({n} rows)")
        ok += 1 if n else 0
        fail += 0 if n else 1
    print(f"== {ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


def lenient_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    a = a.reindex(sorted(a.columns), axis=1).sort_values(by=list(sorted(a.columns))).reset_index(drop=True)
    b = b.reindex(sorted(b.columns), axis=1).sort_values(by=list(sorted(b.columns))).reset_index(drop=True)
    for c in a.columns:
        x, y = a[c], b[c]
        if str(x.dtype).startswith("float") or str(y.dtype).startswith("float"):
            if not np.allclose(x.astype(float), y.astype(float),
                               rtol=0, atol=1e-9, equal_nan=True):
                return False
        elif not x.astype(str).equals(y.astype(str)):
            return False
    return True


if __name__ == "__main__":
    main()
