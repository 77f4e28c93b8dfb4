#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate — STRICT.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>
       python3 tools/check.py --selftest

Reads each <name>/ parquet produced by graft.Verify plus oracle_sql.json,
runs the oracle in DuckDB against the sf tables, and compares the way the
driver does: columns sorted by name, every value stringified, rows sorted,
EXACT equality (no float tolerance, which round 1 proved hides real
hash failures — a Decimal '205941.60' vs float '205941.6' mismatch).

THE r13 LESSON (the mirror's own blind spot): this script used to read
the SPARK parquet back *through DuckDB* (`read_parquet(...).df()`),
which flattens DECIMAL->float64 on BOTH sides — so a raw decimal output
column that the driver stringifies '78855.80' (pyarrow preserves
Decimal) while the oracle's float renders '78855.8' passed HERE and
failed THERE (the four r13 merge rows). The spark side is now read with
pyarrow, preserving DECIMAL as Decimal and date32 as date — the types
the driver sees. `--selftest` pins the regression: a decimal fixture
MUST fail the strict compare (and records that the old DuckDB read path
would have hidden it).

THE r14 LESSON (same class, temporal): this script used to read the
ORACLE through DuckDB's `.df()` (DATE flattens to datetime64 midnight)
and compensated by stripping ' 00:00:00' on BOTH sides — so a Spark
output that wrongly produced a midnight TIMESTAMP where the oracle
yields a DATE compared equal HERE while the driver's exact stringify
(pyarrow date32 '2024-01-03' vs timestamp '2024-01-03 00:00:00') fails.
The oracle is now fetched via `.arrow()` (DATE stays date32, DECIMAL
stays Decimal — types preserved like the spark side) and the midnight
normalization is GONE; only symmetric trailing-fractional-zero trimming
remains (rendering-only: timestamp[us] vs timestamp[ns] unit noise).
`--selftest` pins this too: a midnight-timestamp-vs-DATE fixture MUST
fail the strict compare.

`--lenient` restores the old tolerant compare as a diagnostic mode.
"""
import sys, os, json, glob
import datetime
import decimal
import duckdb
import pandas as pd
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LENIENT = "--lenient" in sys.argv


def _norm_temporal(s: str) -> str:
    """Symmetric rendering canon for timestamps: drop trailing
    fractional zeros ONLY (timestamp[us] vs timestamp[ns] render the
    same instant with different fractional padding). A midnight
    timestamp stays '... 00:00:00' — distinct from a bare date — so a
    Spark TIMESTAMP where the oracle yields a DATE fails here exactly
    as the driver's exact stringify does (the r14 mirror blind spot)."""
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s


def _cell_str(x) -> str:
    if x is None:
        return "None"
    if isinstance(x, float) and np.isnan(x):
        return "nan"
    if isinstance(x, pd.Timestamp) or isinstance(x, datetime.datetime):
        if pd.isna(x):
            return "NaT"
        return _norm_temporal(x.isoformat(sep=" "))
    if isinstance(x, datetime.date):
        return x.isoformat()
    if isinstance(x, decimal.Decimal):
        return str(x)  # EXACT — '78855.80' stays '78855.80'
    if isinstance(x, (bytes, bytearray)):
        return x.hex()
    if isinstance(x, (np.ndarray, list)):
        return "[" + ", ".join(_cell_str(v) for v in x) + "]"
    return str(x)


def canon_rows(df: pd.DataFrame):
    """Driver-style canonical form: sorted column names, all values as
    strings (temporal rendering normalized, decimals exact), rows
    sorted. Returns (columns, list-of-row-tuples)."""
    df = df.reindex(sorted(df.columns), axis=1)
    cols = {}
    for c in df.columns:
        col = df[c]
        if str(col.dtype).startswith("datetime64"):
            cols[c] = [
                "NaT" if pd.isna(v)
                else _norm_temporal(v.isoformat(sep=" "))
                for v in col
            ]
        elif col.dtype == object:
            cols[c] = [_cell_str(v) for v in col]
        else:
            cols[c] = col.astype(str).tolist()
    rows = sorted(zip(*[cols[c] for c in df.columns])) if len(df.columns) \
        else []
    return list(df.columns), rows


def read_spark(files):
    """Read the Spark verify parquet the way the DRIVER does —
    pyarrow, types preserved (DECIMAL as Decimal, date32 as date) —
    NOT through DuckDB's .df() float64 flattening (check.py's r13
    blind spot)."""
    tbl = pa.concat_tables([pq.read_table(f) for f in files],
                           promote_options="permissive")
    return tbl.to_pandas()


def selftest():
    """The r13 regression, pinned: a raw DECIMAL(18,2) spark output
    vs a float oracle MUST fail the strict compare (the driver
    failed it; the old mirror said OK)."""
    import tempfile
    d = tempfile.mkdtemp(prefix="graft_checkself_")
    f = os.path.join(d, "part-0.parquet")
    pq.write_table(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "total": pa.array([decimal.Decimal("78855.80"),
                           decimal.Decimal("0.00")],
                          pa.decimal128(18, 2)),
        "order_day": pa.array([datetime.date(2024, 1, 3)] * 2,
                              pa.date32()),
    }), f)
    con = duckdb.connect()
    # oracle through .arrow() — the main-path read; DATE stays date32
    # on both sides, DECIMAL stays Decimal on both sides. The decimal
    # fixture still MUST fail: the spark side is DECIMAL(18,2) and the
    # r14 double-cast rule says the SURFACE should have cast it — the
    # strict compare vs the float oracle catches the missing cast.
    oracle = con.sql(
        "SELECT * FROM (VALUES (1, CAST(78855.80 AS DOUBLE),"
        " CAST('2024-01-03' AS DATE)), (2, CAST(0.00 AS DOUBLE),"
        " CAST('2024-01-03' AS DATE))) t(k, total, order_day)"
    ).arrow().to_pandas()
    gc, got = canon_rows(read_spark([f]))
    wc, want = canon_rows(oracle)
    assert gc == wc, f"selftest schema: {gc} vs {wc}"
    assert got != want, (
        "selftest FAILED to fail: decimal '78855.80' vs float "
        "'78855.8' compared equal — the DECIMAL blind spot is back")
    # the date column must NOT be the thing that differs (temporal
    # canon is symmetric); only the decimal cells may diverge
    diffs = [(a, b) for a, b in zip(got, want) if a != b]
    for a, b in diffs:
        assert a[1] == b[1], f"date canon diverged: {a[1]} vs {b[1]}"
        assert a[2] != b[2], f"expected decimal diff, got {a} vs {b}"
    # and record the blind spot: the OLD read path (duckdb .df() on
    # the spark parquet) flattens the DECIMAL to float64 and hides the
    # diff (it also flattens date32 to midnight datetime64 — visible
    # now that the midnight strip is gone, so compare decimals only)
    old_gc, old_got = canon_rows(
        con.sql(f"SELECT * FROM read_parquet(['{f}'])").df())
    ti = old_gc.index("total")
    assert [r[ti] for r in old_got] == [r[ti] for r in want], \
        "old duckdb-read path no longer hides the decimal diff? " \
        "(harmless, but update this note)"
    # a DOUBLE-cast spark side (the r14 fix) must PASS
    f2 = os.path.join(d, "part-1.parquet")
    pq.write_table(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "total": pa.array([78855.80, 0.00], pa.float64()),
        "order_day": pa.array([datetime.date(2024, 1, 3)] * 2,
                              pa.date32()),
    }), f2)
    _, got2 = canon_rows(read_spark([f2]))
    assert got2 == want, f"double-cast side should pass: {got2} vs {want}"
    # the r14 temporal pin: a spark MIDNIGHT TIMESTAMP where the
    # oracle yields a DATE must FAIL (the old midnight-strip canon
    # hid it; the driver's exact stringify never did)
    f3 = os.path.join(d, "part-2.parquet")
    pq.write_table(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "total": pa.array([78855.80, 0.00], pa.float64()),
        "order_day": pa.array(
            [datetime.datetime(2024, 1, 3, 0, 0, 0)] * 2,
            pa.timestamp("us")),
    }), f3)
    _, got3 = canon_rows(read_spark([f3]))
    assert got3 != want, (
        "selftest FAILED to fail: midnight timestamp vs DATE compared "
        "equal — the r14 temporal blind spot is back")
    for a, b in zip(got3, want):
        assert a[0] == b[0] and a[2] == b[2], f"only order_day may " \
            f"differ: {a} vs {b}"
        assert a[1] != b[1], f"expected temporal diff, got {a} vs {b}"
    print("selftest OK: decimal fixture fails strict compare, "
          "double-cast fixture passes, old duckdb path would have "
          "hidden the decimal diff, midnight-timestamp-vs-DATE fails")


def main():
    if "--selftest" in sys.argv:
        selftest()
        return
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
        got_df = read_spark(spark_files)
        try:
            # .arrow(), NOT .df(): DATE stays date32, DECIMAL stays
            # Decimal — the same preserved types the spark side gets
            # from pyarrow, and (per the r13/r14 lessons) the types
            # the driver's exact stringify sees
            want_df = con.sql(sql).arrow().to_pandas()
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
        n = len(read_spark(files)) if files else 0
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
