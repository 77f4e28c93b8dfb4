#!/usr/bin/env python3
"""Build an adversarial `documents` corpus for oracle-parity fuzzing.

The standard test corpus is all-lowercase, \r-free, null-free and
every doc has >= 3 tokens — properties the strict gate never
exercises. This tool assembles a scale-factor directory whose
documents table violates all of them, then the normal gate runs
against it:

    python3 tools/fuzz_corpus.py /tmp/hostile /root/testdata/sf0.001
    sbt "runMain graft.Verify /tmp/hostile /tmp/vhostile"
    python3 tools/check.py /tmp/vhostile /tmp/hostile

Expected: every oracle-checked query passes; the rows-only
near-dup/pipeline queries legitimately report EMPTY (a 12-doc corpus
has no near-duplicates) — only VALUES/SCHEMA/ROWS failures indicate
real Spark-vs-DuckDB divergence. Round 2 this caught two: \r handling
in Cleanser.normalized and NULL-text fp_roll.
"""
import shutil
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]

ROWS = [
    (0, "The Quick Brown Fox And THE lazy a dog of to is", "en", "src1"),
    (1, "", "en", "src2"),
    (2, "one", "en", "src3"),
    (3, "a  double  space   text the of", "en", "src4"),
    (4, "line one\nline two\r\nline three", "en", "src5"),
    (5, '"quoted, text" with, commas and the of a to', "en", "src6"),
    (6, None, "zh", "src7"),
    (7, "the the the the the the the the", "en", "src8"),
    (8, "el la de los y es el la de los y es", "es", "src9"),
    (9, "zzz yyy xxx www vvv uuu ttt", "zh", "src10"),
    (10, "der die das und ein der die das und ein more words here to "
         "pad this doc out", "de", "src11"),
    (11, 'Mixed CASE Text With, Commas "and" Quotes the of', "en", "src12"),
]


def main():
    out, base = Path(sys.argv[1]), Path(sys.argv[2])
    out.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        shutil.copy(base / f"{t}.parquet", out / f"{t}.parquet")
    con = duckdb.connect()
    con.sql("CREATE TABLE d(doc_id BIGINT, text VARCHAR, lang VARCHAR,"
            " source VARCHAR, n_chars BIGINT)")
    for doc_id, text, lang, source in ROWS:
        n = len(text) if text is not None else 0
        con.execute("INSERT INTO d VALUES (?, ?, ?, ?, ?)",
                    [doc_id, text, lang, source, n])
    con.sql(f"COPY d TO '{out}/documents.parquet' (FORMAT PARQUET)")
    print(f"[fuzz] wrote {out}/documents.parquet ({len(ROWS)} adversarial docs)")


if __name__ == "__main__":
    main()
