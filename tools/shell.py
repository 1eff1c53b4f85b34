"""Interactive SQL shell over SqlEngine — the reference's `bustub-shell`
(src/tools/shell/shell.cpp) equivalent.

Usage: python tools/shell.py [--sf DIR]
Testdata tables are pre-registered as views; the reference dialect
(ARRAY [..] literals, <-> / <=> distance operators, CREATE INDEX ivfflat/
hnsw, EXPLAIN (b|p|o|s), SET/SHOW, \\dt \\di) works as-is.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR"))
    args = ap.parse_args()

    from bustub_vectordb_spark.catalog import load_tables
    from bustub_vectordb_spark.session import get_spark
    from bustub_vectordb_spark.sql import SqlEngine

    spark = get_spark("shell")
    spark.sparkContext.setLogLevel("ERROR")
    engine = SqlEngine(spark)
    if args.sf:
        for name, df in load_tables(spark, args.sf).items():
            df.createOrReplaceTempView(name)
        print(f"testdata views registered from {args.sf}")
    print("bustub-vectordb-spark shell — \\q quits, \\dt lists tables")

    buf: list[str] = []
    while True:
        try:
            line = input("... " if buf else "=> ")
        except EOFError:
            break
        if line.strip() in ("\\q", "quit", "exit"):
            break
        buf.append(line)
        joined = "\n".join(buf)
        if not (line.strip().endswith(";") or line.strip().startswith("\\")):
            continue
        buf = []
        try:
            out = engine.execute(joined)
            if out is None:
                print("ok")
            elif isinstance(out, (int, str)):
                print(out)
            else:
                out.show(50, truncate=False)
        except Exception as e:  # keep the REPL alive on bad SQL
            print(f"error: {e}")


if __name__ == "__main__":
    main()
