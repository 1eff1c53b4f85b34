"""Local replica of the driver's t2 correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB at the
given sf dir, compares row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, floats rounded to 9
significant-ish decimals before hashing to absorb fp noise).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
# lazy oracle generators (data-derived artifacts, e.g. IVF centroids) read
# the sf dir from this env var — point them at the dir under test
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if v is None:
        return "NULL"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_val(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.appName("oracle-check")
        .master(os.environ.get("ORACLE_CHECK_MASTER", "local[8]"))
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("ORACLE_CHECK_SHUFFLE_PARTITIONS", "8"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            # the driver's canonicalizer (pandas sort_values) cannot handle
            # non-scalar cells — every entry must emit atomic columns only
            # (serialize arrays via queries._vec_str / _vec_str_sql)
            from pyspark.sql.types import ArrayType, MapType, StructType

            bad = [
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if bad:
                print(f"FAIL {name}: non-scalar output columns {bad}")
                n_fail += 1
                continue
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak {name}: rows={len(srows)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(scols, srows)
        dc, dr = canon(dcols, drows)
        ok = True
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            ok = False
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            ok = False
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            ok = False
        if ok:
            print(f"PASS {name} ({len(sr)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
