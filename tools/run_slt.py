"""Mini sqllogictest runner: replay the reference's .slt files through
SqlEngine.

Supports the subset the reference's parser defines
(tools/sqllogictest/parser.cpp): `statement ok`, `statement error`,
`query [rowsort]` with `----` golden blocks. Comparison is line-wise and
order-insensitive (both sides sorted) — the reference compares sorted lines
under rowsort and our engine gives no deterministic row order without
ORDER BY, matching the driver gate's order-insensitive hash.

`+timing:xN:.label` options (the reference leaderboard protocol,
tools/sqllogictest/sqllogictest.cpp:135-167) are honored when timing is
enabled (--timing / run_slt(timing=True)): the query re-executes N extra
times with output discarded and the per-pass milliseconds print between
`<<<BEGIN` / `>>>END` markers exactly as the reference runner emits them.
With timing off (the default — test replay shouldn't be 10× slower) the
option is skipped; `ensure:` plan-shape options are always skipped (they
assert the REFERENCE optimizer's shapes — ours live in
tests/test_plan_shape.py).

Usage: python tools/run_slt.py [--timing] FILE.slt [FILE2.slt ...]
"""

from __future__ import annotations

import sys
import time


# the reference renders NULL per-type (e.g. integer_type.cpp:260); we
# normalize every typed-null token to NULL on both sides, because aggregate
# result types legitimately diverge (Spark widens sum(int)→bigint per ANSI,
# the reference keeps integer) and type-of-null is a rendering artifact
_NULL_TOKENS = {
    "integer_null", "bigint_null", "smallint_null", "tinyint_null",
    "decimal_null", "boolean_null", "varchar_null", "timestamp_null",
}


def _fmt(v, dtype: str) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return str(int(v)) if v == int(v) else repr(v)
    return str(v)


def parse_slt(path: str):
    """Yield (directive, sql, golden_lines_or_None)."""
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        if line.startswith("statement"):
            directive = line  # statement ok | statement error
            i += 1
            sql = []
            while i < len(lines) and lines[i].strip() and not lines[i].startswith("#"):
                sql.append(lines[i])
                i += 1
            yield directive, "\n".join(sql), None
        elif line.startswith("query"):
            directive = line  # query [rowsort] [+opts]
            i += 1
            sql = []
            while i < len(lines) and lines[i].strip() != "----":
                sql.append(lines[i])
                i += 1
            i += 1  # skip ----
            golden = []
            while i < len(lines) and lines[i].strip():
                golden.append(lines[i].rstrip())
                i += 1
            yield directive, "\n".join(sql), golden
        else:
            i += 1


def _run_timing(engine, sql: str, opt: str) -> list[int]:
    """Execute the reference's `+timing:xN:.label` protocol for one query:
    N discarded executions, per-pass ms, reference-format report block."""
    repeat, label = 1, ""
    for arg in opt.split(":")[1:]:
        if arg.startswith("x"):
            repeat = int(arg[1:])
        elif arg.startswith("."):
            label = arg[1:]
        else:
            raise NotImplementedError(f"unsupported timing arg: {arg}")
    durations = []
    for i in range(repeat):
        t0 = time.monotonic()
        r = engine.execute(sql)
        if hasattr(r, "collect"):
            r.collect()  # NoopWriter equivalent: execute fully, discard
        durations.append(int((time.monotonic() - t0) * 1000))
        print(f"timing pass {i + 1} complete", flush=True)
    print("<<<BEGIN")
    print(f".{label} " + " ".join(str(d) for d in durations))
    print(">>>END", flush=True)
    return durations


def run_slt(
    engine, path: str, skip_statements: tuple[str, ...] = (), timing: bool = False
) -> tuple[int, int]:
    """Run one file; returns (ok, total). Raises AssertionError on mismatch."""
    ok = total = 0
    for directive, sql, golden in parse_slt(path):
        if any(s in sql.lower() for s in skip_statements):
            continue
        total += 1
        if directive.startswith("statement error"):
            try:
                r = engine.execute(sql)
                if hasattr(r, "collect"):
                    r.collect()
            except Exception:
                ok += 1
                continue
            raise AssertionError(f"{path}: expected error for: {sql}")
        if timing:
            for opt in directive.split()[1:]:
                if opt.startswith("+timing"):
                    _run_timing(engine, sql, opt[1:])
        result = engine.execute(sql)
        if golden is None:
            if hasattr(result, "collect"):
                result.collect()  # must at least execute
            ok += 1
            continue
        if isinstance(result, int):
            got = [str(result)]
        else:
            dtypes = [t for _, t in result.dtypes]
            got = [
                " ".join(_fmt(v, t) for v, t in zip(row, dtypes))
                for row in result.collect()
            ]
        want = [
            " ".join("NULL" if tok in _NULL_TOKENS else tok for tok in g.split())
            for g in golden
        ]
        if sorted(got) != sorted(want):
            raise AssertionError(
                f"{path}: mismatch for\n{sql}\n got: {sorted(got)[:10]}\nwant: {sorted(want)[:10]}"
            )
        ok += 1
    return ok, total


def main():
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from bustub_vectordb_spark.mock_tables import register_mock_tables
    from bustub_vectordb_spark.session import get_spark
    from bustub_vectordb_spark.sql import SqlEngine, bootstrap_test_tables

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    register_mock_tables(spark)
    argv = sys.argv[1:]
    timing = "--timing" in argv
    for path in [a for a in argv if a != "--timing"]:
        # fresh engine per file — .slt files assume a clean instance
        engine = SqlEngine(spark)
        bootstrap_test_tables(engine)
        ok, total = run_slt(engine, path, timing=timing)
        print(f"{path}: {ok}/{total} ok")


if __name__ == "__main__":
    main()
