"""Replay the reference's own sqllogictest files — golden outputs included —
through the SQL front end (tools/run_slt.py).

These .slt files ARE the reference's behavioral spec (SURVEY.md §5); passing
them verbatim is the strongest parity evidence available. Files excluded and
why:

`__mock_*` tables are reproduced exactly from their generator formulas
(bustub_vectordb_spark.mock_tables ⇐ mock_scan_executor.cpp). The `ensure:`
options on query directives assert the REFERENCE optimizer's plan shapes
(index_scan/hash_join/...) — meaningless against Catalyst and ignored here;
our own plan-shape assertions live in tests/test_plan_shape.py.

ALL 42 reference .slt files replay. The leaderboard files additionally
carry golden results (q2's `400000 149999 ...`), so the reference's exact
benchmark workload is correctness-verified here; its timing role is
bench.py's job (same query shapes at sf0.1, min-of-N methodology).

vector.03-.05 are all-`statement ok` ladders (no golden rows — the course
graded ANN recall externally); replaying them verifies the DDL surface
(ivfflat/hnsw CREATE INDEX incl. empty tables, ops classes, WITH options,
SET vector_index_method, EXPLAIN) executes end-to-end. Result-quality
parity lives in test_ivfflat / test_hnsw recall tests.

Statement-level divergence: the reference's empty-input global aggregate
yields NULL for count(expr) (course-defined initial values,
aggregation_plan.h:128-135) where ANSI/Spark define 0; min/max/sum nulls
match. We keep ANSI (the DuckDB oracle gate depends on it) and skip that
one statement in p3.07.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from run_slt import run_slt

REF_SQL = "/root/reference/test/sql"

FILES = [
    "intro.slt",
    "baby_arithmetic.slt",
    "order_by.slt",
    "subquery.slt",
    "index.slt",
    "p0.01-lower-upper.slt",
    "p0.02-function-error.slt",
    "p0.03-string-scan.slt",
    "p3.00-primer.slt",
    "p3.01-seqscan.slt",
    "p3.02-insert.slt",
    "p3.03-update.slt",
    "p3.04-delete.slt",
    "p3.05-index-scan.slt",
    "p3.06-empty-table.slt",
    "p3.07-simple-agg.slt",
    "p3.08-group-agg-1.slt",
    "p3.09-group-agg-2.slt",
    "p3.10-simple-join.slt",
    "p3.11-multi-way-join.slt",
    "p3.12-repeat-execute.slt",
    "p3.13-nested-index-join.slt",
    "p3.14-hash-join.slt",
    "p3.15-multi-way-hash-join.slt",
    "p3.16-sort-limit.slt",
    "p3.17-topn.slt",
    "p3.18-integration-1.slt",
    pytest.param("p3.19-integration-2.slt", marks=pytest.mark.slow),
    "p3.20-window-function.slt",
    "p3.leaderboard-q1.slt",
    "p3.leaderboard-q1-window.slt",
    "p3.leaderboard-q2.slt",
    "p3.leaderboard-q3.slt",
    "hash_join.slt",
    "nested_index_join.slt",
    "update.slt",
    "vector.01-insert-scan.slt",
    "vector.02-naive-knn.slt",
    "vector.03-index-selection.slt",
    "vector.04-ivfflat.slt",
    "vector.05-hnsw.slt",
    "vector.slt",
]


@pytest.fixture()
def engine(spark):
    # fresh engine per file — each .slt assumes a clean instance (the same
    # table name recurs across files with different schemas)
    from bustub_vectordb_spark.mock_tables import register_mock_tables
    from bustub_vectordb_spark.sql import SqlEngine, bootstrap_test_tables

    e = SqlEngine(spark)
    bootstrap_test_tables(e)
    register_mock_tables(spark)
    return e


SKIPS = {
    # ANSI count-on-empty = 0; the reference's stub-spec says NULL (above)
    "p3.07-simple-agg.slt": ("select count(v1) from t1",),
}


@pytest.mark.parametrize("slt", FILES)
def test_slt_file(engine, slt):
    path = os.path.join(REF_SQL, slt)
    if not os.path.exists(path):
        pytest.skip(f"{slt} not present in reference checkout")
    ok, total = run_slt(engine, path, skip_statements=SKIPS.get(slt, ()))
    assert ok == total and total > 0


def test_leaderboard_timing_protocol(engine, capsys):
    """`+timing:xN:.label` replays the reference leaderboard protocol
    (tools/sqllogictest/sqllogictest.cpp:135-167): N timed re-executions,
    per-pass progress lines, and the `<<<BEGIN / .label ms... / >>>END`
    report block — the last harness-parity gap with the reference runner.
    The golden-row check still runs after the timing passes."""
    path = os.path.join(REF_SQL, "p3.leaderboard-q2.slt")
    if not os.path.exists(path):
        pytest.skip("leaderboard file not present in reference checkout")
    ok, total = run_slt(engine, path, timing=True)
    assert ok == total and total > 0
    out = capsys.readouterr().out
    assert out.count("timing pass 10 complete") == 1
    begin = out.index("<<<BEGIN")
    block = out[begin : out.index(">>>END")].splitlines()
    # ".q2 t1 ... t10" — label verbatim, one integer-ms sample per pass
    report = block[1].split()
    assert report[0] == ".q2"
    assert len(report) == 11 and all(int(t) >= 0 for t in report[1:])
