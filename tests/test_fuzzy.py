"""Fuzzy self-join (operators/fuzzy.py): pigeonhole completeness for
substitution edits, no false positives, blocking actually prunes, and the
blocks<=max_dist guard."""

import pytest
from pyspark.sql import functions as F

from bustub_vectordb_spark.operators.fuzzy import fuzzy_self_pairs


def _pairs(spark, names, **kw):
    df = spark.createDataFrame(list(enumerate(names)), "id bigint, name string")
    return {
        (r["id1"], r["id2"]): r["dist"]
        for r in fuzzy_self_pairs(df, "id", "name", **kw).collect()
    }


def test_substitution_pairs_complete(spark):
    """Every substitution-distance-1 pair is found regardless of WHERE the
    edit lands (first half, second half, boundary)."""
    names = ["abcdef", "Xbcdef", "abcdeX", "abcXef", "zzzzzz"]
    got = _pairs(spark, names, max_dist=1)
    assert set(got) == {(0, 1), (0, 2), (0, 3)}
    assert all(d == 1 for d in got.values())


def test_exact_duplicates_distance_zero(spark):
    got = _pairs(spark, ["same", "same", "diff"], max_dist=1)
    assert got[(0, 1)] == 0


def test_no_false_positives(spark):
    """Shared-slice candidates beyond the distance bound are verified
    away: 'abXYef' shares no... actually shares slice with none <=1."""
    got = _pairs(spark, ["abcdef", "abXYef"], max_dist=1)
    assert got == {}  # distance 2, correctly rejected by the verify


def test_blocks_guard(spark):
    df = spark.createDataFrame([(1, "x")], "id bigint, name string")
    with pytest.raises(ValueError, match="blocks > max_dist"):
        fuzzy_self_pairs(df, "id", "name", max_dist=2, blocks=2)


def test_higher_distance_with_more_blocks(spark):
    """d=2 with B=3 blocks: two substitutions cannot touch all three
    slices, so distance-2 pairs are complete."""
    names = ["abcdefghi", "XbcdefghX", "abcdefghi"[::-1]]
    got = _pairs(spark, names, max_dist=2, blocks=3)
    assert (0, 1) in got and got[(0, 1)] == 2


def test_plan_has_no_cartesian(spark, sf_dir):
    from bustub_vectordb_spark.catalog import read_table

    c = read_table(spark, sf_dir, "customer")
    plan = (
        fuzzy_self_pairs(c, "c_custkey", "c_name", max_dist=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
