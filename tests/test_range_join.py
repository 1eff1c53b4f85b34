"""Band and interval join semantics (operators/range_join.py): boundary
inclusion, negative times, keys, long intervals, no-duplicate pairs, and
the no-cartesian plan shape."""

import io
from contextlib import redirect_stdout

import pytest

from bustub_vectordb_spark.operators.range_join import band_join, interval_point_join


@pytest.fixture(scope="module")
def lhs(spark):
    return spark.createDataFrame(
        [(1, 0), (2, 100), (3, -50), (4, 1000)], "lid int, lt bigint"
    )


@pytest.fixture(scope="module")
def rhs(spark):
    return spark.createDataFrame(
        [(10, 100), (11, 201), (12, -151), (13, 0)], "rid int, rt bigint"
    )


def test_band_join_boundaries(lhs, rhs):
    out = {
        (r["lid"], r["rid"])
        for r in band_join(lhs, rhs, "lt", "rt", 100).collect()
    }
    # lt=0: rt=100 (|Δ|=100 inclusive), rt=0, rt=-151 is 151 away (out)
    # lt=100: rt=100, rt=201 is 101 away (out), rt=0
    # lt=-50: rt=0 (50), rt=-151 is 101 away (out)
    # lt=1000: nothing
    assert out == {(1, 10), (1, 13), (2, 10), (2, 13), (3, 13)}


def test_band_join_no_duplicate_pairs(lhs, rhs):
    rows = band_join(lhs, rhs, "lt", "rt", 100).collect()
    pairs = [(r["lid"], r["rid"]) for r in rows]
    assert len(pairs) == len(set(pairs)), "each pair must appear exactly once"


def test_band_join_with_keys(spark):
    left = spark.createDataFrame([("a", 1, 0), ("b", 2, 0)], "k string, lid int, lt bigint")
    right = spark.createDataFrame([("a", 9, 10)], "k string, rid int, rt bigint")
    out = [
        (r["lid"], r["rid"])
        for r in band_join(left, right, "lt", "rt", 100, on=["k"]).collect()
    ]
    assert out == [(1, 9)], "key mismatch must not pair even within the band"


def test_interval_point_join_containment(spark):
    iv = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 300), (3, -20, -10)], "iid int, s bigint, e bigint"
    )
    pt = spark.createDataFrame(
        [(10, 0), (11, 10), (12, 11), (13, 250), (14, -10), (15, -21)],
        "pid int, pt bigint",
    )
    out = {
        (r["iid"], r["pid"])
        for r in interval_point_join(iv, pt, "s", "e", "pt", bucket_width=10).collect()
    }
    # interval 2 is 295 long — far wider than the bucket — and must still
    # catch pt=250 via the sequence explosion
    assert out == {(1, 10), (1, 11), (2, 11), (2, 12), (2, 13), (3, 14)}


def test_keyless_band_join_plans_no_cartesian(lhs, rhs):
    """The whole point: a keyless range join must run as an equi-join on the
    manufactured bucket key, not BroadcastNestedLoop/CartesianProduct."""
    df = band_join(lhs, rhs, "lt", "rt", 100)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p


def test_band_matches_naive_join_on_events(spark, sf_dir):
    """Cross-check the registered keyless band query against the naive
    range-condition join on the same data."""
    from pyspark.sql import functions as F

    from bustub_vectordb_spark.queries import QUERIES, _t

    got = {
        (r["view_id"], r["purchase_id"], r["gap_sec"])
        for r in QUERIES["range_join_band"](spark, sf_dir).collect()
    }
    e = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", F.expr("ts div 1000000000").alias("sec")
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("sec").alias("view_sec")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("sec").alias("purchase_sec")
    )
    naive = {
        (r["view_id"], r["purchase_id"], r["gap_sec"])
        for r in v.join(
            p, F.abs(F.col("view_sec") - F.col("purchase_sec")) <= 120
        )
        .select(
            "view_id",
            "purchase_id",
            (F.col("purchase_sec") - F.col("view_sec")).alias("gap_sec"),
        )
        .collect()
    }
    assert got == naive and len(got) > 0
