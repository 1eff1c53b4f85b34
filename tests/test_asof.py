"""As-of join semantics (operators/asof.py): backward inclusive match,
tolerance, no-match NULLs, tie-breaks, and the no-join-blowup plan shape."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from bustub_vectordb_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", 10, 100.0),
            ("A", 20, 101.0),
            ("A", 20, 102.0),  # tie at t=20 — greater payload wins
            ("A", 40, 103.0),
            ("B", 15, 50.0),
        ],
        "sym string, qt bigint, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", 5, 1),    # before any quote → NULL
            ("A", 10, 2),   # exactly at quote time → inclusive match
            ("A", 25, 3),   # between quotes → latest prior (t=20)
            ("A", 99, 4),   # after all quotes
            ("B", 14, 5),   # before B's only quote → NULL
            ("C", 50, 6),   # key with no right rows at all → NULL
        ],
        "sym string, tt bigint, tid int",
    )


def test_backward_inclusive_semantics(trades, quotes):
    out = {
        r["tid"]: (r["q_qt"], r["q_px"])
        for r in asof_join(trades, quotes, "sym", "tt", "qt", right_prefix="q_").collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (10, 100.0)
    assert out[3] == (20, 102.0), "tie at qt=20 must pick the greater payload"
    assert out[4] == (40, 103.0)
    assert out[5] == (None, None)
    assert out[6] == (None, None)
    assert len(out) == 6, "left join: every left row survives"


def test_tolerance_nulls_stale_matches(trades, quotes):
    out = {
        r["tid"]: r["q_qt"]
        for r in asof_join(
            trades, quotes, "sym", "tt", "qt", right_prefix="q_", tolerance=10
        ).collect()
    }
    assert out[2] == 10   # lag 0 ≤ 10
    assert out[3] == 20   # lag 5 ≤ 10
    assert out[4] is None, "lag 59 > tolerance 10 → no match"


def test_multi_key_join(spark):
    left = spark.createDataFrame(
        [("A", 1, 100, 1), ("A", 2, 100, 2)], "k1 string, k2 int, t bigint, lid int"
    )
    right = spark.createDataFrame(
        [("A", 1, 90, 7.0), ("A", 2, 95, 8.0)], "k1 string, k2 int, rt bigint, v double"
    )
    out = {
        r["lid"]: r["r_v"]
        for r in asof_join(left, right, ["k1", "k2"], "t", "rt").collect()
    }
    assert out == {1: 7.0, 2: 8.0}


def test_plan_has_no_join_and_one_exchange(trades, quotes):
    """The whole point of the union+window formulation: zero join operators
    (no range-join blowup) and a single shuffle on the key."""
    df = asof_join(trades, quotes, "sym", "tt", "qt")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "Join" not in p, "as-of must not plan a join"
    # formatted explain lists each node twice (tree + detail section);
    # count distinct "(n) Exchange" detail headers
    import re

    n_shuffles = len(re.findall(r"^\(\d+\) Exchange", p, re.MULTILINE))
    assert n_shuffles == 1, f"expected exactly one shuffle:\n{p}"


def test_asof_attribution_matches_window_reference(spark, sf_dir):
    """Cross-check the events attribution query against an independent
    Spark formulation (join + per-purchase max) on a sample of users."""
    from bustub_vectordb_spark.queries import QUERIES

    got = (
        QUERIES["events_asof_attribution"](spark, sf_dir)
        .filter(F.col("user_id") % 29 == 0)
        .collect()
    )
    byp = {r["purchase_id"]: (r["view_id"], r["lag_sec"]) for r in got}

    from bustub_vectordb_spark.queries import _t

    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.expr("ts div 1000000000").alias("sec"),
    ).filter(F.col("user_id") % 29 == 0)
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("event_id").alias("view_id"),
        F.col("sec").alias("vsec"),
    )
    p = e.filter(F.col("event_type") == "purchase")
    ref = (
        p.join(
            v,
            (p["user_id"] == v["vu"])
            & (v["vsec"] <= p["sec"])
            & (p["sec"] - v["vsec"] <= 86400),
            "left",
        )
        .groupBy(p["event_id"].alias("purchase_id"), p["sec"].alias("psec"))
        .agg(F.max(F.struct(F.col("vsec"), F.col("view_id"))).alias("m"))
        .select(
            "purchase_id",
            F.col("m.view_id").alias("view_id"),
            (F.col("psec") - F.col("m.vsec")).alias("lag_sec"),
        )
        .collect()
    )
    ref_byp = {r["purchase_id"]: (r["view_id"], r["lag_sec"]) for r in ref}
    assert byp == ref_byp


def test_funnel_stage_counts_monotone(spark, sf_dir):
    """Ordered funnel invariant: each stage's count is <= the previous
    stage's (a click-after-view requires a view; a purchase-after-click
    requires that click)."""
    from bustub_vectordb_spark.queries import QUERIES

    row = QUERIES["events_funnel"](spark, sf_dir).collect()[0]
    assert row["n_view"] >= row["n_click_after_view"] >= row["n_purchase_after_click"]
    assert row["n_view"] > 0


def test_retention_cohort_offsets_well_formed(spark, sf_dir):
    """Retention triangle invariants: offset 0 exists for every cohort
    (the cohort's own first week), offsets are non-negative, and the
    offset-0 count is the cohort's max (nobody can be active later who
    was never active)."""
    from bustub_vectordb_spark.queries import QUERIES

    rows = QUERIES["events_retention_cohorts"](spark, sf_dir).collect()
    by_cohort: dict = {}
    for r in rows:
        assert r["week_offset"] >= 0
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r["n_active"]
    for c, offs in by_cohort.items():
        assert 0 in offs, f"cohort {c} missing offset 0"
        assert offs[0] == max(offs.values()), f"cohort {c} offset-0 not max"
