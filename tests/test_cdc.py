"""CDC composites (operators/cdc.py): MERGE row accounting, NULL-update
semantics, broadcast plan shape; SCD2 change-only rows, open intervals,
single-shuffle plan."""

import pytest
from pyspark.sql import functions as F

from bustub_vectordb_spark.catalog import read_table
from bustub_vectordb_spark.operators.cdc import merge_upsert, scd2_intervals


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id bigint, tag string, val double",
    )


def test_merge_update_insert_passthrough(spark, base):
    src = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "id bigint, tag string, val double"
    )
    got = {r["id"]: (r["tag"], r["val"]) for r in merge_upsert(base, src, ["id"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_null_update_wins(spark, base):
    """A source row that sets a column to NULL must override the target —
    the per-column-coalesce formulation silently loses this update."""
    src = spark.createDataFrame([(1, None, 0.0)], "id bigint, tag string, val double")
    got = {r["id"]: r["tag"] for r in merge_upsert(base, src, ["id"]).collect()}
    assert got[1] is None


def test_merge_schema_mismatch_refused(spark, base):
    src = base.withColumnRenamed("val", "other")
    with pytest.raises(ValueError, match="schemas differ"):
        merge_upsert(base, src, ["id"])


def test_merge_broadcast_keeps_base_unshuffled(spark, sf_dir):
    """broadcast_source=True: the plan carries a BroadcastHashJoin and no
    shuffle Exchange on the base (only the broadcast exchange)."""
    t = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    src = t.limit(5)
    plan = (
        merge_upsert(t, src, ["o_orderkey"], broadcast_source=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_scd2_change_rows_and_open_interval(spark):
    rows = [
        (1, 100, "x", 1), (1, 200, "x", 2), (1, 300, "y", 3), (1, 400, "x", 4),
        (2, 150, "z", 5),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts bigint, st string, event_id bigint")
    got = sorted(
        (r["user_id"], r["st"], r["valid_from"], r["valid_to"])
        for r in scd2_intervals(df, "user_id", "st", "ts", tie_col="event_id").collect()
    )
    # repeated 'x' at ts=200 collapses; re-appearing 'x' at 400 is a new version
    assert got == [
        (1, "x", 100, 300), (1, "x", 400, None), (1, "y", 300, 400),
        (2, "z", 150, None),
    ]


def test_scd2_intervals_are_contiguous(spark, sf_dir):
    """On the real log: per user, valid_to equals the next valid_from and
    exactly one interval is open."""
    e = read_table(spark, sf_dir, "events")
    iv = scd2_intervals(e, "user_id", "event_type", "ts", tie_col="event_id")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    bad = iv.withColumn("nxt", F.lead("valid_from").over(w)).where(
        (F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("nxt")))
        | (F.col("valid_to").isNull() & F.col("nxt").isNotNull())
    )
    assert bad.count() == 0


def test_scd2_single_shuffle(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    plan = (
        scd2_intervals(e, "user_id", "event_type", "ts", tie_col="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_apply_changes_deletes_and_upserts(spark, base):
    from bustub_vectordb_spark.operators.cdc import apply_changes

    ch = spark.createDataFrame(
        [(2, "B", 99.0, "U"), (3, None, 0.0, "D"), (100, "n", 1.0, "U")],
        "id bigint, tag string, val double, _op string",
    )
    got = {r["id"]: r["tag"] for r in apply_changes(base, ch, ["id"]).collect()}
    assert 3 not in got and got[2] == "B" and got[100] == "n" and got[1] == "a"


def test_apply_changes_refuses_conflicts_and_bad_ops(spark, base):
    from bustub_vectordb_spark.operators.cdc import apply_changes

    both = spark.createDataFrame(
        [(2, "B", 9.0, "U"), (2, None, 0.0, "D")],
        "id bigint, tag string, val double, _op string",
    )
    with pytest.raises(ValueError, match="both upserted and deleted"):
        apply_changes(base, both, ["id"])
    bad = spark.createDataFrame(
        [(2, "B", 9.0, "X")], "id bigint, tag string, val double, _op string"
    )
    with pytest.raises(ValueError, match="unknown CDC ops"):
        apply_changes(base, bad, ["id"])


def test_scd2_null_transitions(spark):
    """Transitions to and from a NULL attribute are real versions (review
    finding: attr != prev is NULL-poisoned three-valued logic)."""
    from bustub_vectordb_spark.operators.cdc import scd2_intervals

    rows = [(1, 100, "a", 1), (1, 200, None, 2), (1, 300, "a", 3)]
    df = spark.createDataFrame(rows, "user_id bigint, ts bigint, st string, event_id bigint")
    got = sorted(
        (
            (r["st"], r["valid_from"], r["valid_to"])
            for r in scd2_intervals(
                df, "user_id", "st", "ts", tie_col="event_id"
            ).collect()
        ),
        key=lambda t: t[1],
    )
    assert got == [("a", 100, 200), (None, 200, 300), ("a", 300, None)]


def test_scd2_first_row_null_attr(spark):
    from bustub_vectordb_spark.operators.cdc import scd2_intervals

    rows = [(1, 100, None, 1), (1, 200, None, 2), (1, 300, "a", 3)]
    df = spark.createDataFrame(rows, "user_id bigint, ts bigint, st string, event_id bigint")
    rows_out = scd2_intervals(df, "user_id", "st", "ts", tie_col="event_id").collect()
    got = sorted(((r["st"], r["valid_from"]) for r in rows_out), key=lambda t: t[1])
    assert got == [(None, 100), ("a", 300)]


def test_apply_changes_refuses_duplicate_same_op_key(spark, base):
    """Two 'U' rows for one key (different payloads) must be refused —
    countDistinct(key, op) alone collapses them and merge_upsert would fan
    the matched target row out (ADVICE r7 medium)."""
    from bustub_vectordb_spark.operators.cdc import apply_changes

    dup = spark.createDataFrame(
        [(2, "B", 9.0, "U"), (2, "C", 8.0, "U")],
        "id bigint, tag string, val double, _op string",
    )
    with pytest.raises(ValueError, match="cardinality"):
        apply_changes(base, dup, ["id"])
    with pytest.raises(ValueError, match="cardinality"):
        apply_changes(base, dup, ["id"], broadcast_source=True)
