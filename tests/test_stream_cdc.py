"""Streaming CDC apply (streaming/cdc_apply.py): merge parity with the
batch operator, copy-on-write partition granularity, replay idempotence."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from bustub_vectordb_spark.operators.cdc import merge_upsert
from bustub_vectordb_spark.streaming.cdc_apply import BUCKET_COL, StreamUpsertSink


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(i, "s", float(i)) for i in range(40)], "k bigint, st string, v double"
    )


def _apply(sink, spark, rows):
    delta = spark.createDataFrame(rows, "k bigint, st string, v double")
    sink.process_batch(delta, 0)


def test_stream_state_matches_batch_merge(spark, base, tmp_path):
    sink = StreamUpsertSink(spark, base, "k", str(tmp_path / "st"), n_buckets=4)
    rows = [(3, "u", 99.0), (100, "n", 1.0)]
    _apply(sink, spark, rows)
    want = merge_upsert(
        base, spark.createDataFrame(rows, "k bigint, st string, v double"), ["k"]
    )
    got = sink.state_df()
    assert got.count() == 41
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_only_touched_buckets_rewritten(spark, base, tmp_path):
    """A delta whose keys all hash to bucket 1 must leave every other
    bucket's files untouched on disk (same inode set)."""
    d = str(tmp_path / "st")
    sink = StreamUpsertSink(spark, base, "k", d, n_buckets=4)

    def files(bucket):
        return sorted(glob.glob(f"{d}/{BUCKET_COL}={bucket}/*.parquet"))

    before = {b: [(f, os.stat(f).st_mtime_ns) for f in files(b)] for b in range(4)}
    _apply(sink, spark, [(5, "u", 0.0), (9, "u", 0.0)])  # 5%4==1, 9%4==1
    after = {b: [(f, os.stat(f).st_mtime_ns) for f in files(b)] for b in range(4)}
    assert after[0] == before[0] and after[2] == before[2] and after[3] == before[3]
    assert after[1] != before[1]
    # and the data is right
    got = {r["k"]: r["st"] for r in sink.state_df().collect()}
    assert got[5] == "u" and got[9] == "u" and got[4] == "s"


def test_replay_same_delta_is_noop(spark, base, tmp_path):
    sink = StreamUpsertSink(spark, base, "k", str(tmp_path / "st"), n_buckets=4)
    rows = [(7, "u", 1.5), (200, "n", 2.5)]
    _apply(sink, spark, rows)
    first = sorted(map(tuple, sink.state_df().collect()))
    _apply(sink, spark, rows)  # at-least-once redelivery
    assert sorted(map(tuple, sink.state_df().collect())) == first


def test_later_batch_wins(spark, base, tmp_path):
    sink = StreamUpsertSink(spark, base, "k", str(tmp_path / "st"), n_buckets=4)
    _apply(sink, spark, [(11, "first", 1.0)])
    _apply(sink, spark, [(11, "second", 2.0)])
    got = {r["k"]: (r["st"], r["v"]) for r in sink.state_df().collect()}
    assert got[11] == ("second", 2.0)
