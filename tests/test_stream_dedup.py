"""Streaming dedup (streaming/dedup.py): the watermarked
dropDuplicatesWithinWatermark twin must agree with the batch
min-per-key dedup on the key set, and its state contract must hold
(duplicates inside the horizon suppressed; far-apart ones re-emitted
after state eviction)."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bustub_vectordb_spark.streaming.dedup import first_per_key, stream_first_per_key

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def test_stream_dedup_matches_batch_keyset(spark, sf_dir, tables, tmp_path):
    batch = {
        (r["user_id"], r["event_type"], r["minute"]): r["keep_event_id"]
        for r in first_per_key(tables["events"]).collect()
    }
    assert batch

    stream_first_per_key(spark, sf_dir, str(tmp_path), out_table="sd_test")
    streamed = {
        (r["user_id"], r["event_type"], r["minute"]): r["keep_event_id"]
        for r in spark.table("sd_test").collect()
    }
    # exactly one emission per key, same key set
    assert set(streamed) == set(batch)
    # the staged testdata arrives in one file in event_id order per key, so
    # 'first encountered' == min(event_id) here
    assert streamed == batch


def test_dedup_suppresses_within_horizon_only(spark, tmp_path):
    """Batch 1: duplicate 30 s apart suppressed; watermark then passes the
    key. Batch 2: same key re-observed — state was evicted, so it's
    emitted again (the bounded-state contract of
    dropDuplicatesWithinWatermark, vs dropDuplicates' forever-state)."""
    ns = 1_000_000_000
    hour = 3600 * ns
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    # file a: the duplicate pair + a watermark driver at t=10h
    batch1 = [
        (1, 1 * hour, 7, "view", 1.0, "{}"),
        (2, 1 * hour + 30 * ns, 7, "view", 1.0, "{}"),
        (3, 10 * hour, 8, "click", 1.0, "{}"),
    ]
    # file b: unrelated key — its batch END applies watermark 10h-2h=8h,
    # which physically evicts key (7,view) (state expiry was 1h+2h=3h);
    # eviction happens at batch commit, so the re-observation needs to
    # arrive in a LATER batch than the watermark advance
    batch2 = [(5, 20 * hour, 9, "scroll", 1.0, "{}")]
    # file c: key (7, view) again at t=51h — state long evicted
    batch3 = [(4, 51 * hour, 7, "view", 1.0, "{}")]
    # flat files (not spark-written directories): the parquet file-stream
    # source lists leaf files of `src` only
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    import time as _time

    now = _time.time()
    for i, (fname, batch) in enumerate(
        (
            ("a.parquet", batch1),
            ("b.parquet", batch2),
            ("c.parquet", batch3),
        )
    ):
        tbl = pa.table({c: [row[i] for row in batch] for i, c in enumerate(cols)})
        path = os.path.join(src, fname)
        pq.write_table(tbl, path)
        # the file-stream source orders candidate files by modification
        # time — three quick writes can land in the same mtime tick (seen
        # flaky under box load), collapsing the micro-batch sequence the
        # watermark-eviction contract depends on. Pin strictly increasing
        # mtimes seconds apart.
        os.utime(path, (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("event_time", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        .withWatermark("event_time", "2 hours")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("event_id")
    )
    (
        stream.writeStream.format("memory")
        .queryName("sd_horizon")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = sorted(r["event_id"] for r in spark.table("sd_horizon").collect())
    # 1 kept; 2 suppressed (same key, within horizon); 3/5 kept (other
    # keys); 4 kept AGAIN — its key's state was evicted once the watermark
    # passed its expiry, which is the bounded-state contract
    assert got == [1, 3, 4, 5]
