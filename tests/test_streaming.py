"""Structured Streaming parity: the streaming tumbling-window agg must equal
the batch agg over the same events files; stateful sessionization must emit
a consistent subset of the batch sessions."""


from bustub_vectordb_spark.streaming import stream_tumbling_counts, tumbling_counts


def test_stateful_sessionize_consistent_with_batch(spark, sf_dir, tables, tmp_path):
    from bustub_vectordb_spark.streaming.sessions import (
        GAP_S,
        sessionize,
        stream_sessionize,
    )

    batch = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            r["total_value"],
        )
        for r in sessionize(tables["events"]).collect()
    }
    assert batch

    stream_sessionize(spark, sf_dir, str(tmp_path), out_table="ss_test")
    streamed = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            r["total_value"],
        )
        for r in spark.table("ss_test").collect()
    }
    # append-mode semantics: every emitted session is final and must match
    # the batch result exactly; sessions whose gap horizon the watermark
    # never passed may legitimately still sit in the state store
    assert streamed, "drain should emit at least the gap-closed sessions"
    for key, val in streamed.items():
        assert batch.get(key) == val
    # sessions closed by a later event (gap exceeded) are always emitted;
    # only each user's final open session may be withheld
    n_users = len({u for u, _ in batch})
    assert len(streamed) >= len(batch) - n_users


def test_stateful_sessionize_multi_batch(spark, sf_dir, tables, tmp_path):
    """Drive the stateful operator across MANY micro-batches (time-ordered
    file splits + maxFilesPerTrigger=1) so state survives batch boundaries
    and the advancing watermark fires event-time timeouts mid-stream."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from bustub_vectordb_spark.streaming.events import EVENTS_SCHEMA, _with_event_time
    from bustub_vectordb_spark.streaming.sessions import _with_sec, sessionize

    ev = tables["events"]
    # time-ordered splits, one file each with ascending mtimes — the file
    # source processes oldest-first, so each batch advances the watermark
    # past earlier sessions' horizons and timeouts fire mid-stream
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    cuts = ev.approxQuantile("ts", [0.2, 0.4, 0.6, 0.8], 0.01) + [float("inf")]
    lo = float("-inf")
    for i, hi in enumerate(cuts):
        part = ev.filter((F.col("ts") > lo) & (F.col("ts") <= hi)).coalesce(1)
        tmp_out = str(tmp_path / f"b{i}")
        part.write.parquet(tmp_out)
        (src_file,) = glob.glob(tmp_out + "/part-*.parquet")
        dst = os.path.join(stage, f"{i:02d}.parquet")
        shutil.move(src_file, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
        lo = hi

    from pyspark.sql.streaming.state import GroupStateTimeout

    from bustub_vectordb_spark.streaming.sessions import (
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        _session_fn,
    )

    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    e = _with_sec(_with_event_time(src)).withWatermark("event_time", "30 minutes")
    out = e.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_mb")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt_mb"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    batch = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            r["total_value"],
        )
        for r in sessionize(ev).collect()
    }
    streamed = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            r["total_value"],
        )
        for r in spark.table("ss_mb").collect()
    }
    assert streamed
    for key, val in streamed.items():
        assert batch.get(key) == val
    n_users = len({u for u, _ in batch})
    assert len(streamed) >= len(batch) - n_users


def test_stream_matches_batch(spark, sf_dir, tables, tmp_path):
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_counts(tables["events"]).collect()
    }
    stream_tumbling_counts(spark, sf_dir, str(tmp_path), out_table="sc_test")
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("sc_test").collect()
    }
    assert batch == streamed
    assert len(batch) > 100


def test_stream_append_mode_emits_closed_windows(spark, sf_dir, tables, tmp_path):
    """Append mode (the production sink shape): every emitted window is
    final and must match the batch twin exactly; every window the final
    watermark closed must have been emitted (only end-of-input windows may
    still sit in state)."""
    from pyspark.sql import functions as F

    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_counts(tables["events"]).collect()
    }
    stream_tumbling_counts(
        spark, sf_dir, str(tmp_path), out_table="sc_append", output_mode="append"
    )
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("sc_append").collect()
    }
    assert streamed, "watermarked drain should close at least the early windows"
    for key, val in streamed.items():
        assert batch.get(key) == val
    # final watermark = max event time - 2h; windows ending at or before it
    # were closed and MUST have been appended
    max_ns = tables["events"].agg(F.max("ts")).collect()[0][0]
    horizon = max_ns / 1e9 - 2 * 3600
    closed = {k for k in batch if k[0] + 3600 <= horizon}
    assert closed <= set(streamed)


def test_stream_handles_nanos_parquet(spark, tmp_path):
    """The streaming path must accept the TIMESTAMP(NANOS) events shape the
    testdata shipped in earlier rounds (footer-sniffed schema + the
    nanosAsLong conf), mirroring catalog.normalize_events_ts's batch-side
    three-way handling — not just the current timestamp[us] files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bustub_vectordb_spark.catalog import read_table
    from bustub_vectordb_spark.streaming.events import _events_read_schema

    base_ns = 1_700_000_000 * 10**9
    tbl = pa.table(
        {
            "event_id": pa.array(range(8), pa.int64()),
            "ts": pa.array(
                [base_ns + i * 1800 * 10**9 for i in range(8)], pa.timestamp("ns")
            ),
            "user_id": pa.array([1] * 8, pa.int64()),
            "event_type": pa.array(["view"] * 8),
            "value": pa.array([1.0] * 8),
            "props": pa.array(["{}"] * 8),
        }
    )
    sf = tmp_path / "sf_ns"
    sf.mkdir()
    pq.write_table(tbl, str(sf / "events.parquet"), version="2.6")
    # footer really is TIMESTAMP(NANOS)
    assert pq.read_schema(str(sf / "events.parquet")).field("ts").type == pa.timestamp("ns")

    schema = _events_read_schema(spark, str(sf / "events.parquet"))
    assert schema["ts"].dataType.simpleString() == "bigint"

    work = tmp_path / "work_ns"
    stream_tumbling_counts(spark, str(sf), str(work), out_table="sc_ns")
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_counts(read_table(spark, str(sf), "events")).collect()
    }
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("sc_ns").collect()
    }
    assert batch == streamed and len(batch) == 4  # 8 events, 30 min apart


def test_hopping_stream_matches_batch(spark, sf_dir, tables, tmp_path):
    """Hopping (1 h / 30 min slide) windows: the streaming twin drained with
    availableNow must equal the batch form verbatim, and every event must
    land in exactly size/slide = 2 windows."""
    from pyspark.sql import functions as F

    from bustub_vectordb_spark.streaming.events import (
        hopping_counts,
        stream_hopping_counts,
    )

    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in hopping_counts(tables["events"]).collect()
    }
    n_events = tables["events"].count()
    assert sum(n for n, _ in batch.values()) == 2 * n_events
    stream_hopping_counts(spark, sf_dir, str(tmp_path), out_table="hop_test")
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("hop_test").collect()
    }
    assert batch == streamed
    assert len(batch) > len({k[0] for k in batch})  # multiple types per window


def test_stream_kmv_replay_idempotent_and_restartable(spark, tmp_path):
    """Mergeable-sketch properties: processing the same batch twice must
    not move the state (at-least-once safety with NO batch bookkeeping),
    and a sink restarted from the persisted state file must carry on with
    an identical estimate."""
    from bustub_vectordb_spark.streaming.sketch import StreamKMV

    df = spark.range(30_000).selectExpr("cast(id as string) AS v")
    state = str(tmp_path / "kmv_state.json")
    sink = StreamKMV("v", k=128, state_path=state)
    sink.process_batch(df, 0)
    once = list(sink.state)
    sink.process_batch(df, 0)  # replay
    assert sink.state == once
    est = sink.estimate_df(spark).collect()[0]["n_est"]

    resumed = StreamKMV("v", k=128, state_path=state)
    assert resumed.state == once
    assert resumed.estimate_df(spark).collect()[0]["n_est"] == est


def test_stream_kmv_merge_equals_batch(spark):
    """bottom-k(A ∪ B) == merge(bottom-k(A), bottom-k(B)) — the property
    that makes the streaming oracle the plain batch SQL."""
    from bustub_vectordb_spark.functions.sketch import kmv_distinct_estimate
    from bustub_vectordb_spark.streaming.sketch import StreamKMV

    a = spark.range(0, 20_000).selectExpr("cast(id as string) AS v")
    b = spark.range(15_000, 40_000).selectExpr("cast(id as string) AS v")
    sink = StreamKMV("v", k=256)
    sink.process_batch(a, 0)
    sink.process_batch(b, 1)
    streamed = sink.estimate_df(spark).collect()[0]["n_est"]
    batch = kmv_distinct_estimate(a.union(b), "v", k=256).collect()[0]["n_est"]
    assert streamed == batch
