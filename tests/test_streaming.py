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
