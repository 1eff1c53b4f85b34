"""Structured Streaming parity: the streaming tumbling-window agg must equal
the batch agg over the same events files."""


from bustub_vectordb_spark.streaming import stream_tumbling_counts, tumbling_counts


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
