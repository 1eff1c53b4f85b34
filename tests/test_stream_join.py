"""Stream-stream join parity: the watermarked streaming view→purchase join
must emit exactly the batch twin's pairs (inner-join matches are emitted as
soon as both sides arrive — no watermark holdback in append mode)."""


def _key(r):
    return (r["user_id"], r["view_id"], r["purchase_id"])


def test_stream_join_matches_batch(spark, sf_dir, tables, tmp_path):
    from bustub_vectordb_spark.streaming.joins import (
        stream_view_purchase_pairs,
        view_purchase_pairs,
    )

    batch = {
        _key(r): (r["lag_sec"], r["purchase_value"])
        for r in view_purchase_pairs(tables["events"]).collect()
    }
    assert batch, "sf data should contain view→purchase pairs"

    stream_view_purchase_pairs(spark, sf_dir, str(tmp_path), out_table="sj_test")
    streamed = {
        _key(r): (r["lag_sec"], r["purchase_value"])
        for r in spark.table("sj_test").collect()
    }
    assert streamed == batch


def test_batch_pairs_within_window(tables):
    from bustub_vectordb_spark.streaming.joins import (
        ATTRIBUTION_WINDOW_SEC,
        view_purchase_pairs,
    )

    rows = view_purchase_pairs(tables["events"]).collect()
    assert all(0 <= r["lag_sec"] <= ATTRIBUTION_WINDOW_SEC for r in rows)
