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


def test_skew_guarded_join_matches_plain_with_hot_user(spark, tables):
    """A planted power user (thousands of views) must neither change results
    nor concentrate in one join key: the guarded variant splits the hot
    user across its active time buckets."""
    from pyspark.sql import functions as F

    from bustub_vectordb_spark.streaming.joins import (
        view_purchase_pairs,
        view_purchase_pairs_skew_guarded,
    )

    hot = 999_999
    base = 1_700_000_000 * 1_000_000_000  # ns epoch
    rows = []
    # hot user: 2000 views + 100 purchases spread over ~55 hours
    for i in range(2000):
        rows.append((10_000_000 + i, base + i * 100 * 1_000_000_000, hot, "view", 0.0, "{}"))
    for i in range(100):
        rows.append((20_000_000 + i, base + i * 2000 * 1_000_000_000, hot, "purchase", 9.99, "{}"))
    # one normal user
    rows.append((30_000_000, base + 50 * 1_000_000_000, 7, "view", 0.0, "{}"))
    rows.append((30_000_001, base + 80 * 1_000_000_000, 7, "purchase", 1.5, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double, props string"
    )

    plain = {tuple(r) for r in view_purchase_pairs(ev).collect()}
    guarded = {tuple(r) for r in view_purchase_pairs_skew_guarded(ev).collect()}
    assert guarded == plain and len(plain) > 0
    assert ((7, 30_000_000, 30_000_001, 30, 1.5)) in guarded

    # skew bound: the hot user's work is split across many (user, bucket)
    # join keys instead of one user_id key
    n_buckets = (
        ev.filter((F.col("user_id") == hot) & (F.col("event_type") == "view"))
        .select(F.expr("(ts div 1000000000) div 3600").alias("b"))
        .distinct()
        .count()
    )
    assert n_buckets >= 40
