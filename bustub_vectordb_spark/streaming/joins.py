"""Stream-stream joins — event-time windowed correlation with watermarks.

The reference has no streaming surface (SURVEY.md §2.5); this extends the
engine's streaming set (events.py, sessions.py) with the remaining core
Structured Streaming operator: the stream-stream inner join.

Workload: view→purchase attribution. Pair every `view` event with the same
user's `purchase` events that happen within 1 hour AFTER the view. Exposed
twice, batch and stream, with identical results:

  view_purchase_pairs         batch DataFrame (oracle-checked vs DuckDB)
  stream_view_purchase_pairs  two filtered readStreams of the same source,
                              watermarked on both sides, range-condition
                              inner join, append-mode sink

State-bound reasoning (the part that matters at scale): with watermarks on
BOTH inputs and a time-range join condition, Spark derives the state
retention per side — a buffered view can only match purchases ≤1 h newer,
so views older than `watermark - 1 h` are evicted; purchases are evicted at
the watermark. Without the range condition the join state grows without
bound — that shape is rejected by design here.

Timestamps are truncated to whole seconds on both twins (and in the oracle
SQL) so batch/stream/DuckDB agree exactly regardless of each engine's
sub-second precision (the parquet column is TIMESTAMP(NANOS); Spark reads
ns-longs under the legacy conf, DuckDB reads µs timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .events import events_stream

ATTRIBUTION_WINDOW_SEC = 3600


def _sides(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split an events frame (with `sec` + `event_time`) into the view and
    purchase sides with disjoint column names (stream self-joins require
    unambiguous references)."""
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("sec").alias("view_sec"),
        F.col("event_time").alias("view_time"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("sec").alias("purchase_sec"),
        F.col("event_time").alias("purchase_time"),
        F.col("value").alias("p_value"),
    )
    return v, p


def _pair_output(j: DataFrame) -> DataFrame:
    return j.select(
        F.col("v_user_id").alias("user_id"),
        "view_id",
        "purchase_id",
        (F.col("purchase_sec") - F.col("view_sec")).alias("lag_sec"),
        F.round("p_value", 2).alias("purchase_value"),
    )


def _with_sec(events: DataFrame) -> DataFrame:
    # ns → whole seconds, integer division (exact; double division of ns
    # epoch values (~2^60) exceeds double's 2^53 exact range — same reasoning
    # as sessions.py)
    sec = F.expr("ts div 1000000000")
    return events.withColumn("sec", sec).withColumn(
        "event_time", F.timestamp_seconds(F.col("sec"))
    )


def view_purchase_pairs(events: DataFrame) -> DataFrame:
    """Batch twin: views joined to same-user purchases ≤1 h later.

    Plan shape at scale: one shuffle of each side on user_id, then a single
    sort-merge join evaluates the range predicate inside each user's run —
    the time condition never becomes a cross product because it's applied
    as a join residual, not a post-filter over user_id-only pairs. Bucketing
    both sides by user_id (layout.py) would remove even that shuffle.
    """
    v, p = _sides(_with_sec(events))
    j = v.join(
        p,
        (F.col("v_user_id") == F.col("p_user_id"))
        & (F.col("purchase_sec") >= F.col("view_sec"))
        & (F.col("purchase_sec") <= F.col("view_sec") + ATTRIBUTION_WINDOW_SEC),
    )
    return _pair_output(j)


def view_purchase_pairs_skew_guarded(
    events: DataFrame, bucket_sec: int = ATTRIBUTION_WINDOW_SEC
) -> DataFrame:
    """Skew-guarded batch twin: identical output to
    :func:`view_purchase_pairs`, but the join key is (user_id, time-bucket).

    The plain twin shuffles on user_id alone — one power user (a bot, a
    load tester) concentrates its V×P candidate pairs in a single
    sort-merge-join task. Routing through
    ``operators.range_join.interval_point_join`` appends a
    ``bucket_sec``-wide time bucket to the key: the hot user's events
    spread across its active hours, so task size is bounded by events per
    (user, hour) rather than per user, with no semantic change (the exact
    range predicate runs as the join residual). This is the same
    skew-splitting argument as range_join.py's module docstring, applied
    to a keyed join.
    """
    from ..operators.range_join import interval_point_join

    e = _with_sec(events)
    v = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("sec").alias("view_sec"),
        (F.col("sec") + ATTRIBUTION_WINDOW_SEC).alias("win_end"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("sec").alias("purchase_sec"),
        F.col("value").alias("p_value"),
    )
    j = interval_point_join(
        v, p, "view_sec", "win_end", "purchase_sec", bucket_width=bucket_sec,
        on=["user_id"],
    )
    return j.select(
        "user_id",
        "view_id",
        "purchase_id",
        (F.col("purchase_sec") - F.col("view_sec")).alias("lag_sec"),
        F.round("p_value", 2).alias("purchase_value"),
    )


def stream_view_purchase_pairs(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    out_table: str = "stream_pairs",
) -> None:
    """Streaming twin: watermarked stream-stream inner join, append mode.

    Both sides carry a 2 h watermark; with the 1 h range condition Spark
    bounds each side's buffered state (see module docstring). The
    availableNow trigger drains the staged files and stops — results land
    in the `out_table` in-memory sink for the parity test.
    """
    src = events_stream(spark, sf_dir, os.path.join(work_dir, "stage"))
    e = _with_sec(src)
    v, p = _sides(e)
    v = v.withWatermark("view_time", "2 hours")
    p = p.withWatermark("purchase_time", "2 hours")
    j = v.join(
        p,
        (F.col("v_user_id") == F.col("p_user_id"))
        & (F.col("purchase_time") >= F.col("view_time"))
        & (
            F.col("purchase_time")
            <= F.col("view_time") + F.expr(f"interval {ATTRIBUTION_WINDOW_SEC} seconds")
        ),
    )
    (
        _pair_output(j)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt_join"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
