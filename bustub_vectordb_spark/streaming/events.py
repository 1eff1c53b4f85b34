"""Event-stream processing — Structured Streaming over the events table.

The reference has no streaming surface (SURVEY.md §2.5); this module is part
of the engine's LLM-pipeline extension set. The same windowed aggregation is
exposed twice:

  tumbling_counts         batch DataFrame (used by the oracle-checked query)
  stream_tumbling_counts  readStream → event-time watermark → window →
                          writeStream; identical results when drained with
                          trigger(availableNow=True) over the same files —
                          asserted in tests/test_streaming.py.

The watermark (2 h) bounds state for continuous ingest: open windows older
than max(event_time) - 2h can be finalized and dropped. The parity test runs
in 'complete' output mode so end-of-file windows are emitted too; a
production append-mode sink would emit each window once its watermark
passes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# normalized engine contract: ts = BIGINT ns since epoch (catalog.normalize_events_ts)
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

# raw driver testdata file shape (timestamp[us] parquet → TIMESTAMP_NTZ)
EVENTS_FILE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _with_event_time(df: DataFrame) -> DataFrame:
    # ns → timestamp (micros precision is plenty for hourly windows)
    return df.withColumn(
        "event_time", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )


def _window_agg(e: DataFrame, slide: str | None = None) -> DataFrame:
    w = (
        F.window("event_time", "1 hour", slide)
        if slide
        else F.window("event_time", "1 hour")
    )
    return (
        e.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Batch form: 1-hour tumbling window counts/sums per event type."""
    return _window_agg(_with_event_time(events))


def hopping_counts(events: DataFrame) -> DataFrame:
    """Batch form: 1-hour windows sliding every 30 min (each event lands in
    size/slide = 2 overlapping windows). Session TZ is UTC (session.py), so
    F.window's epoch-aligned starts equal the oracle's integer arithmetic."""
    return _window_agg(_with_event_time(events), slide="30 minutes")


def _events_read_schema(spark: SparkSession, path: str) -> T.StructType:
    """Pick the streaming read schema from the parquet footer's physical ts
    type — the testdata has shipped events.ts as TIMESTAMP(NANOS) (needs
    the nanosAsLong conf + a LONG field), timestamp[us] (TIMESTAMP_NTZ),
    and could ship tz-adjusted micros (TIMESTAMP). Mirrors
    catalog.normalize_events_ts's three-way handling so the streaming path
    accepts every shape the batch path does."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_schema(path).field("ts").type
    if pa.types.is_timestamp(t) and t.unit == "ns":
        # Spark has no ns timestamp: read the raw int64 under the legacy conf
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ts_type: T.DataType = T.LongType()
    elif pa.types.is_timestamp(t) and t.tz is not None:
        ts_type = T.TimestampType()
    else:
        ts_type = T.TimestampNTZType()
    return T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", ts_type)
            for f in EVENTS_FILE_SCHEMA.fields
        ]
    )


def events_stream(spark: SparkSession, sf_dir: str, stage_dir: str) -> DataFrame:
    """Streaming read of events.parquet via a staging dir (the file source
    streams a directory; testdata dirs mix tables, so we stage a symlink)."""
    os.makedirs(stage_dir, exist_ok=True)
    src = os.path.join(sf_dir, "events.parquet")
    link = os.path.join(stage_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    from ..catalog import normalize_events_ts

    schema = _events_read_schema(spark, src)
    return normalize_events_ts(spark.readStream.schema(schema).parquet(stage_dir))


def stream_tumbling_counts(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    out_table: str = "stream_counts",
    output_mode: str = "complete",
) -> None:
    """Streaming form with a 2 h event-time watermark; availableNow trigger
    drains the staged files and stops.

    output_mode:
      * ``complete`` — every window re-emitted each batch; parity test
        compares the final emission against the batch twin verbatim.
      * ``append`` — the PRODUCTION shape: each window emitted exactly once,
        when the watermark passes its end; state for it is then dropped.
        Windows still open at end-of-input stay in state (a real pipeline
        keeps running). Spark's no-data final micro-batch flushes windows
        the last watermark advance closed.
    """
    src = events_stream(spark, sf_dir, os.path.join(work_dir, "stage"))
    e = _with_event_time(src).withWatermark("event_time", "2 hours")
    agg = _window_agg(e)
    (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", os.path.join(work_dir, f"ckpt_{output_mode}"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stream_hopping_counts(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    out_table: str = "stream_hop_counts",
    output_mode: str = "complete",
) -> None:
    """Streaming twin of :func:`hopping_counts` — same watermark/trigger
    discipline as :func:`stream_tumbling_counts`; state holds size/slide = 2
    open windows per (alignment, event_type) within the watermark horizon."""
    src = events_stream(spark, sf_dir, os.path.join(work_dir, "stage"))
    e = _with_event_time(src).withWatermark("event_time", "2 hours")
    agg = _window_agg(e, slide="30 minutes")
    (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(out_table)
        .option(
            "checkpointLocation", os.path.join(work_dir, f"ckpt_hop_{output_mode}")
        )
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
