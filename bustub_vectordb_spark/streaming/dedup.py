"""Streaming deduplication — watermark-bounded duplicate suppression.

The reference has no streaming surface (SURVEY.md §2.5); this completes the
engine's streaming set (events.py, sessions.py, joins.py) with the last
core stateful operator: streaming dedup. A training-data ingest pipeline
dedupes continuously — the batch fingerprint-groupBy (dedup/exact.py) has
this as its streaming twin.

Workload: suppress repeated (user_id, event_type, minute) observations,
keeping the first event per key. Exposed twice with identical key sets:

  first_per_key         batch DataFrame (oracle-checked vs DuckDB: min
                        event_id per key — a deterministic "first")
  stream_first_per_key  readStream → watermark →
                        dropDuplicatesWithinWatermark(keys) → append sink

State-bound reasoning: plain ``dropDuplicates`` on a stream keeps EVERY key
seen forever — unbounded state, the job that dies after a week.
``dropDuplicatesWithinWatermark`` evicts keys once the watermark passes
them: state is bounded by (keys arriving within the watermark horizon),
here 2 h of distinct keys, independent of stream lifetime. The contract is
correspondingly weaker — duplicates farther apart than the horizon are NOT
suppressed — which is exactly the right trade for infinite ingest and is
asserted in tests/test_stream_dedup.py.

Batch/stream parity caveat: within one key the streaming operator keeps the
first row *encountered* (arrival order), the batch twin keeps min(event_id)
(a total order). The twins agree on the KEY SET always, and on the kept row
whenever arrival order is event-id order per key (true for the staged
testdata files). The parity test asserts the key-set contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .events import events_stream

WATERMARK = "2 hours"
DEDUP_KEYS = ["user_id", "event_type", "minute"]


def _with_minute(events: DataFrame) -> DataFrame:
    # ns → whole minutes via exact integer division (doubles truncate
    # wrong near 2^53 — same rationale as sessions.py/joins.py)
    return events.withColumn("minute", F.expr("ts div 60000000000"))


def first_per_key(events: DataFrame) -> DataFrame:
    """Batch twin: one row per (user_id, event_type, minute) — the minimum
    event_id, a deterministic stand-in for 'first arrival'."""
    return (
        _with_minute(events)
        .groupBy(*DEDUP_KEYS)
        .agg(F.min("event_id").alias("keep_event_id"))
    )


def stream_first_per_key(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    out_table: str = "stream_dedup",
) -> None:
    """Streaming twin: watermarked dropDuplicatesWithinWatermark, append
    sink, availableNow trigger (drains the staged files, then stops)."""
    e = events_stream(spark, sf_dir, f"{work_dir}/stage")
    dedup = (
        _with_minute(e)
        .withColumn("event_time", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        .withWatermark("event_time", WATERMARK)
        .dropDuplicatesWithinWatermark(DEDUP_KEYS)
        .select(*DEDUP_KEYS, F.col("event_id").alias("keep_event_id"))
    )
    (
        dedup.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", f"{work_dir}/ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
