"""Sessionization — gaps-and-islands in batch, applyInPandasWithState in
streaming.

A session is a maximal run of a user's events where consecutive events are
≤ gap_s apart (on whole-second event time; integer division keeps both
engines' arithmetic exact so session boundaries are deterministic).

  sessionize            batch DataFrame: lag → new-session mark → running
                        sum → session id → group. Two shuffles, both on
                        user_id; the window and the final group share the
                        same partitioning so Catalyst plans one exchange.
  stream_sessionize     custom stateful streaming operator: per-user state
                        holds the open session; an event-time timeout at
                        (last_event + gap) past the watermark emits closed
                        sessions exactly once (append mode).

At 100 TB the batch form shuffles once on user_id — the state per user is a
handful of longs, and sessions never cross users, so skew only appears if a
single user dominates (salt by day in that case). The streaming form's state
store holds one open session per active user: O(active users), not O(events).
"""

from __future__ import annotations

import os
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

GAP_S = 1800

SESSION_SCHEMA = (
    "user_id bigint, session_start bigint, session_end bigint, "
    "n_events bigint, total_value double"
)
_STATE_SCHEMA = "start long, last long, n long, total double"


def _with_sec(events: DataFrame) -> DataFrame:
    # ns → whole seconds, integer division (exact; float division of ns
    # magnitudes loses precision and could flip boundary comparisons)
    return events.withColumn("__sec", F.expr("ts div 1000000000"))


def sessionize(events: DataFrame, gap_s: int = GAP_S) -> DataFrame:
    """Batch sessionization: (user_id, session_start, session_end, n_events,
    total_value) per session."""
    w = Window.partitionBy("user_id").orderBy("__sec")
    marked = _with_sec(events).withColumn(
        "__new",
        F.when(
            F.col("__sec") - F.lag("__sec").over(w) > gap_s, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    sess = marked.withColumn(
        "__sid", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "__sid")
        .agg(
            F.min("__sec").alias("session_start"),
            F.max("__sec").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .drop("__sid")
    )


def _session_fn(
    key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    """Per-user state transition: fold new events into the open session,
    emit sessions closed by a gap; on event-time timeout emit the open one."""
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            [[user_id, start, last, n, round(total, 2)]],
            columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
        )
        return

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("__sec")
    open_s = list(state.get) if state.exists else None
    closed = []
    for sec, value in zip(rows["__sec"], rows["value"]):
        sec = int(sec)
        if open_s is None:
            open_s = [sec, sec, 0, 0.0]
        elif sec - open_s[1] > GAP_S:
            closed.append(open_s)
            open_s = [sec, sec, 0, 0.0]
        open_s[1] = max(open_s[1], sec)
        open_s[2] += 1
        open_s[3] += float(value)
    state.update(tuple(open_s))
    # fire once the watermark passes the open session's gap horizon; Spark
    # rejects a timeout at-or-before the current watermark, so clamp forward
    # (the session then times out on the very next batch, which is correct:
    # its horizon has already passed)
    horizon = (open_s[1] + GAP_S) * 1000
    state.setTimeoutTimestamp(max(horizon, state.getCurrentWatermarkMs() + 1))
    if closed:
        yield pd.DataFrame(
            [
                [user_id, s[0], s[1], s[2], round(s[3], 2)]
                for s in closed
            ],
            columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
        )


def stream_sessionize(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    out_table: str = "stream_sessions",
) -> None:
    """Streaming sessionization via applyInPandasWithState (event-time
    timeout); availableNow trigger drains the staged files and stops.

    Append-mode semantics: a session is emitted when a later event closes it
    by gap, or when the event-time watermark passes its horizon. Sessions
    still open when the drain stops stay in the state store (they are not
    final — more data could extend them), so the result is the subset of
    batch sessions whose horizon the watermark passed.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .events import _with_event_time, events_stream

    src = events_stream(spark, sf_dir, os.path.join(work_dir, "stage"))
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
        .queryName(out_table)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt_sessions"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
