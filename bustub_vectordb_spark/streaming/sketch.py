"""Streaming distinct-count sketch — the KMV estimator over a stream.

The monitoring question a 100 TB ingest pipeline actually asks — "how many
distinct shingles/users/urls have we seen so far?" — cannot be an exact
streaming COUNT(DISTINCT): state grows with the universe. The KMV sketch
(functions/sketch.py) is MERGEABLE: bottom-k(A ∪ B) ⊆ bottom-k(A) ∪
bottom-k(B), so each micro-batch contributes its own bottom-k and the
running state is k BIGINTs, period. Two consequences worth naming:

  * replay-idempotent FOR FREE — set-union is idempotent, so at-least-once
    foreachBatch delivery needs no batch-id bookkeeping (contrast the
    dedup/ANN sinks, which track replayed batches);
  * stream == batch EXACTLY — the merged bottom-k equals the batch
    sketch's bottom-k over the union of all arrivals, so the gated entry's
    oracle is simply the BATCH KMV SQL (no sequential replay unroll).

Per-batch cost: one distinct + TakeOrdered(k) over the batch (nothing
state-sized shuffles); driver state: k ints, JSON-persisted atomically for
restart.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..functions.sketch import DEFAULT_K, _HASH_SPACE, kmv_hash


class StreamKMV:
    """foreachBatch sink maintaining a bottom-k distinct-hash state."""

    def __init__(
        self,
        value_col: str | Column,
        k: int = DEFAULT_K,
        state_path: str | None = None,
    ):
        self.value_col = value_col
        self.k = k
        self.state_path = state_path
        self.state: list[int] = []
        if state_path and os.path.exists(state_path):
            with open(state_path) as f:
                self.state = json.load(f)["h"]

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        rows = (
            batch_df.select(kmv_hash(self.value_col).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(self.k)
            .collect()
        )
        self.state = sorted(set(self.state) | {r["h"] for r in rows})[: self.k]
        if self.state_path:
            d = os.path.dirname(self.state_path) or "."
            fd, tmp = tempfile.mkstemp(dir=d, prefix=".kmv_")
            with os.fdopen(fd, "w") as f:
                json.dump({"k": self.k, "h": self.state}, f)
            os.replace(tmp, self.state_path)  # atomic on POSIX

    def estimate_df(self, spark: SparkSession) -> DataFrame:
        """One-row ``(k, n_est)`` — the estimate is computed with the SAME
        Spark expression the batch sketch uses (not Python round(), whose
        banker's rounding differs from SQL round at half-boundaries)."""
        cnt = len(self.state)
        kth = self.state[-1] if self.state else 0
        base = spark.createDataFrame([(cnt, kth)], "cnt long, kth long")
        est = F.when(
            F.col("cnt") < self.k, F.col("cnt").cast("double")
        ).otherwise(
            F.round(
                F.lit(float(self.k - 1)) / (F.col("kth") / F.lit(_HASH_SPACE)), 4
            )
        )
        return base.select(F.lit(self.k).alias("k"), est.alias("n_est"))


def sketch_stream(
    stream: DataFrame,
    value_col: str | Column,
    checkpoint_dir: str,
    k: int = DEFAULT_K,
    state_path: str | None = None,
):
    """Wire a streaming DataFrame into a StreamKMV sink (availableNow).
    Returns (query, sink); call ``sink.estimate_df(spark)`` after
    ``query.awaitTermination()``."""
    sink = StreamKMV(value_col, k=k, state_path=state_path)
    q = (
        stream.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, sink
