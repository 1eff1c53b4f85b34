"""Streaming CDC apply — an upsert sink with bucket-partitioned
copy-on-write state.

The lakehouse ingestion primitive: a stream of change batches (CDC deltas)
is MERGEd into a queryable table as it arrives. The reference applies
changes tuple-at-a-time through its Insert/Update executors
(src/execution/update_executor.cpp); the streaming-scale equivalent is
foreachBatch + set-level merge (operators/cdc.merge_upsert), with the
state layout doing the heavy lifting:

  state       parquet partitioned by _bucket = pmod(key, N). A delta
              batch touches only the buckets its keys hash to, so each
              micro-batch reads + rewrites ONLY those partitions
              (partition-pruned read; dynamic partition overwrite write).
              Per-batch cost is O(touched buckets), not O(table) — the
              same copy-on-write granularity Delta/Iceberg MERGE achieves
              at file level. At 1000 buckets over 100 TB, a daily delta
              touching 1% of keys rewrites ~1% of the table.
  merge       broadcast-delta decomposition (the delta is micro-batch
              sized): base LEFT JOIN broadcast(delta) + anti-joined
              inserts — the state partitions are never shuffled.
  commit      merged buckets are localCheckpoint-materialized BEFORE the
              overwrite (Spark cannot overwrite a directory it is lazily
              reading from), then written with dynamic partition
              overwrite so untouched bucket directories are not touched.
              NB: multi-bucket commits are not atomic — a real deployment
              puts a manifest/commit log (Delta's _delta_log) above this;
              out of scope here.
  replay      applying the SAME delta twice is a no-op (merge is
              last-writer-wins and the delta's values are deterministic
              functions of the change records), so at-least-once
              foreachBatch delivery needs no batch-id ledger.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.cdc import merge_upsert

BUCKET_COL = "_bucket"


class StreamUpsertSink:
    """foreachBatch sink merging delta batches into partitioned state."""

    def __init__(
        self,
        spark: SparkSession,
        base: DataFrame,
        key_col: str,
        state_dir: str,
        n_buckets: int = 8,
    ):
        self.spark = spark
        self.key_col = key_col
        self.state_dir = state_dir
        self.n_buckets = n_buckets
        self.columns = base.columns
        (
            base.withColumn(BUCKET_COL, self._bucket(F.col(key_col)))
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(state_dir)
        )

    def _bucket(self, c) -> F.Column:
        return F.pmod(c.cast("long"), F.lit(self.n_buckets))

    def state_df(self) -> DataFrame:
        return self.spark.read.parquet(self.state_dir).select(*self.columns)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_df.select(*self.columns)
        touched = sorted(
            r["b"]
            for r in delta.select(self._bucket(F.col(self.key_col)).alias("b"))
            .distinct()
            .collect()
        )
        if not touched:
            return
        current = self.spark.read.parquet(self.state_dir).where(
            F.col(BUCKET_COL).isin(touched)
        ).select(*self.columns)
        merged = merge_upsert(current, delta, [self.key_col], broadcast_source=True)
        # materialize off the source files before overwriting them
        merged = merged.withColumn(
            BUCKET_COL, self._bucket(F.col(self.key_col))
        ).localCheckpoint(eager=True)
        prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                merged.write.mode("overwrite")
                .partitionBy(BUCKET_COL)
                .parquet(self.state_dir)
            )
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def apply_stream(
    stream: DataFrame,
    sink: StreamUpsertSink,
    checkpoint_dir: str,
):
    """Wire a delta stream into the sink (availableNow: drain staged files
    then stop — the gated-entry shape; production runs drop the trigger)."""
    return (
        stream.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
