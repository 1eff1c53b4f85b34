"""Streaming ANN index maintenance — continuous embedding ingestion.

A production vector-serving system never rebuilds from scratch: embeddings
arrive continuously and must become searchable within a micro-batch. The
reference's InsertVectorEntry (src/storage/index/hnsw_index.cpp:204-279)
is the single-row form of this; ``ShardedHNSW.insert`` is its batch form
at shard scale (frozen centroid routing, touched-shards-only graph
extension) — and this module is the STREAMING twin: a ``foreachBatch``
sink that folds every micro-batch of (id, vector) rows into the routed
index with exactly that insert.

Why foreachBatch and not a stateful operator: the index IS the state, and
it lives as a blobs DataFrame (localCheckpointed per insert, so lineage
stays bounded no matter how many batches arrive — the same per-round
checkpoint discipline as dedup/components.py). Each micro-batch costs one
narrow shuffle of the new rows on the shard key plus graph work
proportional to touched shards — streaming ingest throughput is inherited
from the batch insert, not reimplemented.

Delivery semantics: foreachBatch is at-least-once on failure/retry;
``add_all`` appends blindly, so a replayed batch would duplicate ids.
``IndexIngest`` therefore drops rows whose id is already in the index
(one semi-join against members() per batch) — making ingestion
idempotent, the standard foreachBatch upsert discipline.

Correctness: the batch twin (``ShardedHNSW.insert``) is driver-gated with
an exact offline replay (queries.py `ann_hnsw_routed_insert`); the
stream-vs-batch parity test (tests/test_stream_ann_ingest.py) asserts the
streamed index returns the same probe results as the same rows inserted
in one batch call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class IndexIngest:
    """foreachBatch sink folding micro-batches into a routed ShardedHNSW."""

    COMPACT_EVERY = 64  # fold the union-of-deltas seen set into one checkpoint

    def __init__(self, index, vec_col: str | None = None, id_col: str | None = None):
        self.index = index
        self.vec_col = vec_col or index.vec_col
        self.id_col = id_col or index.id_col
        self.batches = 0
        # seen-id relation: extracted from the blobs ONCE, then maintained
        # incrementally (union of each batch's inserted ids, checkpointed)
        # — per-batch cost is O(batch), not an O(corpus) blob re-scan
        self._seen = (
            index.members().select(index.id_col).localCheckpoint(eager=True)
        )
        # checkpoint leaves backing the seen view, released at compaction
        # (their storage would otherwise pin ~1 stale generation per fold)
        self._seen_leaves = [self._seen]

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.select(
            F.col(self.id_col).alias(self.index.id_col),
            F.col(self.vec_col).alias(self.index.vec_col),
        ).dropDuplicates([self.index.id_col])
        # idempotence under at-least-once replay: already-present ids drop
        rows = rows.join(self._seen, self.index.id_col, "left_anti")
        if rows.isEmpty():
            return
        self.index = self.index.insert(rows)
        # append the batch's ids as a CHECKPOINTED DELTA (O(batch) write);
        # re-checkpointing the whole seen relation would copy O(corpus)
        # per micro-batch. The union view compacts every COMPACT_EVERY
        # batches so the plan stays shallow (amortized O(corpus/C)/batch).
        delta = rows.select(self.index.id_col).localCheckpoint(eager=True)
        self._seen = self._seen.unionByName(delta)
        self._seen_leaves.append(delta)
        self.batches += 1
        if self.batches % self.COMPACT_EVERY == 0:
            from ..shipping import release_checkpoint

            self._seen = self._seen.localCheckpoint(eager=True)
            # the fold materialized — release the superseded leaves so a
            # long-running stream holds exactly one seen-set generation
            for leaf in self._seen_leaves:
                release_checkpoint(leaf)
            self._seen_leaves = [self._seen]


def ingest_stream(
    stream_df: DataFrame,
    index,
    vec_col: str,
    id_col: str,
    checkpoint_dir: str,
) -> tuple:
    """Attach the ingest sink to a streaming DataFrame; availableNow drains
    the staged input and stops. Returns (query, ingest) — read
    ``ingest.index`` after ``query.awaitTermination()`` for the extended
    index."""
    ingest = IndexIngest(index, vec_col, id_col)
    q = (
        stream_df.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, ingest
