"""Streaming ANN query serving — the query-stream side of the vector
pipeline (streaming/ann_ingest.py is the data-stream side).

A production retrieval system answers a CONTINUOUS stream of embedding
queries against a (periodically extended) index. This module is that
serving loop as Structured Streaming: micro-batches of (qid, vector)
queries probe the routed ShardedHNSW through the gated distributed batch
path (``search_batch`` — centroid routing, n_probe shard pruning, bounded
(shard, chunk) rows, optional exact rerank), and every batch's hits
append to a parquet sink keyed by the micro-batch id.

Why foreachBatch: the probe is a JOIN against the index's blobs relation,
which the built-in stream-static join cannot express through an
applyInPandas walk — and foreachBatch gives exactly-once appends per
micro-batch via the sink's atomic directory write + the source
checkpoint.

Determinism/correctness: serving is a PER-QUERY pure function of
(index, query), so the streamed result over any micro-batch split equals
the one-shot batch result over the union of the queries —
stream-vs-batch parity is bit-exact (tests/test_stream_ann_serve.py).

Scale: per micro-batch cost is the batch path's cost (touched shards ×
walk work); no state accumulates in the serving loop — the index is the
only state, maintained separately by ann_ingest.

Output contract (read this before consuming ``out_path``):

- Hits land under ``out_path/batch=<id>``, so a plain
  ``spark.read.parquet(out_path)`` partition-discovers ONE EXTRA int
  column ``batch`` — the micro-batch id, deliberately exposed as
  provenance (drop it if you only want hits; select explicit columns as
  the tests do).
- Replay visibility: foreachBatch is at-least-once, and a replayed
  batch OVERWRITES its own directory. The delete-then-write is atomic
  only at stream completion — a concurrent reader racing a mid-rewrite
  batch may transiently observe that batch's hits missing or partial.
  Read after ``query.awaitTermination()`` (availableNow) or tolerate
  per-batch staleness in continuous mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class IndexServe:
    """foreachBatch sink answering query micro-batches with index probes."""

    def __init__(
        self,
        index,
        out_path: str,
        vec_col: str,
        qid_col: str,
        k: int = 10,
        n_probe: int | None = None,
        rerank=None,
    ):
        self.index = index
        self.out_path = out_path
        self.vec_col = vec_col
        self.qid_col = qid_col
        self.k = k
        self.n_probe = n_probe
        self.rerank = rerank
        self.batches = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hits = self.index.search_batch(
            batch_df,
            self.vec_col,
            self.qid_col,
            k=self.k,
            n_probe=self.n_probe,
            rerank=self.rerank,
        )
        # one parquet sub-dir per micro-batch: a replayed batch
        # (at-least-once foreachBatch) overwrites its own output instead
        # of duplicating hits. The batch=<id> naming intentionally
        # surfaces a `batch` provenance column on read, and the
        # overwrite is NOT atomic for concurrent readers mid-rewrite —
        # both documented in the module docstring's output contract
        hits.write.mode("overwrite").parquet(f"{self.out_path}/batch={batch_id}")
        self.batches += 1


def serve_stream(
    query_stream: DataFrame,
    index,
    out_path: str,
    checkpoint_dir: str,
    vec_col: str,
    qid_col: str,
    k: int = 10,
    n_probe: int | None = None,
    rerank=None,
) -> tuple:
    """Attach the serving sink to a streaming query DataFrame;
    availableNow drains the staged queries and stops. Returns
    (query, serve) — read ``spark.read.parquet(out_path)`` after
    ``query.awaitTermination()`` for all hits. The read carries an extra
    ``batch`` provenance column and a replay-visibility caveat — see the
    module docstring's output contract."""
    serve = IndexServe(
        index, out_path, vec_col, qid_col, k=k, n_probe=n_probe, rerank=rerank
    )
    q = (
        query_stream.writeStream.foreachBatch(serve)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, serve
