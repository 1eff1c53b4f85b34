"""Streaming ANN query serving (streaming/ann_serve.py): micro-batches of
queries probe the routed index through the gated batch path; serving is a
per-query pure function, so the streamed hits over any micro-batch split
equal the one-shot batch result — bit-exact."""

import os

from pyspark.sql import functions as F

from bustub_vectordb_spark.index.hnsw import HNSWIndex
from bustub_vectordb_spark.streaming.ann_serve import IndexServe, serve_stream


def _index(tables):
    return HNSWIndex.build_routed(
        tables["embeddings"], "embedding", "vec_id", shards=4, m=8,
        ef_construction=48, ef_search=48,
    )


def test_streamed_hits_match_batch(spark, tables, tmp_path):
    emb = tables["embeddings"]
    idx = _index(tables)
    queries = emb.filter(F.col("vec_id") % 53 == 1).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    # stage as 2 files -> 2 micro-batches via the SAME mtime-pinning
    # helper the gated streaming entries use (the file source orders by
    # mtime with no path tie-break — a same-tick write could flip batch
    # order under the replay assertion below)
    from bustub_vectordb_spark.queries import _stage_stream_parts

    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    _stage_stream_parts(
        stage,
        [
            ("p0", queries.filter(F.col("qid") < 250)),
            ("p1", queries.filter(F.col("qid") >= 250)),
        ],
    )
    stream = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/p*")
    )
    out = str(tmp_path / "hits")
    q, serve = serve_stream(
        stream, idx, out, str(tmp_path / "ckpt"), "embedding", "qid",
        k=5, n_probe=2,
    )
    q.awaitTermination()
    assert serve.batches == 2

    streamed = sorted(
        (r["qid"], r["vec_id"], r["distance"])
        for r in spark.read.parquet(out).select("qid", "vec_id", "distance").collect()
    )
    batch = sorted(
        (r["qid"], r["vec_id"], r["distance"])
        for r in idx.search_batch(queries, "embedding", "qid", k=5, n_probe=2).collect()
    )
    assert streamed == batch and len(streamed) > 0

    # at-least-once replay: re-delivering a batch overwrites its own
    # output (atomic per-batch directory), never duplicates hits
    replay = queries.filter(F.col("qid") < 250)
    IndexServe(idx, out, "embedding", "qid", k=5, n_probe=2)(replay, 0)
    again = sorted(
        (r["qid"], r["vec_id"], r["distance"])
        for r in spark.read.parquet(out).select("qid", "vec_id", "distance").collect()
    )
    assert again == batch
