"""Streaming ANN ingestion (streaming/ann_ingest.py): micro-batches of
embeddings fold into a routed ShardedHNSW via foreachBatch — the streaming
twin of the driver-gated batch insert (ann_hnsw_routed_insert; reference
InsertVectorEntry, src/storage/index/hnsw_index.cpp:204-279)."""

import os

import pytest
from pyspark.sql import functions as F

from bustub_vectordb_spark.index.hnsw import HNSWIndex


@pytest.fixture(scope="module")
def emb(tables):
    return tables["embeddings"]


def _staged_files(spark, emb, tmpdir, n_files=3):
    """Write held-out rows (vec_id % 7 == 0) as n separate parquet files
    with deterministic lexicographic names — the staged stream input."""
    held = emb.filter(F.col("vec_id") % 7 == 0).select("vec_id", "embedding")
    rows = held.collect()
    os.makedirs(tmpdir, exist_ok=True)
    chunks = [rows[i::n_files] for i in range(n_files)]
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(
            [(r["vec_id"], list(r["embedding"])) for r in chunk],
            "vec_id long, embedding array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/part{i}")
    return chunks


@pytest.mark.slow
def test_stream_ingest_parity_and_idempotence(spark, emb, tmp_path):
    from bustub_vectordb_spark.streaming.ann_ingest import IndexIngest, ingest_stream

    base = emb.filter(F.col("vec_id") % 7 != 0)
    chunks = _staged_files(spark, emb, str(tmp_path / "stage"))

    # streamed: one micro-batch per staged file (maxFilesPerTrigger=1),
    # files arrive in name order
    idx_stream = HNSWIndex.build_routed(
        base, "embedding", "vec_id", shards=4, m=8, ef_construction=48, ef_search=48
    )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "stage" / "part*"))
    )
    q, ingest = ingest_stream(
        stream, idx_stream, "embedding", "vec_id", str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    assert ingest.batches == 3

    # batch twin: the same three chunks inserted sequentially in the same
    # order → bit-identical graph extensions → identical probes
    idx_batch = HNSWIndex.build_routed(
        base, "embedding", "vec_id", shards=4, m=8, ef_construction=48, ef_search=48
    )
    for chunk in chunks:
        df = spark.createDataFrame(
            [(r["vec_id"], list(r["embedding"])) for r in chunk],
            "vec_id long, embedding array<double>",
        )
        idx_batch = idx_batch.insert(df)

    target = emb.filter(F.col("vec_id") % 7 == 0).limit(1).collect()[0]
    qv = [float(x) for x in target["embedding"]]
    got_s = [(r["vec_id"], r["distance"]) for r in ingest.index.probe(qv, 5, n_probe=2).collect()]
    got_b = [(r["vec_id"], r["distance"]) for r in idx_batch.probe(qv, 5, n_probe=2).collect()]
    assert got_s == got_b
    # the streamed-in vector is itself findable (top hit, distance 0)
    assert got_s[0][0] == target["vec_id"] and got_s[0][1] == pytest.approx(0.0)

    # at-least-once replay: re-delivering an already-ingested batch is a
    # no-op (ids semi-join away)
    replay = spark.createDataFrame(
        [(r["vec_id"], list(r["embedding"])) for r in chunks[0]],
        "vec_id long, embedding array<double>",
    )
    before = ingest.batches
    IndexIngest.__call__(ingest, replay, 999)
    assert ingest.batches == before  # nothing inserted


@pytest.mark.slow
def test_long_ingest_releases_superseded_state(spark, tables):
    """r6 storage fix: a long-running ingest stream must not accumulate
    one stale checkpoint generation per compaction fold — after
    >= 2 * COMPACT_EVERY batches the persistent-RDD count stays bounded
    and probes still see every inserted id."""
    from bustub_vectordb_spark.index.hnsw import HNSWIndex, ShardedHNSW
    from bustub_vectordb_spark.streaming.ann_ingest import IndexIngest

    emb = tables["embeddings"]
    jsc = spark.sparkContext._jsc.sc()
    old = ShardedHNSW.COMPACT_EVERY
    ShardedHNSW.COMPACT_EVERY = 3
    try:
        idx = HNSWIndex.build_routed(
            emb, "embedding", "vec_id", shards=4, m=8,
            ef_construction=48, ef_search=48,
        )
        ingest = IndexIngest(idx)
        ingest.COMPACT_EVERY = 3  # instance attr: sink mutates itself
        base = jsc.getPersistentRDDs().size()
        for i in range(8):  # >= 2 folds of both the index and the seen set
            batch = spark.createDataFrame(
                [(70000 + i, [0.02 * i] * 64)],
                "vec_id long, embedding array<double>",
            )
            ingest(batch, i)
        grown = jsc.getPersistentRDDs().size() - base
        # bound: <= one outstanding generation per state (index leaves +
        # seen leaves + members cache), NOT one per batch
        assert grown <= 10, grown
        got = {
            r["vec_id"]
            for r in ingest.index.probe([0.02 * 7] * 64, 3, n_probe=2).collect()
        }
        assert 70007 in got
    finally:
        ShardedHNSW.COMPACT_EVERY = old
