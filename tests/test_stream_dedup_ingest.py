"""Streaming near-dup document ingestion (streaming/dedup_ingest.py): the
online admission filter — micro-batches of documents check against the
already-admitted corpus via the same MinHash-LSH + exact-Jaccard verify as
the driver-gated batch dedup (dedup_minhash_neardup / minhash_dedup)."""

import os

import pytest
from pyspark.sql import functions as F

from bustub_vectordb_spark.streaming.dedup_ingest import NearDupIngest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "spark structured streaming processes micro batches of records"),
    (3, "completely different content about distributed query engines"),
]
# 11 is a near-dup of 1; 12 of 2; 13/14 are novel; 15 is a near-dup of 13
ARRIVALS = [
    (11, "the quick brown fox jumps over the lazy dog again and once more"),
    (12, "spark structured streaming processes micro batches of records"),
    (13, "vector indexes route probes to the nearest centroid shards"),
    (14, "training data pipelines deduplicate documents before packing"),
    (15, "vector indexes route probes to the nearest centroid shards"),
]


def test_stream_admission_matches_batch_and_is_idempotent(spark, tmp_path):
    seed = _docs(spark, BASE)

    # streamed: one micro-batch per staged file, name order
    stage = str(tmp_path / "stage")
    os.makedirs(stage, exist_ok=True)
    chunks = [ARRIVALS[0:2], ARRIVALS[2:4], ARRIVALS[4:5]]
    for i, chunk in enumerate(chunks):
        _docs(spark, chunk).coalesce(1).write.mode("overwrite").parquet(
            f"{stage}/part{i}"
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/part*")
    )
    from bustub_vectordb_spark.streaming.dedup_ingest import ingest_dedup_stream

    q, ingest = ingest_dedup_stream(
        stream, spark, str(tmp_path / "ckpt"), seed_df=seed, threshold=0.5
    )
    q.awaitTermination()
    assert ingest.batches == 3

    admitted = {r["doc_id"] for r in ingest.admitted.collect()}
    # near-dups of the corpus rejected (11 vs 1, 12 vs 2, 15 vs admitted 13);
    # novel docs admitted
    assert admitted == {1, 2, 3, 13, 14}

    # batch twin: the same chunks pushed through the sink directly in the
    # same order produce the same admitted set
    ingest_b = NearDupIngest(spark, seed_df=seed, threshold=0.5)
    for i, chunk in enumerate(chunks):
        ingest_b(_docs(spark, chunk), i)
    assert {r["doc_id"] for r in ingest_b.admitted.collect()} == admitted

    # at-least-once replay: re-delivering a drained batch changes nothing
    before = ingest.batches
    ingest(_docs(spark, chunks[0]), 999)
    assert {r["doc_id"] for r in ingest.admitted.collect()} == admitted


def test_within_batch_single_pass_policy(spark):
    """A batch containing two near-dups of each other admits the lower id
    (minhash_dedup's single-pass policy), and short docs (< n tokens —
    no shingles) are admitted, never silently dropped."""
    ingest = NearDupIngest(spark, threshold=0.5)
    batch = _docs(
        spark,
        [
            (21, "one common sentence shared by both near duplicate rows"),
            (22, "one common sentence shared by both near duplicate rows"),
            (23, "tiny doc"),
        ],
    )
    ingest(batch, 0)
    admitted = {r["doc_id"] for r in ingest.admitted.collect()}
    assert admitted == {21, 23}


def test_state_survives_restart(spark, tmp_path):
    """save() persists the admitted corpus; load() reseeds a fresh sink
    whose state relations rebuild distributed — post-restart admission
    decisions match an uninterrupted run."""
    seed = _docs(spark, BASE)
    a = NearDupIngest(spark, seed_df=seed, threshold=0.5)
    a(_docs(spark, ARRIVALS[0:2]), 0)  # 11 rejected (≈1), 12 rejected (=2)
    a.save(str(tmp_path / "state"))

    b = NearDupIngest.load(spark, str(tmp_path / "state"), threshold=0.5)
    b(_docs(spark, ARRIVALS[2:4]), 1)
    b(_docs(spark, ARRIVALS[4:5]), 2)  # 15 rejected vs restarted-state 13

    # uninterrupted twin
    c = NearDupIngest(spark, seed_df=seed, threshold=0.5)
    for i, chunk in enumerate([ARRIVALS[0:2], ARRIVALS[2:4], ARRIVALS[4:5]]):
        c(_docs(spark, chunk), i)

    got = {r["doc_id"] for r in b.admitted.collect()}
    want = {r["doc_id"] for r in c.admitted.collect()}
    assert got == want == {1, 2, 3, 13, 14}
