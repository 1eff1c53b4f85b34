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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_verify_rounds_jaccard_like_batch_twin(spark):
    """The cross-corpus verify must round jaccard to 6 decimals BEFORE the
    threshold compare, exactly like near_dup_pairs — a borderline doc
    (jaccard 1/3 vs threshold 0.3333331) is admitted by the batch twin
    (round(1/3, 6) = 0.333333 < t) and must be admitted here too; a raw
    compare would reject it (0.3333... >= t)."""
    from bustub_vectordb_spark.dedup.minhash import near_dup_pairs

    a = (1, "a b c d")  # shingles {"a b c", "b c d"}
    b = (2, "a b c e")  # shingles {"a b c", "b c e"} -> jaccard = 1/3
    both = _docs(spark, [a, b])
    # precondition: the pair IS an LSH candidate (collides in some band) —
    # otherwise both code paths admit trivially and the test is vacuous
    assert near_dup_pairs(both, "text", "doc_id", threshold=0.3).count() == 1

    t = 0.3333331
    ingest = NearDupIngest(spark, threshold=t, seed_df=_docs(spark, [a]))
    ingest(_docs(spark, [b]), 0)
    admitted = {r["doc_id"] for r in ingest.admitted.collect()}
    assert admitted == {1, 2}, admitted


@pytest.mark.slow
def test_long_ingest_releases_superseded_state(spark):
    """r6 storage fix: the dedup sink's per-fold state compaction must
    release the superseded checkpoint leaves; admissions stay identical to
    a never-compacting twin over the same arrival order."""
    jsc = spark.sparkContext._jsc.sc()

    def run(compact_every):
        ingest = NearDupIngest(spark, threshold=0.5, seed_df=_docs(spark, BASE))
        ingest.COMPACT_EVERY = compact_every
        for i, doc in enumerate(ARRIVALS):
            ingest(_docs(spark, [doc]), i)
        for i in range(3):  # pad past 2 folds with novel docs
            ingest(_docs(spark, [(50 + i, f"unique padding document number {i} about topic {i}")]), 10 + i)
        return {r["doc_id"] for r in ingest.admitted.collect()}

    base = jsc.getPersistentRDDs().size()
    compacting = run(3)
    grown = jsc.getPersistentRDDs().size() - base
    # bound: <= one outstanding generation of (admitted, bands, shingles)
    # plus <= COMPACT_EVERY deltas of each — NOT one leaf per batch
    assert grown <= 12, grown
    assert compacting == run(100)  # admissions invariant under compaction
