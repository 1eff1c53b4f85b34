"""Adversarial edge cases: empty/degenerate docs in dedup, threshold
boundaries, session gap boundaries — the places where off-by-one or
fp-rounding bugs hide."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def weird_docs(spark):
    rows = [
        (1, ""),  # empty
        (2, "   "),  # whitespace only
        (3, "one"),  # < n tokens → no shingles
        (4, "one two"),  # bigram but no trigram
        (5, "a b c d e"),
        (6, "a b c d e"),  # exact dup of 5
        (7, "a b c d e f"),  # superset of 5
        (8, "A  B   c D e"),  # same tokens as 5 modulo case/whitespace
        (9, "x y z w v"),
        (10, "completely different text here now"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_jaccard(spark, docs, n, threshold):
    from bustub_vectordb_spark.dedup.minhash import shingles

    sh = docs.select("doc_id", shingles("text", n).alias("sh")).filter(
        F.size("sh") > 0
    )
    a = sh.select(F.col("doc_id").alias("id1"), F.col("sh").alias("s1"))
    b = sh.select(F.col("doc_id").alias("id2"), F.col("sh").alias("s2"))
    j = a.join(b, F.col("id1") < F.col("id2")).withColumn(
        "j", F.size(F.array_intersect("s1", "s2")) / F.size(F.array_union("s1", "s2"))
    )
    return {
        (r["id1"], r["id2"])
        for r in j.filter(F.round("j", 6) >= threshold).collect()
    }


@pytest.mark.parametrize("threshold", [0.2, 0.5, 0.8, 1.0])
def test_ngram_jaccard_degenerate_docs(spark, weird_docs, threshold):
    from bustub_vectordb_spark.dedup.jaccard import ngram_jaccard_pairs

    truth = _brute_jaccard(spark, weird_docs, 2, threshold)
    got = {
        (r["id1"], r["id2"])
        for r in ngram_jaccard_pairs(
            weird_docs, "text", "doc_id", threshold=threshold, n=2
        ).collect()
    }
    assert got == truth


def test_minhash_empty_docs_never_pair(spark, weird_docs):
    from bustub_vectordb_spark.dedup.minhash import minhash_lsh_candidates

    cands = minhash_lsh_candidates(weird_docs, "text", "doc_id").collect()
    ids = {x for r in cands for x in (r["id1"], r["id2"])}
    assert not ids & {1, 2, 3}, "shingle-less docs must not enter any band"


def test_exact_dup_and_case_normalization(spark, weird_docs):
    from bustub_vectordb_spark.dedup.exact import exact_dedup

    kept = sorted(
        r["doc_id"] for r in exact_dedup(weird_docs, "text", "doc_id").collect()
    )
    # 6 is an exact dup of 5; 8 normalizes (lower + whitespace) to 5 as well
    assert 5 in kept and 6 not in kept and 8 not in kept


def test_session_gap_boundary(spark):
    """Events exactly gap apart stay in one session; gap+1 splits."""
    from bustub_vectordb_spark.streaming.sessions import GAP_S, sessionize

    ns = 1_000_000_000
    rows = [
        # user 1: 0, GAP → one session (delta == gap keeps)
        (1, 0 * ns, 1.0),
        (1, GAP_S * ns, 1.0),
        # user 2: 0, GAP+1 → two sessions
        (2, 0 * ns, 1.0),
        (2, (GAP_S + 1) * ns, 1.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts long, value double")
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(ev).collect()
    )
    assert got == [
        (1, 0, GAP_S, 2),
        (2, 0, 0, 1),
        (2, GAP_S + 1, GAP_S + 1, 1),
    ]


def test_topn_per_group_ties(spark):
    """rank() tie semantics: both tied rows at rank 1, next rank is 3
    (test/sql/p3.20-window-function.slt golden behavior)."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 5), (2, 7)], "g long, v long"
    )
    w = Window.partitionBy("g").orderBy(F.col("v").desc())
    r = df.withColumn("rk", F.rank().over(w))
    got = sorted((x["g"], x["v"], x["rk"]) for x in r.collect())
    assert got == [(1, 5, 3), (1, 10, 1), (1, 10, 1), (2, 7, 1)]


def test_train_test_split_partition(spark, weird_docs):
    """Split is a partition (disjoint, exhaustive) and deterministic."""
    from bustub_vectordb_spark.operators.sampling import (
        deterministic_sample,
        train_test_split,
    )

    train, test = train_test_split(weird_docs, "doc_id", test_rate=0.3)
    tr = {r["doc_id"] for r in train.collect()}
    te = {r["doc_id"] for r in test.collect()}
    assert tr | te == set(range(1, 11)) and not (tr & te)
    # re-running yields the identical split
    tr2 = {r["doc_id"] for r in train_test_split(weird_docs, "doc_id", 0.3)[0].collect()}
    assert tr == tr2
    # sample(rate) == test side of split(rate)
    s = {r["doc_id"] for r in deterministic_sample(weird_docs, "doc_id", 0.3).collect()}
    assert s == te


def test_filtered_hnsw_empty_and_tiny_allowed(spark):
    """Degenerate filtered-search inputs: an empty allowed set returns 0
    rows (not an error, not unfiltered results); a single-id allowed set
    returns exactly that id regardless of its distance rank."""
    import random as _random

    from bustub_vectordb_spark.index.hnsw import HNSWIndex

    rng = _random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = HNSWIndex.build(df, "embedding", "vec_id", m=4, ef_construction=16, ef_search=16)
    q = rows[0][1]

    assert idx.probe(q, 5, allowed=[]).count() == 0
    got = idx.probe(q, 5, allowed=[77]).collect()
    assert [r["vec_id"] for r in got] == [77]

    # batch path agrees
    queries = df.limit(3).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    assert idx.search_batch(queries, "qv", k=5, allowed=[]).count() == 0
    b = idx.search_batch(queries, "qv", k=5, allowed=[77]).collect()
    assert len(b) == 3 and all(r["vec_id"] == 77 for r in b)

    # routed variant: empty allowed set → 0 rows through the shard walks
    routed = HNSWIndex.build_routed(
        df, "embedding", "vec_id", shards=2, m=4, ef_construction=16, ef_search=16
    )
    assert routed.probe(q, 5, n_probe=2, allowed=[]).count() == 0


def test_plan_knn_filtered_empty_result(spark):
    """plan_knn(where=) with a predicate matching nothing returns an empty
    DataFrame on both the index and seq_scan strategies."""
    from bustub_vectordb_spark.index.hnsw import HNSWIndex
    from bustub_vectordb_spark.index.registry import VectorIndexRegistry
    from bustub_vectordb_spark.index.selection import plan_knn

    rows = [(i, [float(i % 5), float(i % 3)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = HNSWIndex.build(df, "embedding", "vec_id", m=4, ef_construction=16, ef_search=16)
    reg = VectorIndexRegistry()
    reg.create("i", "t", "embedding", "hnsw", idx)
    for method in ("unset", "none"):
        plan = plan_knn(
            reg, "t", df, "embedding", [0.0, 0.0], 5,
            method=method, where=F.col("vec_id") < 0,
        )
        assert plan.df.count() == 0
