"""Multi-vector MaxSim (similarity/maxsim.py): planted best-passage
semantics, single-query degeneration to per-doc max cosine, and the
one-shuffle plan shape."""

import pytest
from pyspark.sql import functions as F

from bustub_vectordb_spark.catalog import read_table
from bustub_vectordb_spark.queries import MAXSIM_QUERY_VECS
from bustub_vectordb_spark.similarity.maxsim import maxsim_scores


def test_planted_best_passage_wins(spark):
    """Doc A holds an exact copy of each query vector (score ~= Q);
    doc B holds orthogonal vectors (score ~= 0). Late interaction must
    rank A first with score ~= number of query vectors — a pooled/mean
    embedding of A would NOT score ~= Q, which is the point of MaxSim."""
    q0 = [1.0, 0.0, 0.0, 0.0]
    q1 = [0.0, 1.0, 0.0, 0.0]
    rows = [
        ("A", q0), ("A", q1),                      # exact per-aspect matches
        ("B", [0.0, 0.0, 1.0, 0.0]), ("B", [0.0, 0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "doc string, v array<double>")
    got = {
        r["doc"]: r["maxsim_score"]
        for r in maxsim_scores(df, "v", "doc", [q0, q1]).collect()
    }
    assert got["A"] == pytest.approx(2.0, abs=1e-6)
    assert got["B"] == pytest.approx(0.0, abs=1e-6)


def test_single_query_equals_max_cosine(spark, sf_dir):
    """With a 1-vector query bag the score reduces to the per-doc max
    cosine — cross-check against a direct groupBy max."""
    from bustub_vectordb_spark.functions.vector import cosine_similarity

    e = read_table(spark, sf_dir, "embeddings")
    q = MAXSIM_QUERY_VECS[0]
    got = {
        r["label"]: r["maxsim_score"]
        for r in maxsim_scores(e, "embedding", "label", [q]).collect()
    }
    want = {
        r["label"]: round(r["m"], 6)
        for r in e.groupBy("label")
        .agg(F.max(cosine_similarity("embedding", q)).alias("m"))
        .collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_single_shuffle_plan(spark, sf_dir):
    """The scoring plan carries exactly one Exchange (the doc-key agg) —
    per-query sims must not add shuffles."""
    e = read_table(spark, sf_dir, "embeddings")
    plan = maxsim_scores(
        e, "embedding", "label", MAXSIM_QUERY_VECS
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
