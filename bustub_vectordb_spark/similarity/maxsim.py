"""Multi-vector late-interaction retrieval (ColBERT MaxSim).

Khattab & Zaharia, SIGIR'20: a document is a BAG of vectors (one per
token/chunk), a query is a small bag of vectors, and relevance is

    score(q, d) = sum over query vectors j of  max over doc vectors v of
                  cos(q_j, v)

— "late interaction": no single pooled embedding, so a document matches on
its best passage per query aspect. The reference engine is single-vector
only (VECTOR(n) column + one distance op per query,
src/planner/plan_expression.cpp); multi-vector scoring is the natural
next surface for a vector engine feeding retrieval-augmented training
pipelines.

Spark shape — one shuffle, fully codegen:

  per-row   sims_j = cos(vec, q_j) for each of the Q query vectors: Q
            narrow fold expressions over the stored array, JVM-side;
  groupBy   doc key -> partial MAX per query vector (map-side combine
            shrinks the shuffle to |docs| x Q scalars, not |vectors|);
  finalize  sum the Q maxes, round 6 (absorbs fp summation-order drift
            vs the oracle).

At 100 TB this is the scan-side scoring kernel; candidate generation
(which docs to score) composes with any ANN tier in this package — route
with single-vector ANN over pooled/centroid vectors
(`vector_centroid_per_label`), then MaxSim-rescore the survivors.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions.vector import cosine_similarity


def maxsim_scores(
    df: DataFrame,
    vec_col: str,
    doc_col: str,
    queries: Sequence[Sequence[float]],
    score_col: str = "maxsim_score",
) -> DataFrame:
    """Per-doc MaxSim score against a bag of query vectors.

    Returns one row per distinct ``doc_col`` with the rounded late-
    interaction score; callers order/limit as needed."""
    if not queries:
        raise ValueError("maxsim needs at least one query vector")
    sims = [
        cosine_similarity(vec_col, list(q)).alias(f"_sim_{j}")
        for j, q in enumerate(queries)
    ]
    per_query_max = [F.max(f"_sim_{j}").alias(f"_m_{j}") for j in range(len(queries))]
    total = F.col("_m_0")
    for j in range(1, len(queries)):
        total = total + F.col(f"_m_{j}")
    return (
        df.select(doc_col, *sims)
        .groupBy(doc_col)
        .agg(*per_query_max)
        .select(doc_col, F.round(total, 6).alias(score_col))
    )


def maxsim_oracle_sql(
    table: str,
    vec_col: str,
    doc_col: str,
    queries: Sequence[Sequence[float]],
    score_col: str = "maxsim_score",
) -> str:
    """DuckDB replica: cross join the query bag, max cosine per (doc, qid),
    sum the maxes per doc — same fold order as the Spark side, rounded 6."""
    rows = ", ".join(
        f"({j}, [" + ", ".join(repr(float(x)) for x in q) + "]::DOUBLE[])"
        for j, q in enumerate(queries)
    )
    return f"""
    WITH q(qid, qv) AS (VALUES {rows}),
    per AS (
        SELECT {doc_col}, qid,
               max(list_cosine_similarity({vec_col}::DOUBLE[], qv)) AS m
        FROM {table} CROSS JOIN q
        GROUP BY {doc_col}, qid
    )
    SELECT {doc_col}, round(sum(m), 6) AS {score_col}
    FROM per
    GROUP BY {doc_col}
    ORDER BY {score_col} DESC, {doc_col} ASC
    """
