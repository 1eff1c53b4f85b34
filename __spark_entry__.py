"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check at sf0.001.
queries()     — name → (spark, sf_dir) -> DataFrame, one per implemented
                operator from SURVEY.md §2 (registry lives in
                bustub_vectordb_spark.queries).
oracle_sql()  — name → equivalent DuckDB SQL for the hash-match oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bustub_vectordb_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's naive-KNN slice (vector.02-naive-knn.slt)
    over the sf0.001 embeddings table."""
    return Q.QUERIES["knn_l2"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql(sf_dir: str | None = None) -> dict[str, str]:
    # entries may be lazy callables (oracles that inline data-derived
    # artifacts, e.g. trained IVF centroids / replayed ANN graphs) —
    # resolve them here. ``sf_dir`` threads the scale-factor dir into those
    # generators explicitly; without it they fall back to
    # $SPARK_GRAFT_ORACLE_SF_DIR, then the driver gate's sf0.01.
    Q.set_oracle_sf(sf_dir)
    try:
        return {k: (v() if callable(v) else v) for k, v in Q.ORACLE.items()}
    finally:
        Q.set_oracle_sf(None)
