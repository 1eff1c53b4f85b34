"""Relational operators beyond bare DataFrame calls.

Most of the reference's executor inventory (seq scan, filter, projection,
joins, aggregation, sort, limit — ref: src/execution/*.cpp, SURVEY.md §2.1)
maps 1:1 onto DataFrame primitives and needs no wrapper; Catalyst plans the
physical strategy (broadcast vs shuffle join, TakeOrderedAndProject for
sort+limit, partial aggregation) better than any hand-written rule.

This module implements the operators that are *compositions*:

  top_n            — Sort+Limit fusion (ref TopNPlanNode,
                     src/execution/topn_executor.cpp:16-61). Spark already
                     plans orderBy().limit() as TakeOrderedAndProject, which
                     is a distributed per-partition-heap + merge — exactly the
                     reference's heap algorithm, but parallel.
  top_n_per_group  — ref TopNPerGroupPlanNode
                     (src/include/execution/plans/topn_per_group_plan.h:31-61):
                     rank/row_number window + filter. One shuffle on the
                     partition keys; no driver materialization.
  delete_rows      — DELETE as an anti-join rewrite (ref
                     src/execution/delete_executor.cpp tombstone semantics).
  update_rows      — UPDATE as a predicated column rewrite (ref
                     src/include/execution/plans/update_plan.h:29-41
                     delete-then-insert ≡ overwrite with target expressions).
  distinct         — DISTINCT planned as group-by-all-columns (ref
                     src/planner/plan_select.cpp:103-116).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ColumnOrName = Column | str


def top_n(df: DataFrame, order_by: list[Column | str], n: int) -> DataFrame:
    """Fused Sort+Limit. Catalyst plans TakeOrderedAndProject: size-n heaps
    per partition, merged on the driver — O(n) memory at any scale."""
    return df.orderBy(*order_by).limit(n)


def top_n_per_group(
    df: DataFrame,
    partition_by: list[ColumnOrName],
    order_by: list[Column | str],
    n: int,
    method: str = "row_number",
    rank_col: str | None = None,
) -> DataFrame:
    """Top-N within each group.

    method: 'row_number' (exactly n rows/group), 'rank' (SQL rank ties — the
    reference's leaderboard query uses rank() <= n semantics,
    ref test/sql/p3.leaderboard-q1-window.slt).

    Scale note: single shuffle on partition_by; skewed groups are split by
    AQE. For extreme skew prefer method='row_number' after a pre-aggregation.
    """
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    ranked = df.withColumn("__rk", fn().over(w)).filter(F.col("__rk") <= n)
    if rank_col:
        return ranked.withColumnRenamed("__rk", rank_col)
    return ranked.drop("__rk")


def distinct(df: DataFrame) -> DataFrame:
    """DISTINCT — planned by the reference as an aggregation with empty agg
    list over all columns; Spark's HashAggregate does the same with partial
    (map-side) dedup before the shuffle."""
    return df.distinct()


def delete_rows(df: DataFrame, predicate: Column) -> DataFrame:
    """DELETE WHERE predicate → keep the complement.

    Null predicate rows are kept (SQL: DELETE only removes rows where the
    predicate is TRUE, matching the reference's filtered-scan child).
    """
    return df.filter(~F.coalesce(predicate, F.lit(False)))


def update_rows(
    df: DataFrame, predicate: Column, assignments: dict[str, Column]
) -> DataFrame:
    """UPDATE SET col=expr WHERE predicate as a full-relation rewrite.

    The reference implements update as delete-then-insert per tuple; on an
    immutable distributed store the equivalent is a projection with
    CASE WHEN predicate THEN new ELSE old END per assigned column — one scan,
    no shuffle, and it composes with partition-overwrite sinks at scale.

    All target expressions and the predicate are evaluated against the OLD
    row (SQL UPDATE semantics; the reference evaluates target_expressions on
    the pre-image tuple) — hence a single select, not chained withColumn.
    """
    pred = F.coalesce(predicate, F.lit(False))
    cols = [
        F.when(pred, assignments[c]).otherwise(F.col(c)).alias(c)
        if c in assignments
        else F.col(c)
        for c in df.columns
    ]
    return df.select(*cols)
