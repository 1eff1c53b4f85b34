"""Range joins — band (|Δt| ≤ tol) and point-in-interval joins that never
plan a cartesian product.

Spark plans a join whose condition has NO equality conjunct as
BroadcastNestedLoopJoin / CartesianProduct — O(|L|·|R|) comparisons. At
100 TB that is the job that never finishes. Every range predicate over a
bounded band, however, can MANUFACTURE an equi-key: quantize time into
buckets as wide as the band, join on the bucket (one side also probing the
adjacent buckets), and evaluate the exact range predicate as a join
residual. The plan becomes a plain shuffle/sort-merge join on
(keys..., bucket):

  * comparisons drop from |L|·|R| to only the pairs in time-adjacent
    buckets — linear in output size for time-local data;
  * the shuffle spreads by bucket, so even a KEYLESS band join
    parallelizes across the cluster instead of broadcasting a side;
  * with equality keys given, the bucket is appended to the key — a single
    hot key (skew) is still split across its time buckets.

This is the standard bucketized range-join rewrite (cf. the published
Databricks range-join optimization and Flink's interval join, which bucket
state the same way). The reference has no temporal join surface; this is a
north-star extension alongside operators/asof.py.

Time columns must be integer-valued (epoch seconds/days/...); bucket
arithmetic uses exact integer floor division, so full-range int64 values
(e.g. epoch nanos) are safe.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(col_name: str, w: int) -> Column:
    # exact floor division for any int64 (pmod is the non-negative
    # remainder, so the numerator is exactly divisible; `div` never sees a
    # negative remainder and doubles are never involved)
    return F.expr(f"(({col_name}) - pmod(({col_name}), {w})) div {w}")


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    tolerance: int,
    on: Sequence[str] = (),
) -> DataFrame:
    """Inner join of all (left, right) pairs with |left_time − right_time|
    ≤ ``tolerance`` (and equal ``on`` keys, when given).

    Non-key column names must be disjoint between the two inputs (rename
    before calling). Output: left columns then right's non-key columns.

    Bucket width = tolerance: a left row in bucket b can only match right
    rows in buckets {b−1, b, b+1}, so the right side is exploded to those
    three buckets and the join key is (on..., bucket). Each qualifying pair
    meets in exactly one bucket (the left row's), so no dedup is needed.
    """
    if tolerance <= 0:
        raise ValueError("tolerance must be a positive integer")
    keys = list(on)
    w = int(tolerance)

    lb = left.withColumn("__b", _bucket(left_time, w))
    rb = right.withColumn(
        "__b",
        F.explode(
            F.array(*[_bucket(right_time, w) + F.lit(d) for d in (-1, 0, 1)])
        ),
    )
    cond = [lb["__b"] == rb["__b"]]
    for k in keys:
        cond.append(lb[k] == rb[k])
    residual = F.abs(lb[left_time] - rb[right_time]) <= F.lit(w)
    j = lb.join(rb, cond + [residual], "inner")
    rcols = [c for c in right.columns if c not in keys]
    return j.select(
        *[lb[c] for c in left.columns], *[rb[c] for c in rcols]
    )


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    start: str,
    end: str,
    point_time: str,
    bucket_width: int,
    on: Sequence[str] = (),
) -> DataFrame:
    """Inner join of each point to every interval with ``start ≤ point_time
    ≤ end`` (and equal ``on`` keys, when given).

    ``bucket_width`` should be ≥ the typical interval length (width = max
    length → each interval lands in ≤ 2 buckets); longer intervals still
    join correctly, they just explode into proportionally more buckets
    (sequence over the covered range). A point lives in exactly one bucket,
    so pairs are never duplicated.

    Non-key column names must be disjoint. Output: interval columns then
    the points' non-key columns.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be a positive integer")
    keys = list(on)
    w = int(bucket_width)

    # explicit aliases: both sides often derive from the SAME source frame
    # (self-join attribution shapes) — parent-frame column refs would then
    # resolve to identical attribute ids (Spark's "trivially true equals
    # predicate" warning + reliance on auto self-join disambiguation)
    ib = intervals.withColumn(
        "__b",
        F.explode(F.sequence(_bucket(start, w), _bucket(end, w))),
    ).alias("__ivl")
    pb = points.withColumn("__b", _bucket(point_time, w)).alias("__pt")
    iv = lambda c: F.col(f"__ivl.{c}")  # noqa: E731
    pt = lambda c: F.col(f"__pt.{c}")  # noqa: E731
    cond = [iv("__b") == pt("__b")]
    for k in keys:
        cond.append(iv(k) == pt(k))
    residual = (pt(point_time) >= iv(start)) & (pt(point_time) <= iv(end))
    j = ib.join(pb, cond + [residual], "inner")
    pcols = [c for c in points.columns if c not in keys]
    return j.select(
        *[iv(c) for c in intervals.columns], *[pt(c) for c in pcols]
    )
