"""As-of join — match each left row to the latest right row at or before it.

The canonical event→state correlation (trade→latest quote, event→latest
profile snapshot, purchase→last prior touch). Spark has no built-in as-of
join; the naive rewrite — range join on ``r.t <= l.t`` then per-left-row
max — explodes to O(|matching pairs|) intermediate rows, which at 100 TB is
the difference between a job that finishes and one that doesn't.

Spark-first design (the UNION + WINDOW formulation, the standard scalable
shape — also how Flink's temporal join and kdb's aj are reasoned about):

  1. union both inputs with a side marker, right rows carrying their
     payload as one struct column (left rows carry NULL);
  2. one shuffle: partition by key, order by (time, side) — right sorts
     before left at equal timestamps, making the match inclusive;
  3. running ``last(payload, ignorenulls=True)`` over the ordered frame
     gives every left row the most recent right payload in O(n log n)
     sort work, zero join blowup, one Exchange total;
  4. filter back to left rows, unpack the struct, optionally null out
     matches older than ``tolerance``.

Determinism: ties among right rows at the same (key, time) are broken by
ordering on the payload struct itself (lexicographic over its fields), so
results are reproducible across engines — the DuckDB oracle replays the
identical ordering.

This operator is a north-star extension (BASELINE.json: as-of/range joins
for training pipelines); the reference has no temporal join surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_time: str,
    right_time: str,
    right_prefix: str = "r_",
    tolerance: int | float | None = None,
) -> DataFrame:
    """Backward inclusive as-of join (left join semantics).

    Every left row gains ``right_prefix + c`` for each non-key right column
    ``c`` (including ``right_time``), taken from the right row with the
    greatest ``right_time`` <= the left row's ``left_time`` within the same
    key group — NULLs when no such row exists, or when the match is more
    than ``tolerance`` time units older than the left row.

    Time columns must be mutually comparable (and numeric if ``tolerance``
    is given). Output column order: all left columns, then prefixed right
    columns in right-schema order.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rvals = [c for c in right.columns if c not in keys]
    lvals = [c for c in left.columns if c not in keys]

    payload = F.struct(*[F.col(c) for c in rvals])
    payload_type = right.select(payload.alias("__r")).schema["__r"].dataType.simpleString()

    lu = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lvals],
        F.lit(None).cast(payload_type).alias("__r"),
    )
    ru = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lvals],
        payload.alias("__r"),
    )

    w = (
        Window.partitionBy(*keys)
        # right (0) before left (1) at equal time → inclusive match;
        # struct ordering breaks right-side ties deterministically
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__r", ignorenulls=True).over(w)
    if tolerance is not None:
        matched = F.when(
            F.col("__t") - matched[right_time] <= F.lit(tolerance), matched
        )

    out = (
        lu.unionByName(ru)
        .withColumn("__m", matched)
        .filter(F.col("__is_left") == 1)
    )
    return out.select(
        *keys,
        *lvals,
        *[F.col("__m")[c].alias(right_prefix + c) for c in rvals],
    )
