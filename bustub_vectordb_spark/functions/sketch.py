"""KMV (k-minimum-values) distinct-count sketch.

The pipeline statistic behind corpus cards ("~4.1e9 distinct 13-gram
shingles") cannot be an exact COUNT(DISTINCT) at 100 TB — the distinct
shuffle materializes the full vocabulary. The KMV estimator (Bar-Yossef
et al., RANDOM'02; the bottom-k variant of Beyer et al., SIGMOD'07)
keeps only the k smallest hash values: if the k-th smallest normalized
hash is h_k, the value universe is estimated as (k-1)/h_k.

Spark-first shape:
  * hash every value JVM-side (md5 → 48-bit int, exact in a double);
  * ``ORDER BY h LIMIT k`` is Spark's TakeOrdered — each partition keeps
    its local k, the driver merges partitions × k ints. Nothing
    vocabulary-sized ever shuffles or reaches the driver;
  * dedup before the take is a partial-agg distinct on the hash only.

md5 (not xxhash64) so the DuckDB oracle replays the sketch bit for bit:
a 48-bit hash is exact in a BIGINT and in the IEEE double division both
engines evaluate identically. Estimation error is the textbook
~1/sqrt(k-1) (k=256 → ~6%); the gated entry also emits the exact count
so the error is visible in the result row.

No reference counterpart (the reference has no sketch surface); this is
a north-star extension of the aggregation family (SURVEY §2.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_K = 256
_HASH_SPACE = float(1 << 48)  # 12 hex chars of md5 — exact in a double


def kmv_hash(value: Column | str) -> Column:
    """48-bit md5-derived hash of a string value (BIGINT in [0, 2^48))."""
    v = F.col(value) if isinstance(value, str) else value
    return F.conv(F.substring(F.md5(v), 1, 12), 16, 10).cast("long")


def kmv_distinct_estimate(
    values: DataFrame, value_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """One-row DataFrame ``(k int, n_est double)`` estimating the number
    of distinct ``value_col`` strings in ``values``.

    When fewer than k distinct hashes exist the sketch IS the exact
    distinct set and the estimate is that count (the standard small-range
    rule), so the operator is well-defined at every scale factor.
    """
    h = (
        values.select(kmv_hash(value_col).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    agg = h.agg(
        F.count("*").alias("cnt"), F.max("h").alias("kth")
    )
    est = F.when(
        F.col("cnt") < k, F.col("cnt").cast("double")
    ).otherwise(
        F.round(F.lit(float(k - 1)) / (F.col("kth") / F.lit(_HASH_SPACE)), 4)
    )
    return agg.select(F.lit(k).alias("k"), est.alias("n_est"))


def kmv_distinct_estimate_by(
    values: DataFrame, group_col: str, value_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """Group-wise KMV: ``(group, n_est)`` — one distinct-count estimate per
    group. The bottom-k per group is a row_number window over the DISTINCT
    hash set (vocab-sized per group, far smaller than the value stream;
    there is no per-group TakeOrdered in Spark, so the sort is the price
    of group-wise sketching — still nothing value-stream-sized shuffles).
    """
    from pyspark.sql import Window

    h = (
        values.select(F.col(group_col), kmv_hash(value_col).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("h")
    tk = h.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    agg = tk.groupBy(group_col).agg(
        F.count("*").alias("cnt"), F.max("h").alias("kth")
    )
    est = F.when(
        F.col("cnt") < k, F.col("cnt").cast("double")
    ).otherwise(
        F.round(F.lit(float(k - 1)) / (F.col("kth") / F.lit(_HASH_SPACE)), 4)
    )
    return agg.select(F.col(group_col), est.alias("n_est"))
