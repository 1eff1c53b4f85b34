"""Persistent bucketed table layout — shuffle-free co-located joins.

The reference is a single-node engine whose hash join always rebuilds its
hash table per query (src/execution/hash_join_executor.cpp is the stubbed
operator; the semantics come from the planner, SURVEY.md §2.1). On a
cluster the equivalent cost is the SHUFFLE both join inputs pay on every
query. Bucketing is the Spark-native amortization: write each fact table
hash-partitioned by its join key once (`bucketBy`), and every subsequent
equi-join on that key is co-located — the SortMergeJoin runs with NO
Exchange on either side.

At 100 TB this is the single biggest join optimization available: the
lineitem⋈orders shuffle (the dominant cost of q2-style queries) disappears
entirely, replaced by a one-time layout cost amortized over every query in
the workload.

Two layout invariants make it work, both enforced here:
  * both tables use the SAME bucket count, so bucket i of one table joins
    only bucket i of the other;
  * the frame is `repartition(n, key)` BEFORE `bucketBy(n, key)` —
    repartition uses the same Murmur3+pmod bucket function as bucketBy, so
    each write task holds exactly one bucket → one file per bucket (a
    thousand-task cluster write would otherwise produce tasks×buckets tiny
    files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import read_table

# (table, bucket key) pairs that share a join column; same bucket count
# everywhere so any pair co-locates.
DEFAULT_LAYOUT = (("orders", "o_orderkey"), ("lineitem", "l_orderkey"))


def bucket_table_name(table: str, sf_dir: str) -> str:
    # one bucketed copy per source dir (sf0.001 / sf0.01 / ... coexist)
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")
    return f"{table}_bucketed_{tag}"


def bucketize(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = 16,
    layout: tuple[tuple[str, str], ...] = DEFAULT_LAYOUT,
    path_prefix: str | None = "/tmp/spark_graft_bucketed",
) -> dict[str, str]:
    """Write bucketed copies of `layout` tables; returns {table: bucketed name}.

    Idempotent per session: skips tables already in the catalog. Bucketed
    output requires `saveAsTable` (the bucket spec lives in the table
    catalog, not the files); `path_prefix` makes them external tables at an
    explicit location, otherwise they land in the session warehouse dir.
    """
    out = {}
    for table, key in layout:
        name = bucket_table_name(table, sf_dir)
        out[table] = name
        if spark.catalog.tableExists(name):
            continue
        df = read_table(spark, sf_dir, table)
        w = (
            df.repartition(n_buckets, F.col(key))
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .format("parquet")
        )
        if path_prefix:
            w = w.option("path", f"{path_prefix.rstrip('/')}/{name}")
        w.saveAsTable(name)
    return out


def colocated_join(
    spark: SparkSession, sf_dir: str, n_buckets: int = 16
) -> DataFrame:
    """lineitem⋈orders on the bucket key — zero-Exchange join inputs.

    Returns the joined frame (callers add their aggregation); the plan-shape
    test asserts no Exchange appears below the SortMergeJoin.
    """
    names = bucketize(spark, sf_dir, n_buckets=n_buckets)
    li = spark.table(names["lineitem"])
    o = spark.table(names["orders"])
    return li.join(o, li["l_orderkey"] == o["o_orderkey"])


def colocated_join_agg(
    spark: SparkSession, sf_dir: str, n_buckets: int = 16
) -> DataFrame:
    """Order-priority revenue rollup over the co-located join.

    The groupBy key (o_orderpriority) differs from the bucket key, so the
    AGGREGATION still shuffles — but it shuffles the tiny partial-agg
    output, not the raw join inputs. That asymmetry (shuffle after
    reduction, never before) is the scale win.
    """
    j = colocated_join(spark, sf_dir, n_buckets=n_buckets)
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# =========================================================================
# Z-order (Morton) layout — multi-dimensional data skipping
# =========================================================================
#
# Bucketing co-locates JOINS; Z-ordering co-locates RANGE PREDICATES on
# several columns at once. Sorting a table by one column gives parquet
# min/max footer stats that prune scans on that column only — a 2-D box
# query (custkey range AND totalprice range) still reads every file. The
# Morton curve interleaves the bit-planes of both dimensions, so files
# covering a contiguous z-range cover a small RECTANGLE in value space and
# carry tight min/max stats on BOTH columns; Spark's parquet reader then
# drops whole files/row-groups at planning time from the same pushed
# filters it already has. This is the layout trick behind Delta/Iceberg
# OPTIMIZE ZORDER BY (Databricks' multi-dimensional clustering), built
# here from plain column arithmetic.
#
# The z-key is equi-width over the exact [min, max] of each dimension:
# deterministic (min/max are order-independent) and shuffle-free to train
# (one column-pruned agg). Heavily skewed columns would want equi-depth
# (quantile) buckets instead — same interleave, different bucketizer.

ZORDER_BITS = 16


def _spread_bits(col: F.Column, bits: int) -> F.Column:
    """Insert a zero between consecutive bits: b_i moves to position 2i
    (static unrolled shift/mask chain — `bits` terms of integer ALU work,
    whole-stage codegen)."""
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.shiftleft(F.shiftright(col, b).bitwiseAND(F.lit(1)), 2 * b)
    return out


def zorder_key(
    c1: F.Column,
    c2: F.Column,
    lo1: float,
    hi1: float,
    lo2: float,
    hi2: float,
    bits: int = ZORDER_BITS,
) -> F.Column:
    """Morton-interleaved key over two equi-width-bucketed dimensions."""
    n = (1 << bits) - 1

    def bucket(c, lo, hi):
        if hi <= lo:
            return F.lit(0).cast("long")
        scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo)) * (n + 1)
        return F.greatest(
            F.lit(0).cast("long"),
            F.least(F.lit(n).cast("long"), F.floor(scaled).cast("long")),
        )

    return _spread_bits(bucket(c1, lo1, hi1), bits) + F.shiftleft(
        _spread_bits(bucket(c2, lo2, hi2), bits), 1
    )


def zorder_write(
    df: DataFrame, col1: str, col2: str, path: str, n_files: int = 16
) -> None:
    """Write a Z-ordered parquet copy clustered on (col1, col2).

    Bounds come from one column-pruned min/max agg (driver holds 4
    scalars); the data path is repartitionByRange on the z-key (range
    exchange = contiguous z-runs per file, which is what makes the footer
    stats tight) + an in-partition sort, then a plain parquet write. The
    layout cost is one shuffle, paid once, amortized over every 2-D range
    query that follows."""
    b = df.agg(
        F.min(col1).alias("lo1"),
        F.max(col1).alias("hi1"),
        F.min(col2).alias("lo2"),
        F.max(col2).alias("hi2"),
    ).collect()[0]
    if b["lo1"] is None or b["lo2"] is None:
        # empty input (min/max aggregate to NULL): an empty parquet dir is
        # the right output, not a TypeError inside the bucketizer
        df.write.mode("overwrite").parquet(path)
        return
    z = zorder_key(
        F.col(col1), F.col(col2), b["lo1"], b["hi1"], b["lo2"], b["hi2"]
    ).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
