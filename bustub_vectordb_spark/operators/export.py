"""Training-data export: deterministic sharding + global pseudo-shuffle.

The last stage of a training-data pipeline writes the prepared corpus as N
shard files in a reproducible pseudo-random order (so data-parallel trainers
stream disjoint, well-mixed slices without a separate shuffle service).

Spark-first shape:
  * shard assignment is a pure hash expression — ``md5(id) % n_shards``
    (md5, not xxhash64: reproducible in ANY engine with a VARCHAR md5, so
    the assignment itself is oracle-checkable and stable across engines /
    releases — same rationale as dedup/simhash.py's md5 variant);
  * the intra-shard order key is the NEXT 8 hex chars of the same digest —
    a deterministic per-row pseudo-random permutation, no RNG state;
  * the write is ``repartition(n_shards, shard)`` + ``partitionBy(shard)``
    → exactly one shuffle, each task writes one shard's file(s), and a
    reader lists only its shard directory (partition pruning).

At 100 TB: both expressions are whole-stage codegen; the single shuffle is
keyed by the (uniform) hash so there is no skew; shard count should be set
to O(total bytes / target file size), not O(executors).

The reference has no export surface; north-star extension alongside
operators/sampling.py (same md5 determinism contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

SHARD_COL = "shard"
ORDER_COL = "shard_pos"


def _digest(id_col: str) -> Column:
    return F.md5(F.col(id_col).cast("string"))


def shard_of(id_col: str, n_shards: int) -> Column:
    """0-based shard id: first 32 digest bits mod n_shards (uniform; md5 ==
    DuckDB's ``('0x' || substr(md5(id), 1, 8))::BIGINT % n``)."""
    h = F.conv(F.substring(_digest(id_col), 1, 8), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(n_shards)).cast("int")


def export_shards(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Assign every row a shard and a deterministic intra-shard position.

    ``shard_pos`` ranks rows inside each shard by the digest's next 32 bits
    (ties → id) — a reproducible global pseudo-shuffle: two runs, or two
    engines, produce the identical (shard, shard_pos) layout.
    """
    out = df.withColumn(SHARD_COL, shard_of(id_col, n_shards))
    order = F.substring(_digest(id_col), 9, 8)
    w = Window.partitionBy(SHARD_COL).orderBy(order, F.col(id_col))
    return out.withColumn(ORDER_COL, F.row_number().over(w))


def write_training_shards(
    df: DataFrame, id_col: str, n_shards: int, path: str
) -> None:
    """Materialize the export: one shuffle keyed by the uniform shard hash,
    one directory per shard (readers partition-prune to their slice),
    rows pre-sorted by shard_pos within each file."""
    out = export_shards(df, id_col, n_shards)
    (
        out.repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, ORDER_COL)
        .write.partitionBy(SHARD_COL)
        .mode("overwrite")
        .parquet(path)
    )
