"""Sequence packing — assign documents to fixed token-budget training packs.

Pre-training dataloaders concatenate documents into fixed-length sequences
(e.g. 4096 tokens); the packing ASSIGNMENT — which documents share a pack,
in what order — must be deterministic and reproducible across engines so a
run can resume and an auditor can replay any batch.

Spark-first shape (the same determinism contract as operators/export.py):
  * documents pseudo-shuffle into ``n_shards`` streams by md5 (uniform,
    engine-independent — no RNG state);
  * within a shard, rows order by the digest's next 32 bits (ties → id):
    a reproducible permutation;
  * a running token total over that order assigns
    ``pack = cum_tokens_before // budget`` — greedy sequential packing,
    exactly what a streaming dataloader does; ``pack_id`` is globally
    unique as shard * 2³² + pack.

One window shuffle keyed by the uniform shard hash; the cumulative sum is
per-shard, so no global ordering bottleneck exists at any scale — shard
count scales with the corpus while each shard's window stays independent.
(A document longer than ``budget`` still gets a slot — it spans packs at
read time, the standard overflow policy.)

The reference has no export/batching surface; north-star extension.
DuckDB oracle: identical digest arithmetic + sum() OVER the same ordering
(queries.py `sequence_packing`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .export import shard_of, _digest


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    budget: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """(id_col, n_tokens, shard, pack_pos, pack_id) per row.

    ``pack_pos`` is the row's 1-based position inside its shard's
    deterministic order; ``pack_id`` = shard · 2³² + (cumulative tokens
    BEFORE this row) // budget.
    """
    out = df.select(
        F.col(id_col),
        token_count.cast("bigint").alias("n_tokens"),
        shard_of(id_col, n_shards).alias("shard"),
        F.substring(_digest(id_col), 9, 8).alias("__ord"),
    )
    w = Window.partitionBy("shard").orderBy("__ord", F.col(id_col))
    cum_before = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return out.select(
        id_col,
        "n_tokens",
        "shard",
        F.row_number().over(w).alias("pack_pos"),
        (F.col("shard").cast("bigint") * F.lit(2**32) + (cum_before / budget).cast("bigint")).alias("pack_id"),
    )
