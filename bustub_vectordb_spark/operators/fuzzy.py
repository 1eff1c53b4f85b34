"""Fuzzy self-join (entity resolution) via pigeonhole slice blocking.

The entity-resolution primitive a training-data pipeline needs for
author/source/near-key reconciliation: all pairs of rows whose string keys
are within a small edit distance. The naive formulation is an O(n²) cross
join with a Levenshtein filter — the same scale-killer every dedup module
here avoids; the classic fix (PassJoin / Pass-Join partition signatures,
Li et al. VLDB'11; the same pigeonhole idea as SimHash bands in
dedup/simhash.py) is SLICE BLOCKING:

  split the key into B contiguous slices. Two equal-length strings at
  substitution distance d < B must agree EXACTLY on at least one slice
  (pigeonhole: d substitutions cannot touch all B slices). So candidates =
  union over slices of an EQUI-join on (slice index, slice text) — plain
  hash joins on short keys, never a cross product — and the exact
  Levenshtein check verifies only the candidates.

Completeness: guaranteed for substitution-only edits with d < B on
equal-length keys (the common fixed-format case: padded ids, codes,
hashes). Insertions/deletions shift slice boundaries, so general edit
distance needs the full PassJoin shifted-segment signatures — out of scope
here and documented as such; the verify step still uses true Levenshtein,
so the result is a SUBSET with no false positives either way.

Scale: B shuffles on (slice, text) blocks. Block skew mirrors LSH-band
skew — a degenerate corpus where every row shares a slice degrades toward
all-pairs within that block, the same hot-bucket hazard dedup/minhash.py
caps; callers with adversarial key distributions should raise B or salt
with length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    max_dist: int = 1,
    blocks: int | None = None,
) -> DataFrame:
    """(id1, id2, dist) for all id1 < id2 with levenshtein(key1, key2)
    <= ``max_dist``, equal-length substitution-complete for
    ``blocks`` > ``max_dist`` (default: max_dist + 1)."""
    b = blocks or max_dist + 1
    if b <= max_dist:
        raise ValueError(f"need blocks > max_dist for completeness: {b} <= {max_dist}")
    base = df.select(F.col(id_col).alias("_id"), F.col(key_col).alias("_key"))
    # slice i of B over the key's length: [floor(i*L/B)+1, floor((i+1)*L/B)]
    # (1-based substring) — identical arithmetic in the SQL oracle
    slices = base.select(
        "_id",
        "_key",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(b - 1)),
                lambda i: F.struct(
                    i.alias("slice_no"),
                    F.substring(
                        F.col("_key"),
                        (F.floor(i * F.length("_key") / b) + 1).cast("int"),
                        (
                            F.floor((i + 1) * F.length("_key") / b)
                            - F.floor(i * F.length("_key") / b)
                        ).cast("int"),
                    ).alias("slice_text"),
                ),
            )
        ).alias("s"),
    ).select("_id", "_key", "s.slice_no", "s.slice_text")
    a, c = slices.alias("a"), slices.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.slice_no") == F.col("c.slice_no"))
            & (F.col("a.slice_text") == F.col("c.slice_text"))
            & (F.col("a._id") < F.col("c._id")),
        )
        .select(
            F.col("a._id").alias("id1"),
            F.col("c._id").alias("id2"),
            F.col("a._key").alias("k1"),
            F.col("c._key").alias("k2"),
        )
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("k1", "k2"))
        .where(F.col("dist") <= max_dist)
        .select("id1", "id2", "dist")
    )


def fuzzy_self_pairs_oracle_sql(
    table: str, id_col: str, key_col: str, max_dist: int = 1, blocks: int | None = None
) -> str:
    """DuckDB replica: same slice arithmetic, same equi-join blocking,
    same Levenshtein verify (both engines implement the standard DP)."""
    b = blocks or max_dist + 1
    return f"""
    WITH base AS (SELECT {id_col} AS _id, {key_col} AS _key FROM {table}),
    slices AS (
        SELECT _id, _key, i AS slice_no,
               substr(_key, (len(_key) * i) // {b} + 1,
                      (len(_key) * (i + 1)) // {b} - (len(_key) * i) // {b})
                 AS slice_text
        FROM base, range({b}) r(i)
    ),
    cand AS (
        SELECT DISTINCT a._id AS id1, c._id AS id2, a._key AS k1, c._key AS k2
        FROM slices a JOIN slices c
          ON a.slice_no = c.slice_no AND a.slice_text = c.slice_text
         AND a._id < c._id
    )
    SELECT id1, id2, levenshtein(k1, k2)::INT AS dist
    FROM cand
    WHERE levenshtein(k1, k2) <= {max_dist}
    """
