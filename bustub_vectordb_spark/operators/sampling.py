"""Deterministic sampling / train-test splits for data pipelines.

Random sampling (``df.sample``) is irreproducible across runs, partitionings
and engines. Pipelines that feed training jobs need splits that are:

  * deterministic — same row → same split, forever, on any cluster layout;
  * engine-independent — auditable with any SQL engine (the DuckDB oracle
    hash-matches these operators);
  * join-free — computed from the row's own key, a narrow map at any scale.

Mechanism: md5(key) is uniform in [0, 16^k); comparing its first k hex
chars against a threshold string selects a ``rate`` fraction. String
comparison over lowercase hex is identical everywhere — no integer parsing,
no float rounding, no engine-specific hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HEX_CHARS = 4  # 16^4 = 65536 distinct buckets → rate granularity ~0.002%


def _hex_prefix(key: Column | str) -> Column:
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(c.cast("string")), 1, _HEX_CHARS)


def _threshold(rate: float) -> str:
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    n = int(rate * 16**_HEX_CHARS)
    if n >= 16**_HEX_CHARS:
        # rate 1.0: format() would yield the 5-char '10000', which sorts
        # BELOW most 4-char hex prefixes lexicographically; 'g' sorts above
        # every hex char, so `prefix < 'g'` keeps all rows
        return "g"
    return format(n, f"0{_HEX_CHARS}x")


def sample_hash_sql(key: str, rate: float) -> str:
    """DuckDB/ANSI predicate equivalent to :func:`deterministic_sample`."""
    return f"substr(md5(({key})::VARCHAR), 1, {_HEX_CHARS}) < '{_threshold(rate)}'"


def deterministic_sample(df: DataFrame, key: str, rate: float) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, selected by key hash."""
    return df.filter(_hex_prefix(key) < F.lit(_threshold(rate)))


def train_test_split(
    df: DataFrame, key: str, test_rate: float = 0.1
) -> tuple[DataFrame, DataFrame]:
    """(train, test) split — complementary, deterministic, leakage-free:
    the same key always lands on the same side."""
    t = F.lit(_threshold(test_rate))
    return df.filter(_hex_prefix(key) >= t), df.filter(_hex_prefix(key) < t)


def stratified_sample(
    df: DataFrame, key: str, stratum: str, rates: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive for
    training corpora (down-weight an over-represented language/source
    without a shuffle: the keep decision is a row-local hash compare).

    ``rates`` maps stratum value → keep fraction; strata not listed are
    dropped. Same key+rates → same sample on any engine or partitioning.
    """
    pred = F.lit(False)
    for value, rate in rates.items():
        pred = F.when(
            F.col(stratum) == value, _hex_prefix(key) < F.lit(_threshold(rate))
        ).otherwise(pred)
    return df.filter(pred)


def stratified_sample_sql(key: str, stratum: str, rates: dict[str, float]) -> str:
    """DuckDB predicate equivalent to :func:`stratified_sample`."""
    cases = " ".join(
        f"WHEN {stratum} = '{v}' THEN {sample_hash_sql(key, r)}"
        for v, r in rates.items()
    )
    return f"CASE {cases} ELSE false END"


def mixture_upsample(
    df: DataFrame, key: str, stratum: str, weights: dict[str, float]
) -> DataFrame:
    """Mixture weights that may EXCEED 1.0 — the source-weighting primitive
    training corpora use (Pile/Gopher-style: a high-value source is seen
    more than one epoch). Every row is emitted ``floor(w)`` times, plus one
    more when its hash lands below ``frac(w)``; strata not listed are
    dropped. Deterministic like everything in this module: same key +
    weights → the same multiset on any engine or partitioning.

    Output adds ``rep`` (1-based repeat index) so downstream export can
    shuffle on (key, rep) and repeats don't collapse. Scale shape: a pure
    projection + explode — rows out ∝ Σ weights, no shuffle, no RNG state.
    """
    n_expr = F.lit(0)
    for value, w in weights.items():
        if w < 0:
            raise ValueError("weights must be >= 0")
        base, frac = int(w), w - int(w)
        n_v = F.lit(base) + (
            (_hex_prefix(key) < F.lit(_threshold(frac))).cast("int")
            if frac > 0
            else F.lit(0)
        )
        n_expr = F.when(F.col(stratum) == value, n_v).otherwise(n_expr)
    out = df.withColumn("__n", n_expr).filter(F.col("__n") > 0)
    out = out.withColumn("rep", F.explode(F.sequence(F.lit(1), F.col("__n"))))
    # bigint rep matches DuckDB's range() element type for the oracle
    return out.withColumn("rep", F.col("rep").cast("bigint")).drop("__n")


def mixture_upsample_sql(key: str, stratum: str, weights: dict[str, float]) -> str:
    """DuckDB replica of :func:`mixture_upsample`: emits ``nn`` repeat
    counts per row; callers unnest ``range(1, nn+1)`` as ``rep``."""
    cases = " ".join(
        f"WHEN {stratum} = '{v}' THEN {int(w)}"
        + (
            f" + ({sample_hash_sql(key, w - int(w))})::INT"
            if w - int(w) > 0
            else ""
        )
        for v, w in weights.items()
    )
    return f"CASE {cases} ELSE 0 END"


def leakage_safe_split(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    test_rate: float = 0.1,
    threshold: float = 0.5,
) -> DataFrame:
    """Train/val split at NEAR-DUPLICATE-CLUSTER granularity.

    A plain key-hash split (:func:`train_test_split`) leaks whenever two
    near-duplicate documents hash to different sides — the validation set
    then contains (slightly reworded) training rows and scores are
    inflated. Here every document first joins its transitive near-dup
    component (MinHash-LSH candidate pairs → exact-Jaccard verify →
    connected components, the dedup family's tested machinery) and the
    SPLIT KEY IS THE COMPONENT MINIMUM id, so a whole duplicate cluster
    always lands on one side. Deterministic and engine-independent like
    every split in this module (md5 hex-prefix compare on the component
    id), so the DuckDB oracle replays it exactly.

    Returns (id_col, component, split∈{'train','val'}) for every input
    document. Scale shape: the LSH pipeline is banded (no all-pairs),
    components converge in duplicate-cluster diameter rounds, and the
    split itself is a row-local hash compare — no extra shuffle."""
    from ..dedup.components import connected_components
    from ..dedup.minhash import near_dup_pairs

    pairs = near_dup_pairs(docs, text_col, id_col, threshold=threshold)
    comp = connected_components(docs.select(id_col), pairs, id_col)
    t = F.lit(_threshold(test_rate))
    return comp.select(
        F.col(id_col),
        F.col("component"),
        F.when(
            _hex_prefix(F.col("component").cast("string")) < t, F.lit("val")
        )
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def weighted_sample(df: DataFrame, key: str, weight: "Column | str", k: int) -> DataFrame:
    """Weighted sampling WITHOUT replacement via A-Res keys (Efraimidis &
    Spirakis, IPL 2006): each row draws u from its md5-hash (deterministic,
    engine-replayable — same recipe as deterministic_sample) and wins with
    key ln(u)/w; the k LARGEST keys are the sample, giving inclusion
    probability proportional to weight. One TakeOrderedAndProject — no
    shuffle of the full table, reproducible on any engine/layout.

    The selection key is rounded to 12dp before ordering (ln/÷ are libm
    calls whose last ulp may differ across engines — relative drift
    ~1e-16, far below 5e-13 at any key magnitude). 6dp would be WRONG
    here, not just loose: keys live in [-33.3/w, 0], so for large weights
    a coarse round collapses a large fraction of heavy rows to exactly
    0.0 and the id tie-break then drives selection — a systematically
    id-biased "weighted" sample. Rows with weight <= 0 are excluded
    (zero-weight rows must never win; ln(u)/w would flip sign)."""
    w = F.col(weight) if isinstance(weight, str) else weight
    h = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 12), 16, 10).cast(
        "long"
    )
    u = (h + 1).cast("double") / F.lit(float(1 << 48))  # (0, 1]
    ares = F.round(F.log(u) / w.cast("double"), 12)
    return (
        df.where(w > 0)
        .withColumn("_ares", ares)
        .orderBy(F.col("_ares").desc(), F.col(key).asc())
        .limit(k)
        .drop("_ares")
    )
