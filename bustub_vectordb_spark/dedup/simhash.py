"""SimHash near-duplicate detection — 64-bit fingerprints, native Catalyst.

simhash(doc) = for each of 64 bits, sum +1/-1 over tokens according to that
bit of hash64(token); bit is set iff the sum is positive. Similar docs
differ in few bits → near-dup test is hamming(a, b) ≤ t via bit_count(a^b).

Candidate generation uses the pigeonhole principle: split the 64 bits into
``chunks`` chunks; a pair within hamming ≤ chunks-1 must agree on ≥1 whole
chunk → explode chunks, group by (chunk_idx, chunk_value), expand in-bucket
pairs, verify exact hamming. Like MinHash (see minhash.py), the bucket
GROUPBY — not a self-join — generates pairs, so the signature pipeline runs
once and shuffles once.

Signature computation is explode + 64 codegen'd conditional-sum aggregates
(one shuffle of 64 ints per doc after map-side partial aggregation) — the
same shape as MinHash signatures, and for the same reason: k interpreted
``aggregate()`` lambdas per row are ~10× slower than k codegen'd ``sum()``s.

Two hash functions:
  * ``xxhash64`` (default) — fastest, JVM-native, engine-specific.
  * ``md5``      — bits from the first 16 hex chars of md5(token); ~same
    quality, and exactly reproducible in any engine with a VARCHAR md5
    (DuckDB) — this is the variant the driver's hash-match oracle gates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 64


def _tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want, id_col)
    return df


def _hash_halves(tok: Column, hash_fn: str) -> tuple[Column, Column]:
    """(hi32, lo32) of the 64-bit token hash, each in [0, 2^32)."""
    if hash_fn == "xxhash64":
        h = F.xxhash64(tok)
        hi = F.shiftrightunsigned(h, 32)
        lo = h.bitwiseAND(F.lit(0xFFFFFFFF))
        return hi, lo
    if hash_fn == "md5":
        h = F.md5(tok)
        hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
        return hi, lo
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(id, __sim bigint) SimHash signatures.

    Explode tokens (multiset — duplicate tokens weigh like the classic
    algorithm), take 64 conditional-sum aggregates (codegen, map-side
    partial agg), then fold the 64 bit-sums into one BIGINT projection.
    """
    ex = _spread(df, id_col).select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("__t")
    )
    hi, lo = _hash_halves(F.col("__t"), hash_fn)
    sums = ex.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(lo if b < 32 else hi, b % 32).bitwiseAND(F.lit(1))
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"__b{b}")
            for b in range(BITS)
        ]
    )
    sig = F.lit(0).cast("long")
    for b in range(BITS):
        contrib = (
            F.lit(-(2**63)).cast("long") if b == 63 else F.lit(2**b).cast("long")
        )
        sig = sig + F.when(F.col(f"__b{b}") > 0, contrib).otherwise(
            F.lit(0).cast("long")
        )
    return sums.select(F.col(id_col), sig.alias("__sim"))


def simhash(text: Column | str, bits: int = 64, hash_fn: str = "xxhash64") -> Column:
    """Column-level SimHash (BIGINT) — for single-expression use; the
    pipeline path is :func:`simhash_signatures` (codegen aggregates)."""
    toks = _tokens(text)

    def one_hash(t):
        hi, lo = _hash_halves(t, hash_fn)
        return F.shiftleft(hi, 32).bitwiseOR(lo)

    hashes = F.transform(toks, one_hash)

    def bit_merger(b: int):
        return lambda acc, h: acc + (
            F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1
        ).cast("int")

    out = F.lit(0).cast("long")
    for b in range(bits):
        bitsum = F.aggregate(hashes, F.lit(0), bit_merger(b))
        contrib = (
            F.lit(-(2**63)).cast("long") if b == 63 else F.lit(2**b).cast("long")
        )
        out = out + F.when(bitsum > 0, contrib).otherwise(F.lit(0).cast("long"))
    return out


def hamming(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def _chunks(sig: Column, chunks: int, bits: int = BITS) -> Column:
    width = bits // chunks
    mask = (1 << width) - 1
    # arithmetic shift + mask == logical shift + mask for masked widths —
    # chosen because the DuckDB oracle's >> is arithmetic too
    return F.array(
        *[
            F.shiftright(sig, i * width).bitwiseAND(F.lit(mask))
            for i in range(chunks)
        ]
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id1, id2, hamming) pairs with hamming ≤ max_hamming.

    chunks must be > max_hamming for guaranteed recall (pigeonhole).
    """
    if chunks <= max_hamming:
        raise ValueError("need chunks > max_hamming for exact recall")
    sigs = simhash_signatures(df, text_col, id_col, hash_fn)
    banded = sigs.select(
        id_col,
        "__sim",
        F.posexplode(_chunks(F.col("__sim"), chunks)).alias("__ci", "__cv"),
    )
    # bucket-groupBy pair expansion, not a self-join — see module docstring
    members = F.array_sort(
        F.collect_list(F.struct(F.col(id_col).alias("i"), F.col("__sim").alias("s")))
    )
    buckets = (
        banded.groupBy("__ci", "__cv")
        .agg(members.alias("__ms"))
        .filter(F.size("__ms") > 1)
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("__ms"),
            lambda x, i: F.transform(
                F.slice(F.col("__ms"), i + 2, F.size(F.col("__ms"))),
                lambda y: F.struct(
                    x["i"].alias("id1"),
                    y["i"].alias("id2"),
                    hamming(x["s"], y["s"]).alias("hamming"),
                ),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_structs).alias("__p"))
        .select("__p.id1", "__p.id2", "__p.hamming")
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
