"""SimHash near-duplicate detection — 64-bit fingerprints, native Catalyst.

simhash(doc) = for each of 64 bits, sum +1/-1 over tokens according to that
bit of xxhash64(token); bit is set iff the sum is positive. Similar docs
differ in few bits → near-dup test is hamming(a, b) ≤ t via bit_count(a^b).

Candidate generation uses the pigeonhole principle: split the 64 bits into
``chunks`` chunks; a pair within hamming ≤ chunks-1 must agree on ≥1 whole
chunk → explode chunks, self-join on (chunk_idx, chunk_value), verify exact
hamming. Same shuffle profile as MinHash-LSH (high-entropy keys).

Everything is expression-level (aggregate over the token array + bit ops);
the 64-term bit fold stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def simhash(text: Column | str, bits: int = 64) -> Column:
    """64-bit SimHash as a BIGINT column."""
    toks = _tokens(text)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_merger(b: int):
        # single (acc, elem) lambda — extra params would change what Spark
        # passes (see minhash._seeded_hash note)
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


def _chunks(sig: Column, chunks: int, bits: int = 64) -> Column:
    width = bits // chunks
    mask = (1 << width) - 1
    return F.array(
        *[
            F.shiftrightunsigned(sig, i * width).bitwiseAND(F.lit(mask))
            for i in range(chunks)
        ]
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """(id1, id2, hamming) pairs with hamming ≤ max_hamming.

    chunks must be > max_hamming for guaranteed recall (pigeonhole).
    """
    if chunks <= max_hamming:
        raise ValueError("need chunks > max_hamming for exact recall")
    sigs = df.select(F.col(id_col), simhash(text_col).alias("__sim"))
    banded = sigs.select(
        id_col,
        "__sim",
        F.posexplode(_chunks(F.col("__sim"), chunks)).alias("__ci", "__cv"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.__ci") == F.col("b.__ci"))
            & (F.col("a.__cv") == F.col("b.__cv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            hamming(F.col("a.__sim"), F.col("b.__sim")).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
