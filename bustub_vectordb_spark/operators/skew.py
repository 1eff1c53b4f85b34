"""Skew mitigation — salted equi-join.

AQE's skew-join splitting (enabled in session.py) handles most skew by
subdividing oversized shuffle partitions, but it only works for sort-merge
joins and after-the-fact. When one join key dominates (a null-like sentinel,
a celebrity user, an empty-text fingerprint) the explicit fix is salting:

  big side    gets a uniform salt in [0, salts)   — the hot key's rows
              spread over `salts` reducers
  small side  is replicated once per salt value   — every (key, salt)
              combination can still match

Join keys become (key, salt); results are identical to the plain equi-join
for inner/left joins (the big side is preserved exactly; the small side's
replication only widens the join key space). Cost: small side × salts —
use for genuinely small dimension sides, which is also when skew hurts most
(a broadcast join needs no salting; salt when the small side is too big to
broadcast but the key histogram is spiked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salts`` reducers.

    Correctness does not depend on which salt a row draws — any value in
    [0, salts) joins against the matching small-side replica — so rand() is
    safe under task retries.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join preserves big-side semantics only: inner/left "
            "(a replicated small side breaks right/full outer semantics)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    b = big.withColumn("__salt", (F.rand(seed) * salts).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return b.join(s, keys + ["__salt"], how).drop("__salt")
