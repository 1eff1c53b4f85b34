"""Exact deduplication — hash-groupBy on a content fingerprint.

The canonical first pass of a training-data pipeline: group by the
md5-of-normalized-text fingerprint, keep one representative per group.
One shuffle on a uniformly-distributed 128-bit key — no skew, linear scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(fingerprint, n_copies, keep_id) per content group."""
    return df.groupBy(fingerprint(text_col).alias("fp")).agg(
        F.count("*").alias("n_copies"), F.min(id_col).alias("keep_id")
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep exactly one row (lowest id) per distinct normalized content.

    Window-free alternative to dropDuplicates: min-id per fingerprint then
    semi-join — two narrow shuffles on the hash, deterministic winner
    (dropDuplicates keeps an arbitrary row; pipelines want a stable one).
    """
    keep = (
        df.groupBy(fingerprint(text_col).alias("fp"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")
