"""Benchmark decontamination — drop training docs that overlap an eval set.

Standard practice before training on web-scale corpora (the GPT-3 paper's
13-gram overlap filter is the canonical public description): any training
document sharing a word n-gram with a benchmark/eval document is flagged and
excluded, so downstream eval numbers measure generalization rather than
memorization.

Spark-first shape (the part that matters at 100 TB):
  * the BENCHMARK side is small (eval suites are 10³-10⁵ items) — its
    distinct shingle set is broadcast, so the training-corpus side never
    shuffles: explode shingles → broadcast hash semi-join → distinct ids;
  * the corpus side work is a narrow projection + explode, parallel over
    whatever partitioning the corpus already has;
  * flagging (LEFT join against the contaminated-id set) keeps the audit
    trail; ``decontaminate`` is the filtered view training reads.

The reference has no decontamination surface; north-star extension in the
dedup family (reuses dedup.minhash.shingles so the n-gram definition is
shared with the near-dup operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..dedup.minhash import shingles

FLAG_COL = "contaminated"


def contamination_flags(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """All of ``docs`` plus a boolean ``contaminated`` column: true iff the
    doc shares at least one word ``n``-gram with any ``bench`` document.
    Docs shorter than ``n`` tokens have no shingles and are never flagged
    (nothing to overlap on)."""
    doc_sh = docs.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("__sg")
    )
    bench_sh = bench.select(F.explode(shingles(text_col, n)).alias("__sg")).distinct()
    hit = (
        doc_sh.join(F.broadcast(bench_sh), "__sg", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn(FLAG_COL, F.lit(True))
    )
    return docs.join(hit, id_col, "left").withColumn(
        FLAG_COL, F.coalesce(F.col(FLAG_COL), F.lit(False))
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """The training view: ``docs`` minus every contaminated row."""
    return contamination_flags(docs, bench, text_col, id_col, n).filter(
        ~F.col(FLAG_COL)
    ).drop(FLAG_COL)
