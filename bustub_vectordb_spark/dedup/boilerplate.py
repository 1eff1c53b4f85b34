"""Corpus-level boilerplate removal — drop text spans shared across documents.

Web-crawl corpora carry boilerplate (nav bars, cookie banners, license
footers) repeated verbatim across many pages; document-level dedup keeps
one copy of each PAGE but leaves the boilerplate inside every kept page.
CCNet and RefinedWeb therefore dedup at the sub-document level: any span
that appears (near-)verbatim in ≥ `min_docs` distinct documents is removed
from ALL of them, and each document is reassembled from its surviving
spans.

Spark-first shape (three stages, each the cheapest possible):
  1. span extraction — operators/chunking.chunk_documents with
     stride == window (non-overlapping, so reassembly is lossless): a pure
     narrow map, zero shuffle;
  2. frequency — groupBy(chunk).countDistinct(doc): ONE shuffle with
     map-side partial aggregation; the "common" side that survives the
     HAVING is tiny (boilerplate is by definition a small distinct set);
  3. removal + reassembly — left_anti join against the common set, then
     one groupBy(doc) fold back into ordered text: one broadcast-able join
     plus one shuffle keyed by doc id.

At 100 TB nothing here materializes more than (spans × ids); there is no
pairwise comparison anywhere — frequency IS the dedup predicate.

The reference has no text surface; north-star pipeline extension alongside
dedup/minhash.py. DuckDB oracle: queries.py `boilerplate_removal` rebuilds
the identical spans (chunk_documents_sql) and reassembles with
string_agg(ORDER BY chunk_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.chunking import chunk_documents


def remove_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """(id_col, clean_text, removed_chunks) per input document.

    A chunk (non-overlapping ``window``-token span) is boilerplate when it
    occurs in ≥ ``min_docs`` DISTINCT documents; every occurrence is
    removed. Documents whose every chunk was boilerplate come back with
    empty ``clean_text`` (they are candidates for dropping downstream, but
    that is the caller's policy decision, not this operator's).
    """
    # the exploded chunk relation feeds THREE consumers (frequency, the
    # anti join, per-doc totals) — without persist the narrow chunking
    # subtree re-executes three times inside the one final plan
    chunks = chunk_documents(
        df, id_col, text_col, window=window, stride=window
    ).persist()
    common = (
        chunks.groupBy("chunk")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("chunk")
    )
    kept = chunks.join(common, "chunk", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_id", "chunk"))),
                lambda s: s["chunk"],
            ),
        ).alias("clean_text"),
        F.count("*").alias("__kept"),
    )
    total = chunks.groupBy(id_col).agg(F.count("*").alias("__total"))
    return (
        total.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            (F.col("__total") - F.coalesce(F.col("__kept"), F.lit(0)))
            .cast("bigint")
            .alias("removed_chunks"),
        )
    )
