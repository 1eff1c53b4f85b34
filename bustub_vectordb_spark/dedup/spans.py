"""Cross-document repeated-substring removal — exact sub-document dedup
with OVERLAPPING windows.

`dedup/boilerplate.py` removes frequency-common NON-overlapping chunks —
cheap, but phase-shifted repeats (the same sentence starting mid-chunk in
another document) slip through. This module is the exact-substring
discipline of Lee et al., "Deduplicating Training Data Makes Language
Models Better" (ACL 2022), re-expressed Spark-first: any ``k``-token
window whose text occurs in ≥ ``min_docs`` DISTINCT documents marks its
token range in EVERY document, marked ranges merge by position coverage,
and covered tokens are removed (so a repeated run of any length ≥ k is
excised in full, at any alignment).

Spark-first shape (no suffix array needed — window frequency is the
predicate, as in the paper's hash-based variant):

  1. windows — one narrow map per doc: ``transform(sequence(...))`` over
     the token array emits every k-token window string (same shingle
     machinery as MinHash, raw-case because removal edits real text);
  2. frequency — groupBy(window).count_distinct(doc): ONE shuffle with
     map-side partial aggregation; survivors of the HAVING are the rare
     common windows;
  3. coverage — each doc's common windows explode to their covered token
     positions (×k per marked window — proportional to REMOVED text, not
     the corpus), distinct per (doc, pos);
  4. removal + reassembly — tokens anti-join covered positions, one
     groupBy(doc) ordered fold back into text.

At 100 TB: windows ≈ tokens (narrow), the frequency shuffle keys are
high-entropy window hashes, and no pairwise comparison exists anywhere.
DuckDB oracle: queries.py `dedup_repeated_spans` rebuilds identical
windows/coverage with list_transform + generate_series CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _raw_tokens(text_col: str):
    # RAW case tokens: removal rewrites real text, so matching is exact
    # (Lee et al. operate on raw bytes); lowercase belongs to the
    # similarity family (minhash), not to exact excision. NULL text
    # coalesces to '' — F.size(NULL) is -1 in Spark, which would surface
    # as removed_tokens = -1 for a NULL-text row
    return F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")


def remove_repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_docs: int = 2,
    within_doc: bool = False,
) -> DataFrame:
    """(id_col, clean_text, removed_tokens) per input document.

    Every token covered by some ``k``-token window whose exact text occurs
    in ≥ ``min_docs`` distinct documents is removed from ALL documents;
    the survivors reassemble in order. Documents shorter than ``k`` tokens
    pass through unchanged (no window fits).

    ``within_doc=True`` switches the predicate from distinct-document
    frequency to TOTAL occurrence count — Lee et al.'s full discipline,
    which also excises a span repeated ``min_docs`` times INSIDE one
    document (self-repetition: templated lists, stuttering generations).
    """
    toks = df.select(
        F.col(id_col),
        F.posexplode(_raw_tokens(text_col)).alias("__pos", "__tok"),
    )
    wins = df.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                F.size(_raw_tokens(text_col)) >= k,
                F.transform(
                    F.sequence(
                        F.lit(1), F.size(_raw_tokens(text_col)) - (k - 1)
                    ),
                    lambda i: F.array_join(
                        F.slice(_raw_tokens(text_col), i, k), " "
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("__wpos", "__w"),
    )
    # the window relation feeds two consumers (frequency + coverage).
    # Persist it so the narrow windowing subtree computes once — but
    # SCOPED: `covered` is eagerly localCheckpointed below (its size is
    # proportional to REMOVED text, not the corpus), after which nothing
    # references `wins` and it unpersists before this function returns.
    # The session therefore never accumulates corpus-sized cached
    # windows across repeated calls; the only storage the returned plan
    # pins is the covered checkpoint (attach point for
    # shipping.release_checkpoint if a pipeline wants to free it after
    # materializing — exposed as `result.__covered_ckpt` below).
    wins = wins.persist()
    freq = (
        F.count("*") if within_doc else F.count_distinct(F.col(id_col))
    )
    common = (
        wins.groupBy("__w")
        .agg(freq.alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__w")
    )
    covered = (
        wins.join(common, "__w")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("__wpos"), F.col("__wpos") + (k - 1))
            ).alias("__pos"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    wins.unpersist(blocking=False)
    kept = toks.join(covered, [id_col, "__pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__tok"))),
                lambda s: s["__tok"],
            ),
        ).alias("clean_text"),
        F.count("*").alias("__kept"),
    )
    total = df.select(
        F.col(id_col), F.size(_raw_tokens(text_col)).alias("__total")
    )
    out = total.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        (F.col("__total") - F.coalesce(F.col("__kept"), F.lit(0))).alias(
            "removed_tokens"
        ),
    )
    # handle for pipelines that call this repeatedly: after materializing
    # `out`, shipping.release_checkpoint(out.__covered_ckpt) frees the
    # one checkpoint the plan pins (sized by removed text)
    out.__covered_ckpt = covered
    return out
