"""Repetition-based quality metrics for training-data curation.

Gopher-style repetition filters (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", §A1.1) flag documents
whose text is dominated by repeated n-grams — boilerplate, scraped menus,
keyword stuffing. Adapted to token n-grams:

  top_ngram_frac(n)   occurrences of the single most frequent n-gram,
                      as a fraction of the document's n-gram count;
  dup_ngram_frac(n)   fraction of n-gram occurrences whose n-gram appears
                      more than once in the document.

Both are computed DISTRIBUTED: explode n-grams, aggregate per (doc, gram),
re-aggregate per doc. Two shuffles, both keyed by doc_id(+gram) — no
driver-side state, linear in corpus size, and the (doc, gram) key spreads
even a single giant document across the cluster. Like every operator in
functions/, each metric has a dual DuckDB-SQL builder computing the
identical formula so the oracle hash-matches exactly.

The reference has no text surface; this extends it per the north-star
pipeline scope (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_SPLIT = r"\s+"


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), TOKEN_SPLIT)


def tokens_sql(col: str = "text") -> str:
    return f"regexp_split_to_array(trim({col}), '\\s+')"


def ngrams(toks: Column | str, n: int) -> Column:
    """Token n-grams as space-joined strings; empty array when the document
    has fewer than ``n`` tokens (Spark's ``sequence`` would otherwise count
    DOWN for a negative stop and fabricate grams)."""
    t = F.col(toks) if isinstance(toks, str) else toks
    grams = F.transform(
        F.sequence(F.lit(0), F.size(t) - n),
        lambda i: F.concat_ws(" ", *[F.get(t, i + j) for j in range(n)]),
    )
    return F.when(F.size(t) >= n, grams).otherwise(F.array().cast("array<string>"))


def ngrams_sql(toks_expr: str, n: int) -> str:
    """DuckDB equivalent of :func:`ngrams` (1-based list indexing;
    ``range(start, stop)`` is stop-exclusive and empty when start >= stop,
    so the < n case needs no guard)."""
    parts = " || ' ' || ".join(f"({toks_expr})[i + {j}]" for j in range(n))
    return f"list_transform(range(1, len({toks_expr}) - {n - 2}), i -> {parts})"


def repetition_metrics(
    df: DataFrame, id_col: str, text_col: str, top_n: int = 2, dup_n: int = 3
) -> DataFrame:
    """Per-document repetition metrics: ``top{top_n}gram_frac`` and
    ``dup{dup_n}gram_frac`` (rounded to 6 digits; 0.0 for documents too
    short to form a single n-gram)."""
    out = None
    for n, kind in ((top_n, "top"), (dup_n, "dup")):
        grams = df.select(
            F.col(id_col), F.explode(ngrams(tokens(text_col), n)).alias("g")
        )
        counts = grams.groupBy(id_col, "g").agg(F.count("*").alias("cnt"))
        if kind == "top":
            frac = F.max("cnt") / F.sum("cnt")
        else:
            frac = F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))) / F.sum(
                "cnt"
            )
        per_doc = counts.groupBy(id_col).agg(
            F.round(frac, 6).alias(f"{kind}{n}gram_frac")
        )
        out = per_doc if out is None else out.join(per_doc, id_col, "left")
    # left joins keep docs with >= top_n but < dup_n tokens; absent = 0.0
    return df.select(id_col).join(out, id_col, "left").na.fill(0.0)


def repetition_metrics_sql(
    table: str, id_col: str, text_col: str, top_n: int = 2, dup_n: int = 3
) -> str:
    """DuckDB query computing the identical metrics (same names/rounding)."""
    toks = tokens_sql(text_col)

    def per_doc(n: int, kind: str) -> str:
        frac = (
            "max(cnt) / sum(cnt)"
            if kind == "top"
            else "sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) / sum(cnt)"
        )
        return f"""
        SELECT {id_col}, round({frac}, 6) AS {kind}{n}gram_frac
        FROM (
            SELECT {id_col}, g, count(*) AS cnt
            FROM (SELECT {id_col}, unnest({ngrams_sql(toks, n)}) AS g FROM {table})
            GROUP BY {id_col}, g
        )
        GROUP BY {id_col}
        """

    return f"""
    SELECT d.{id_col},
           coalesce(t.top{top_n}gram_frac, 0.0) AS top{top_n}gram_frac,
           coalesce(u.dup{dup_n}gram_frac, 0.0) AS dup{dup_n}gram_frac
    FROM {table} d
    LEFT JOIN ({per_doc(top_n, "top")}) t USING ({id_col})
    LEFT JOIN ({per_doc(dup_n, "dup")}) u USING ({id_col})
    """
