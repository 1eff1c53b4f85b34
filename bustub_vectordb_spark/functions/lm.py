"""Bigram language-model scoring — the statistical quality signal.

CCNet (Wenzek et al., LREC'20) ranks web documents by language-model
perplexity; the heuristic quality_exprs ratios (functions/text.py) catch
boilerplate shape, an LM score catches *unlikely token sequences* —
gibberish, keyword stuffing, OCR noise — that look fine to length/punct
ratios. This module is the distributed, engine-replayable core of that
idea: a corpus-trained bigram MLE model and a per-document mean log-prob.

Probabilities are Laplace-smoothed over the corpus vocabulary,
p = (c(w1,w2) + 1) / (c(w1·) + |V|): unsmoothed MLE assigns probability 1
to any bigram whose prefix occurs exactly once (gibberish is full of
those — its unique continuations are "certain"), inverting the ranking
the scorer exists to produce. Smoothing also keeps the model applicable
to docs outside the training corpus (unseen bigrams get (0+1)/(c1+|V|)).

Spark-first shape (all codegen, no UDFs):
  * bigrams: one explode of zip_with(tokens, tokens[1:]) per doc;
  * model: two groupBy counts (bigram, unigram-prefix) — map-side
    combinable, shuffled once each on high-cardinality token keys;
  * scoring: two shuffle joins (bigram → its count, prefix → its count)
    then avg(ln p) per doc. At 100 TB the count tables are |vocab|-sized
    relations, NOT driver state — everything stays distributed.

ln() of identical doubles agrees across engines in practice; the gated
entry rounds the per-doc mean to 4 decimals, the same discipline every
float-aggregating oracle entry uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def doc_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) — one row per bigram OCCURRENCE (multiset, not
    distinct: the LM weighs repeated sequences like the classic model)."""
    toks = _tokens(text_col)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return docs.select(
        F.col(id_col), F.explode(pairs).alias("__bg")
    ).select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))


def bigram_lm_scores(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_bigrams, avg_logp) — mean natural-log Laplace-smoothed bigram
    probability per document under the corpus-trained model. Docs with < 2
    tokens have no bigrams and are absent (score them with a unigram
    fallback upstream if needed)."""
    bg = doc_bigrams(docs, text_col, id_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        docs.select(F.explode(_tokens(text_col)).alias("__t"))
        .agg(F.countDistinct("__t").alias("__v"))
    )
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "__logp",
            F.log((F.col("c12") + 1) / (F.col("c1") + F.col("__v"))),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("__logp"), 4).alias("avg_logp"),
    )
