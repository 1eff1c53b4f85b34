"""Corpus-statistics ranking — TF-IDF keyword extraction and BM25 retrieval.

Classic sparse retrieval (Robertson & Spärck Jones; the BM25 formula below
is the standard Okapi variant) expressed as pure DataFrame aggregation:

  term frequencies   explode tokens → groupBy(doc, term)     [shuffle 1]
  document freqs     groupBy(term) over the tf table          [shuffle 2]
  corpus scalars     N, avgdl — one tiny agg, broadcast back

Everything downstream is joins on `term` (dimension-sized → broadcast) and
per-doc window/top-k. No driver-side state grows with the corpus: at 100 TB
the tf table is the big intermediate and it stays (doc, term)-partitioned.

Dual DuckDB-SQL builders compute the identical formulas (same log base,
same smoothing, same rounding) for the oracle gate. North-star pipeline
extension — the reference has no text surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .repetition import tokens, tokens_sql

# Okapi BM25 constants (standard defaults)
BM25_K1 = 1.2
BM25_B = 0.75


def term_freqs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) — lowercased whitespace tokens."""
    return (
        df.select(F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def _tf_sql(table: str, id_col: str, text_col: str) -> str:
    toks = tokens_sql(f"lower({text_col})")
    return f"""
        SELECT {id_col}, term, count(*) AS tf
        FROM (SELECT {id_col}, unnest({toks}) AS term FROM {table})
        GROUP BY {id_col}, term
    """


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 1
) -> DataFrame:
    """Per-document top-k terms by TF-IDF (idf = ln(N / df); ties broken by
    term asc). Returns (id, term, score)."""
    tf = term_freqs(df, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, "term", "score")
    )


def tfidf_top_terms_sql(
    table: str, id_col: str, text_col: str, k: int = 1
) -> str:
    return f"""
    SELECT {id_col}, term, score
    FROM (
        SELECT {id_col}, term,
               round(tf * ln((SELECT count(*) FROM {table}) / df), 6) AS score,
               row_number() OVER (
                   PARTITION BY {id_col}
                   ORDER BY round(tf * ln((SELECT count(*) FROM {table}) / df), 6) DESC,
                            term ASC) AS rn
        FROM ({_tf_sql(table, id_col, text_col)}) t1
        JOIN (SELECT term, count(*) AS df
              FROM ({_tf_sql(table, id_col, text_col)}) t2 GROUP BY term) d USING (term)
    )
    WHERE rn <= {k}
    """


def bm25_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 20,
) -> DataFrame:
    """Top-k documents for a bag-of-words query under Okapi BM25.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5));
    tf part = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    Returns (id, score) ordered by score desc, id asc.
    """
    qt = [t.lower() for t in query_terms]
    tf = term_freqs(df, id_col, text_col).filter(F.col("term").isin(qt))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    dl = df.select(F.col(id_col), F.size(tokens(text_col)).alias("dl"))
    corpus = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .groupBy(id_col)
        .agg(F.round(F.sum(idf * tf_part), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def bm25_search_sql(
    table: str,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 20,
) -> str:
    terms = ", ".join(f"'{t.lower()}'" for t in query_terms)
    return f"""
    WITH tf AS (
        SELECT * FROM ({_tf_sql(table, id_col, text_col)}) WHERE term IN ({terms})
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    dl AS (SELECT {id_col}, len({tokens_sql(text_col)}) AS dl FROM {table}),
    corpus AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl)
    SELECT {id_col},
           round(sum(
               ln(1 + (n_docs - df + 0.5) / (df + 0.5)) *
               (tf * ({BM25_K1} + 1)) /
               (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl))
           ), 6) AS score
    FROM tf JOIN dfreq USING (term) JOIN dl USING ({id_col}) CROSS JOIN corpus
    GROUP BY {id_col}
    ORDER BY score DESC, {id_col} ASC
    LIMIT {k}
    """


def hybrid_search_rrf(
    docs: DataFrame,
    emb: DataFrame,
    id_col: str,
    text_col: str,
    emb_id_col: str,
    vec_col: str,
    query_terms: list[str],
    query_vec: list[float],
    k: int = 10,
    depth: int = 20,
    c: int = 60,
) -> DataFrame:
    """Hybrid lexical+vector retrieval via Reciprocal Rank Fusion
    (Cormack et al., SIGIR'09): BM25 top-``depth`` over the text corpus
    and exact-cosine top-``depth`` over the embedding table fuse as
    rrf = Σ 1/(c + rank); top-``k`` by (rrf desc, id) — the standard
    first-stage retriever shape for RAG pipelines, where neither signal
    alone is robust.

    Scale: both branches are the already-scale-shaped components (BM25 =
    broadcast df-side joins over one tf shuffle; vector = TakeOrdered
    scan, swappable for an ANN index probe at corpus scale); the fusion
    itself joins two ``depth``-row relations — broadcast-trivial. Ranks
    tie-break on id on both engines, so fused scores are deterministic.
    """
    from pyspark.sql import Window

    from ..functions.vector import cosine_similarity

    lex = bm25_search(docs, id_col, text_col, query_terms, k=depth)
    wl = Window.orderBy(F.desc("score"), F.asc(id_col))
    lexr = lex.select(F.col(id_col).alias("__id"), F.row_number().over(wl).alias("__lr"))
    vec = (
        emb.select(
            F.col(emb_id_col).alias("__id"),
            cosine_similarity(vec_col, list(query_vec)).alias("__sim"),
        )
        .orderBy(F.desc("__sim"), F.asc("__id"))
        .limit(depth)
    )
    wv = Window.orderBy(F.desc("__sim"), F.asc("__id"))
    vecr = vec.select("__id", F.row_number().over(wv).alias("__vr"))
    fused = (
        lexr.join(vecr, "__id", "full_outer")
        .select(
            F.col("__id").alias(id_col),
            (
                F.coalesce(1.0 / (F.lit(float(c)) + F.col("__lr")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(float(c)) + F.col("__vr")), F.lit(0.0))
            ).alias("__rrf"),
        )
    )
    return (
        fused.orderBy(F.desc("__rrf"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("__rrf", 6).alias("rrf_score"))
    )
