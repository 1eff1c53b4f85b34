"""Document chunking — split documents into overlapping token windows.

The standard pre-training / RAG preprocessing step: each document becomes
ceil(n_tokens / stride) chunks of up to ``window`` tokens, consecutive
chunks overlapping by ``window - stride`` tokens. Chunk ids are derived
from the token offset (offset // stride), so they are stable under any
partitioning — no ordering, no zipWithIndex, no driver round-trip.

Implementation is a single narrow projection + explode: tokenize, generate
the start offsets with ``sequence``, slice per offset, explode. No shuffle
at all — at 100 TB this is a pure map stage whose output feeds the usual
downstream shuffled ops (dedup, tokenizer batching). The dual DuckDB-SQL
builder computes the identical chunks for the oracle gate.

The reference has no text surface; north-star pipeline extension
(BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.repetition import tokens, tokens_sql


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Explode each document into (id, chunk_id, chunk, chunk_tokens) rows.

    ``chunk_id`` = start_offset // stride (0-based, dense, deterministic).
    The last chunk may be shorter than ``window``; a document shorter than
    ``window`` tokens yields exactly one chunk.
    """
    if not (0 < stride <= window):
        raise ValueError("need 0 < stride <= window")
    t = tokens(text_col)
    starts = F.sequence(F.lit(0), F.greatest(F.size(t) - 1, F.lit(0)), F.lit(stride))
    piece = lambda s: F.slice(t, s + 1, window)  # noqa: E731 — 1-based slice
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("int").alias("chunk_id"),
            F.concat_ws(" ", piece(s)).alias("chunk"),
            F.size(piece(s)).cast("bigint").alias("chunk_tokens"),
        ),
    )
    return df.select(F.col(id_col), F.explode(chunks).alias("c")).select(
        id_col, "c.chunk_id", "c.chunk", "c.chunk_tokens"
    )


def chunk_documents_sql(
    table: str,
    id_col: str,
    text_col: str,
    window: int = 32,
    stride: int = 24,
) -> str:
    """DuckDB query producing the identical chunk rows (1-based inclusive
    list slicing ``t[a:b]`` ≙ Spark ``slice(t, a, b - a + 1)``)."""
    toks = tokens_sql(text_col)
    return f"""
    SELECT {id_col}, c.chunk_id, c.chunk, c.chunk_tokens
    FROM (
        SELECT {id_col},
               unnest(list_transform(
                   range(0, greatest(len(t), 1), {stride}),
                   s -> struct_pack(
                       chunk_id := CAST(s // {stride} AS INTEGER),
                       chunk := array_to_string(t[s + 1 : s + {window}], ' '),
                       chunk_tokens := CAST(len(t[s + 1 : s + {window}]) AS BIGINT))
               )) AS c
        FROM (SELECT {id_col}, {toks} AS t FROM {table})
    )
    """
