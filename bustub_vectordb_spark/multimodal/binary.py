"""Multimodal columns: opaque binary media + typed metadata.

Design for a 100 TB media pipeline:
  * media payloads are ``binary`` columns (never strings — no charset
    round-trips), metadata is a typed struct column next to them;
  * all pixel/sample-touching work happens in Arrow-batched ``mapInPandas``
    stages so bytes move Python↔JVM once per batch, not per row;
  * partitioning follows the metadata (e.g. repartition by format or
    size-bucket before decode so batches are homogeneous).

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernel is stubbed: ``decode_and_featurize`` tries to import PIL and
otherwise produces a deterministic fake feature vector derived from the
bytes. The Spark-side plumbing — schema, batching, UDF signatures, column
contracts — is real and tested; swapping in a real decoder changes only the
body of ``_decode_one``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, kind: str = "image") -> DataFrame:
    """Deterministic fake media: payload bytes derived from the id via
    sha2 — stands in for real image/audio blobs in tests."""
    payload = F.to_binary(
        F.sha2(F.concat(F.lit(kind), F.col(id_col).cast("string")), 256), F.lit("hex")
    )
    meta = F.struct(
        F.lit(kind).alias("format"),
        (F.pmod(F.col(id_col), F.lit(4)) * 64 + 64).cast("int").alias("width"),
        (F.pmod(F.col(id_col), F.lit(3)) * 64 + 64).cast("int").alias("height"),
        F.when(F.lit(kind) == "video", (F.pmod(F.col(id_col), F.lit(30)) + 1).cast("int"))
        .otherwise(F.lit(1))
        .alias("n_frames"),
        F.when(F.lit(kind) == "audio", F.lit(16000)).otherwise(F.lit(0)).alias("sample_rate"),
    )
    return df.withColumn("media", payload).withColumn("media_meta", meta)


def media_metadata(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Cheap metadata pass — pure JVM expressions, no decode: byte length +
    content hash. Runs at full scan speed; use it to bucket/filter before
    the expensive decode stage."""
    return df.withColumn("media_bytes", F.length(F.col(media_col)).cast("bigint")).withColumn(
        "media_sha", F.sha2(F.col(media_col), 256)
    )


def _decode_one(payload: bytes, meta) -> list[float]:
    """Decode kernel. Real decoder when available, deterministic fake
    otherwise (STUB — container has no image/audio libs)."""
    try:  # pragma: no cover - PIL absent in this container
        from io import BytesIO

        from PIL import Image

        img = Image.open(BytesIO(payload))
        img = img.convert("L").resize((8, 8))
        return [p / 255.0 for p in img.getdata()]
    except Exception:
        # deterministic fake: 16 floats from the md5 of the payload's HEX
        # form (hex, not raw bytes, so engines whose hash functions are
        # VARCHAR-only — DuckDB — can replicate it for the oracle gate)
        d = hashlib.md5((payload or b"").hex().encode()).digest()
        return [b / 255.0 for b in d[:16]]


def decode_and_featurize(
    df: DataFrame,
    media_col: str = "media",
    meta_col: str = "media_meta",
    feature_dim: int = 16,
) -> DataFrame:
    """Arrow-batched decode + feature-extraction stage.

    Output adds ``features array<double>``. Batch shape: whole Arrow record
    batches stream through a generator — constant memory per task, no
    per-row Python dispatch.
    """
    import pandas as pd

    out_fields = df.schema.fields + [
        T.StructField("features", T.ArrayType(T.DoubleType()))
    ]
    out_schema = T.StructType(out_fields)
    cols = df.columns

    def run(batches):
        for pdf in batches:
            feats = [
                _decode_one(p, m)[:feature_dim]
                for p, m in zip(pdf[media_col], pdf[meta_col])
            ]
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf[cols + ["features"]]

    return df.mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    media_col: str = "media",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index.

    Frame *extraction* is the stubbed decode kernel's job; the row-explosion
    plumbing (posexplode over the sampled frame indexes from metadata) is
    native and scale-safe: output rows ∝ frames/every_n.
    """
    n_frames = F.col(f"{meta_col}.n_frames")
    idxs = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.withColumn("frame_idx", F.explode(idxs))
