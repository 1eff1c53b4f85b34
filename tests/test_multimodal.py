"""Multimodal column plumbing: schema, Arrow-batched decode stage, frame
sampling. The decode kernel is a documented stub (no codecs in container) —
the Spark-side contracts are what's under test."""

import pytest
from pyspark.sql import functions as F

from bustub_vectordb_spark.multimodal import (
    attach_fake_media,
    decode_and_featurize,
    frame_sample,
    media_metadata,
)


@pytest.fixture(scope="module")
def media(tables):
    return attach_fake_media(tables["documents"].limit(50), "doc_id", kind="video")


def test_media_schema(media):
    assert dict(media.dtypes)["media"] == "binary"
    meta_type = dict(media.dtypes)["media_meta"]
    assert "format" in meta_type and "n_frames" in meta_type


def test_metadata_pass_is_native(media):
    out = media_metadata(media)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    rows = out.select("media_bytes", "media_sha").collect()
    assert all(r["media_bytes"] == 32 for r in rows)  # 256-bit digest → 32 bytes


def test_decode_featurize_batch_shape(media):
    out = decode_and_featurize(media)
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r["features"]) == 16 for r in rows)
    # deterministic: same input → same features
    again = decode_and_featurize(media).collect()
    assert rows[0]["features"] == again[0]["features"]


def test_frame_sample_counts(media):
    out = frame_sample(media, every_n=10)
    got = out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    meta = {r["doc_id"]: r["media_meta"]["n_frames"] for r in media.collect()}
    for r in got:
        expect = (max(meta[r["doc_id"]] - 1, 0)) // 10 + 1
        assert r["n"] == expect
