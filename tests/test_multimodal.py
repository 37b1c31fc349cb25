"""Tests for multimodal binary-column plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsar_cdc_experiment_spark.operators import multimodal as MM
from pulsar_cdc_experiment_spark.sources.tables import table


def test_attach_and_decode_stub(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(20)
    media = MM.attach_binary_payload(docs, "text", "doc_id")
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    feats = MM.decode_stub_features(media, feature_dim=8).collect()
    docs_by_id = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in feats:
        text = docs_by_id[r["media_id"]]
        assert r["n_bytes"] == len(text.encode())
        assert r["first_byte"] == text.encode()[0]
        assert len(r["feature"]) <= 8


def test_frame_sample_loses_no_bytes(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(10)
    media = MM.attach_binary_payload(docs, "text", "doc_id")
    frames = MM.frame_sample(media, every_n_bytes=64)
    back = frames.groupBy("media_id").agg(
        F.sum(F.octet_length("frame_bytes")).alias("total")
    )
    joined = back.join(media.select("media_id", F.col("meta.n_bytes").alias("n")), "media_id")
    assert joined.filter("total <> n").count() == 0


def test_decode_real_is_explicit_stub(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(1)
    media = MM.attach_binary_payload(docs, "text", "doc_id")
    with pytest.raises(NotImplementedError):
        MM.decode_real(media)
