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


def _media_df(spark, rows):
    """(media_id, payload) rows → MEDIA_SCHEMA DataFrame."""
    return spark.createDataFrame(
        [
            (i, p, {"mime": "x", "n_bytes": len(p) if p else 0, "source": "test"})
            for i, p in rows
        ],
        MM.MEDIA_SCHEMA,
    )


def test_decode_real_handcrafted_ppm(spark):
    """A PPM the synthesizer never emits: 2x1, with a header comment and
    multi-digit dimensions on separate lines — exercises the real header
    tokenizer, not just the happy-path layout."""
    ppm = b"P6\n# a comment\n2\n1\n255\n" + bytes([255, 0, 0, 0, 128, 64])
    out = MM.decode_real(_media_df(spark, [(1, ppm)])).collect()[0]
    assert (out["fmt"], out["width"], out["height"]) == ("ppm", 2, 1)
    assert (out["mean_r"], out["mean_g"], out["mean_b"]) == (127.5, 64.0, 32.0)


def test_decode_real_handcrafted_bmp_padded_stride(spark):
    """3px-wide 24-bpp BMP: row stride pads 9 → 12 bytes; the pad bytes
    must NOT leak into channel means, and BGR must come back as RGB."""
    import struct

    w, h = 3, 2
    rows = []
    for r in range(h):
        row = b"".join(
            struct.pack("BBB", 10 + r, 20 + r, 30 + r) for _ in range(w)
        )  # B,G,R per pixel
        rows.append(row + b"\xff\xff\xff")  # poisoned padding
    px = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(px), 0, 0, 14 + 40)
    out = MM.decode_real(_media_df(spark, [(2, hdr + info + px)])).collect()[0]
    assert (out["fmt"], out["width"], out["height"]) == ("bmp", 3, 2)
    assert (out["mean_r"], out["mean_g"], out["mean_b"]) == (30.5, 20.5, 10.5)


def test_decode_real_handcrafted_wav_extra_chunk(spark):
    """PCM16 WAV with a LIST chunk between fmt and data — the chunk walk
    must skip unknown chunks instead of assuming a fixed layout."""
    import struct

    samples = [100, -100, 300, -300]
    data = struct.pack("<4h", *samples)
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 44100, 88200, 2, 16)
    lst = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    body = fmt + lst + struct.pack("<4sI", b"data", len(data)) + data
    wav = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    out = MM.decode_real(_media_df(spark, [(3, wav)])).collect()[0]
    assert (out["fmt"], out["n_samples"], out["sample_rate"]) == ("wav", 4, 44100)
    assert out["amp_mean"] == 0.0


def test_decode_real_tolerates_garbage(spark):
    """Unknown magic, truncated files, and null payloads decode to
    fmt='unknown' with null stats — never an exception (A17 stance)."""
    cases = [(1, b"\x89PNG garbage"), (2, b"P6\n4 2\n255\n\x01"), (3, None), (4, b"BM")]
    rows = {r["media_id"]: r for r in MM.decode_real(_media_df(spark, cases)).collect()}
    assert rows[1]["fmt"] == "unknown"
    assert rows[2]["fmt"] == "unknown"  # truncated PPM pixel data
    assert rows[3]["fmt"] == "unknown" and rows[3]["width"] is None
    assert rows[4]["fmt"] == "unknown"  # truncated BMP header


def test_synthesize_roundtrip_all_formats(spark):
    """synthesize → decode round trip covers all three containers."""
    df = spark.range(9).select(F.col("id").alias("doc_id"))
    media = MM.synthesize_media(df, "doc_id")
    out = {r["media_id"]: r for r in MM.decode_real(media).collect()}
    assert {out[i]["fmt"] for i in range(0, 9, 3)} == {"ppm"}
    assert {out[i]["fmt"] for i in range(1, 9, 3)} == {"bmp"}
    assert {out[i]["fmt"] for i in range(2, 9, 3)} == {"wav"}
    # spot-check one value against the generation formula
    assert out[0]["mean_r"] == sum((0 + i) % 256 for i in range(0, 24, 3)) / 8
