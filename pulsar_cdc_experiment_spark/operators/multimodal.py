"""Multimodal column plumbing: binary payloads + typed metadata + UDF stages.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct alongside. The Spark-side machinery — schema, Arrow batch shape,
``mapInPandas`` stage signatures, partition sizing — is real and tested;
the actual media decode is STUBBED (no image/audio libraries in this
container): ``decode_stub_features`` computes deterministic byte-level
features, and ``decode_real`` raises ``NotImplementedError`` with the
integration point documented.

Scale notes: binary payloads dominate row size, so stages that don't need
the payload must select it away BEFORE shuffles (column pruning does this
declaratively). ``mapInPandas`` streams Arrow batches — tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` down for multi-MB payloads
to keep batches ~64 MB.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("first_byte", T.IntegerType(), True),
        T.StructField("byte_sum_mod", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_binary_payload(
    df: DataFrame, content_col: str, id_col: str, mime: str = "text/plain"
) -> DataFrame:
    """Wrap a column as an opaque media payload with typed metadata.

    In production the payload arrives from object storage; here the test
    corpus' text stands in, which keeps the byte-level plumbing honest.
    """
    payload = F.encode(F.col(content_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit("attach_binary_payload").alias("source"),
        ).alias("meta"),
    )


def decode_stub_features(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """STUB decode/feature-extract stage over Arrow batches.

    Deterministic byte-level "features" stand in for a real decoder; the
    mapInPandas signature, schema, and batch shape are exactly what a real
    decoder would use (swap the body for PIL/librosa/ffmpeg calls).
    """

    def decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            first = payloads.map(lambda b: int(b[0]) if b else -1)
            bsum = payloads.map(
                lambda b: int(np.frombuffer(b, dtype=np.uint8).sum()) % 1_000_003
                if b
                else 0
            )
            feats = payloads.map(
                lambda b: (
                    np.frombuffer(b[: feature_dim * 4], dtype=np.uint8)
                    .astype(np.float32)[:feature_dim]
                    .tolist()
                    if b
                    else [0.0] * feature_dim
                )
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes,
                    "first_byte": first,
                    "byte_sum_mod": bsum,
                    "feature": feats,
                }
            )

    return df.mapInPandas(decode, FEATURE_SCHEMA)


def decode_real(df: DataFrame) -> DataFrame:
    """Real media decode — integration point for PIL/torchaudio/ffmpeg.

    Not implementable in this container (no media libraries baked in).
    A real deployment replaces ``decode_stub_features``'s body; everything
    else (schema, batching, partitioning) carries over unchanged.
    """
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; use decode_stub_features for the plumbing path"
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("resized", T.BinaryType(), True),
        T.StructField("n_in", T.LongType(), True),
        T.StructField("n_out", T.LongType(), True),
        T.StructField("stride", T.IntegerType(), True),
    ]
)


def resize_stub(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """STUB resize stage: deterministic stride-decimation of the payload to
    ≤ ``target_bytes`` (the image-resize pattern: decode → resample →
    re-encode, here as an Arrow-batched byte op so the plumbing — schema,
    batch shape, payload-size drop across the stage — is the real
    contract; a deployment swaps the body for PIL's ``Image.resize``).
    stride = ceil(n_in / target): every stride-th byte survives.
    """

    def resize(batches: Iterator) -> Iterator:
        import math

        import pandas as pd

        def do(b):
            if not b:
                return b, 0, 0, 1
            k = max(1, math.ceil(len(b) / target_bytes))
            out = bytes(b[::k])
            return out, len(b), len(out), k

        for pdf in batches:
            res = pdf["payload"].map(do)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "resized": res.map(lambda t: t[0]),
                    "n_in": res.map(lambda t: t[1]),
                    "n_out": res.map(lambda t: t[2]),
                    "stride": res.map(lambda t: t[3]),
                }
            )

    return df.mapInPandas(resize, RESIZED_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: slice the payload every N bytes (the video
    frame-sample pattern: explode payload → per-frame rows)."""
    n = F.octet_length("payload")
    idx = F.sequence(F.lit(0), F.greatest((n - 1) / every_n_bytes, F.lit(0)).cast("int"))
    return df.select(
        "media_id",
        F.explode(idx).alias("frame_no"),
        F.substring(
            F.col("payload"), F.col("frame_no") * every_n_bytes + 1, every_n_bytes
        ).alias("frame_bytes"),
    )
