"""Multimodal column plumbing: binary payloads + typed metadata + UDF stages.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct alongside. The Spark-side machinery — schema, Arrow batch shape,
``mapInPandas`` stage signatures, partition sizing — is real and tested.
Two decode tiers: ``decode_real`` genuinely parses the uncompressed
containers a pure-stdlib decoder can own (binary PPM, 24-bpp BMP, PCM
WAV — header walks, row strides, chunk scans); compressed formats
(JPEG/MP3/H.264) need media libraries this container lacks, for which
``decode_stub_features`` keeps the plumbing honest with deterministic
byte-level features (swap its body for PIL/librosa/ffmpeg calls).

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


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("amp_mean", T.DoubleType(), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic uncompressed media payloads: real PPM/BMP/WAV files
    built byte-for-byte from the id (format cycles by ``id % 3``), so a
    SQL oracle can predict every decoded statistic arithmetically while
    the decoder exercises genuine container parsing. The pixel/sample
    patterns:

    - PPM  (id%3==0): P6, 4x2, maxval 255; pixel byte i = (id + i) % 256
    - BMP  (id%3==1): 24-bpp, 4x2 (row stride 12 — no padding);
                      pixel-array byte i = (id*7 + i) % 256 (BGR order)
    - WAV  (id%3==2): PCM16 mono @8000 Hz, 8 samples;
                      sample i = ((id*13 + i) % 4096) - 2048
    """
    import struct

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        def make(mid: int) -> tuple[bytes, str]:
            k = mid % 3
            if k == 0:
                px = bytes((mid + i) % 256 for i in range(24))
                return b"P6\n4 2\n255\n" + px, "image/x-portable-pixmap"
            if k == 1:
                px = bytes((mid * 7 + i) % 256 for i in range(24))
                info = struct.pack(
                    "<IiiHHIIiiII", 40, 4, 2, 1, 24, 0, len(px), 2835, 2835, 0, 0
                )
                header = struct.pack(
                    "<2sIHHI", b"BM", 14 + 40 + len(px), 0, 0, 14 + 40
                )
                return header + info + px, "image/bmp"
            samples = [((mid * 13 + i) % 4096) - 2048 for i in range(8)]
            data = struct.pack("<8h", *samples)
            fmt_chunk = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
            hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt_chunk) + 8 + len(data), b"WAVE")
            return hdr + fmt_chunk + struct.pack("<4sI", b"data", len(data)) + data, "audio/wav"

        for pdf in batches:
            made = pdf["media_id"].map(make)
            payload = made.map(lambda t: t[0])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payload,
                    "meta": [
                        {"mime": m, "n_bytes": len(p), "source": "synthesize_media"}
                        for p, m in made
                    ],
                }
            )

    # Parallelize BEFORE the heavy opaque work (guide §8 shape: decide/
    # route with small rows, produce the heavy bytes once, in parallel):
    # the input here is a thin id column — often a single small scan
    # partition — while the Python synthesis below is the expensive leg
    # (measured 5.8 s single-task vs 1.3 s at 32 tasks on the sf0.1
    # fixture build). Shuffling 8-byte ids is negligible at any scale;
    # round-robin repartition is deterministic (sortBeforeRepartition).
    ids = df.select(F.col(id_col).cast("long").alias("media_id"))
    par = df.sparkSession.sparkContext.defaultParallelism
    return ids.repartition(par).mapInPandas(gen, MEDIA_SCHEMA)


def decode_real(df: DataFrame) -> DataFrame:
    """REAL media decode for the uncompressed container formats a pure-
    stdlib decoder can own: binary PPM (P6), 24-bpp uncompressed BMP, and
    PCM WAV. Parses actual headers and pixel/sample payloads (struct
    unpacking, row strides, chunk walks) inside the same Arrow
    ``mapInPandas`` stage shape as :func:`decode_stub_features`; compressed
    formats (JPEG/MP3/H.264) would swap in PIL/ffmpeg here with the schema,
    batching, and partitioning unchanged. Unknown or truncated payloads
    decode to fmt='unknown' with null stats — never an exception (the
    reference's error-tolerant pass-through stance, enrichment A17).
    """
    import struct

    def _ppm(b: bytes):
        # P6 header: three whitespace-separated ints (width height maxval),
        # comments (#...) allowed, single whitespace byte before pixel data
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(b) and b[pos : pos + 1].isspace():
                pos += 1
            if pos < len(b) and b[pos : pos + 1] == b"#":
                while pos < len(b) and b[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(b) and not b[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(b[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, _maxval = fields
        px = b[pos : pos + w * h * 3]
        if len(px) < w * h * 3:
            raise ValueError("truncated pixel data")
        chans = [px[c::3] for c in range(3)]
        return w, h, *[sum(c) / len(c) for c in chans]

    def _bmp(b: bytes):
        data_off = struct.unpack_from("<I", b, 10)[0]
        w, h = struct.unpack_from("<ii", b, 18)
        bpp = struct.unpack_from("<H", b, 28)[0]
        if bpp != 24:
            raise ValueError(f"unsupported bpp {bpp}")
        stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
        rows = abs(h)
        sums, n = [0, 0, 0], 0
        for r in range(rows):
            row = b[data_off + r * stride : data_off + r * stride + w * 3]
            if len(row) < w * 3:
                raise ValueError("truncated row")
            for c in range(3):  # BGR on disk
                sums[c] += sum(row[c::3])
            n += w
        return w, rows, sums[2] / n, sums[1] / n, sums[0] / n  # → RGB

    def _wav(b: bytes):
        if b[8:12] != b"WAVE":
            raise ValueError("not WAVE")
        pos, rate, bits, data = 12, None, None, None
        while pos + 8 <= len(b):
            cid, size = struct.unpack_from("<4sI", b, pos)
            body = b[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                _, _ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if rate is None or data is None or bits != 16:
            raise ValueError("unsupported wav layout")
        n = len(data) // 2
        samples = struct.unpack(f"<{n}h", data[: n * 2])
        return n, rate, sum(samples) / n if n else None

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        def do(mid, b):
            out = {
                "media_id": mid, "fmt": "unknown", "width": None, "height": None,
                "mean_r": None, "mean_g": None, "mean_b": None,
                "n_samples": None, "sample_rate": None, "amp_mean": None,
            }
            try:
                if b is None:
                    return out
                if b[:2] == b"P6":
                    out["fmt"] = "ppm"
                    (out["width"], out["height"], out["mean_r"], out["mean_g"],
                     out["mean_b"]) = _ppm(bytes(b))
                elif b[:2] == b"BM":
                    out["fmt"] = "bmp"
                    (out["width"], out["height"], out["mean_r"], out["mean_g"],
                     out["mean_b"]) = _bmp(bytes(b))
                elif b[:4] == b"RIFF":
                    out["fmt"] = "wav"
                    out["n_samples"], out["sample_rate"], out["amp_mean"] = _wav(
                        bytes(b)
                    )
            except Exception:
                out = {**out, "fmt": "unknown", "width": None, "height": None,
                       "mean_r": None, "mean_g": None, "mean_b": None,
                       "n_samples": None, "sample_rate": None, "amp_mean": None}
            return out

        for pdf in batches:
            yield pd.DataFrame(
                [do(m, p) for m, p in zip(pdf["media_id"], pdf["payload"])]
            )

    return df.mapInPandas(decode, DECODED_SCHEMA)


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
