"""Streaming execution helpers: file-stream sources, memory-sink runner, DLQ.

In this environment streams come from parquet/JSON files (the stand-in for
the reference's Pulsar topics); on a real deployment the readers swap for
``format("kafka")`` with identical downstream plans.
"""

from __future__ import annotations

import tempfile
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Raw schema of the events parquet as the streaming reader sees it
# (parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ;
# timezone-free on every driver, see functions/time.py). NOTE: the
# streaming path requires MICROS-generation testdata — only the batch
# reader (sources.tables._normalize_events_ts) keeps the legacy
# NANOS-as-long fallback, since a fixed streaming schema can't dispatch
# on the file's physical type.
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def _events_stream_dir(sf_dir: str) -> str:
    """File-stream sources need a DIRECTORY; stage one with a symlink to the
    (read-only) events parquet."""
    import os

    d = os.path.join(
        tempfile.gettempdir(), f"events_stream_{sf_dir.strip('/').replace('/', '_')}"
    )
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    return d


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """The events table as a replayable stream (snapshot-then-stream, B4:
    a file source consumed from offset 0 unifies backfill and live data)."""
    reader = spark.readStream.schema(EVENTS_RAW)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(_events_stream_dir(sf_dir))


def with_event_time(df: DataFrame, ntz_col: str, wm_col: str = "__wm_ts") -> DataFrame:
    """Derive a watermark-capable TIMESTAMP column from an NTZ event time.

    Spark's ``withWatermark`` rejects TIMESTAMP_NTZ
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) — the round-3 break that turned
    stream_dedup_keys red. The fix: build a session-TZ TIMESTAMP carrying
    the same instant via pure field arithmetic (``timestamp_micros`` over
    the NTZ epoch micros — no session-timezone consultation at any point,
    see functions/time.py), watermark on THAT, and drop it before output.
    Session TZ is pinned UTC (session.py RUNTIME_CONF) and no query
    projects the derived column, so output values are TZ-independent.
    """
    from ..functions.time import epoch_micros

    return df.withColumn(wm_col, F.timestamp_micros(epoch_micros(ntz_col)))


def drain_or_raise(q, timeout_sec: int, what: str) -> None:
    """Await an AvailableNow stream's completion and FAIL LOUDLY on
    timeout (round-8 review, generalizing the round-7
    stream_auto_maintenance catch): ``awaitTermination(timeout)``
    returns False without raising, and every caller here reads state
    the stream writes — proceeding would serve partial results (or race
    post-run state surgery like vacuum against in-flight publishes) as
    a silent wrong answer instead of an error."""
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"{what}: stream did not drain within {timeout_sec}s")


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "append",
    timeout_sec: int = 300,
) -> DataFrame:
    """Run a streaming plan to completion (AvailableNow) into a memory sink.

    Returns the materialized result table. AvailableNow processes everything
    the source has, then stops — the streaming face of a batch run, and the
    mechanism that makes streaming queries driver-checkable against batch
    oracles.
    """
    spark = stream_df.sparkSession
    checkpoint = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, timeout_sec, f"run_to_memory({name})")
    return spark.table(name)


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@contextmanager
def rocksdb_state_store(spark: SparkSession, bounded_memory_mb: int | None = None):
    """Scope streaming queries to the RocksDB state store provider.

    The default HDFS-backed store keeps all keyed state as JVM heap objects —
    fine at test scale, but a 100 TB CDC feed materializing millions of keys
    per partition needs state off-heap and spillable. RocksDBStateStoreProvider
    (built into Spark 4) keeps state in native memory + local SST files with
    incremental checkpoint upload; ``bounded_memory_mb`` caps total RocksDB
    memory across all partitions on an executor (boundedMemoryUsage), which is
    the setting that prevents state OOM on dense keyspaces.

    Conf must be set BEFORE the streaming query starts (the provider is fixed
    per-query at start); scoping restores the previous provider afterward.
    """
    conf = spark.conf
    prev = conf.get("spark.sql.streaming.stateStore.providerClass", None)
    conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    if bounded_memory_mb is not None:
        conf.set(
            "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true"
        )
        conf.set(
            "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB",
            str(bounded_memory_mb),
        )
    try:
        yield
    finally:
        if prev is None:
            conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def split_dlq(df: DataFrame, ok_predicate) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split (B7): (good, dead) by predicate.

    The reference only roadmaps a DLQ (docs/architecture.md:392) and today
    forwards malformed input unmodified; we keep its never-drop stance —
    dead rows are routed, not discarded.
    """
    return df.filter(ok_predicate), df.filter(~ok_predicate)
