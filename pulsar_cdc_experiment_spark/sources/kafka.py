"""Kafka CDC source — the message-bus ingress of the reference, Spark-built.

The reference's ingress is a Debezium connector publishing envelopes to a
Pulsar topic (reference kubernetes/manifests/debezium-postgres-connector.yaml:
8-54, topic ``dbserver1.public.customers``); consumers read (bytes, message
id, topic, partition) per record. Structured Streaming's Kafka source is the
same contract: every record arrives with the WIRE_SCHEMA below, and the
whole downstream plan — envelope parse, enrichment, materialization — is a
pure function of that schema. This module keeps the two concerns separate:

- :func:`kafka_reader` builds the ``readStream.format("kafka")`` reader
  (requires the spark-sql-kafka connector on the cluster classpath; absent
  in this container, so only construction is exercised here);
- :func:`kafka_cdc_plan` is the broker-independent downstream plan, unit-
  tested against static WIRE_SCHEMA rows (tests/test_streaming.py).

Offset semantics: ``startingOffsets=earliest`` + a checkpoint reproduces the
reference's snapshot-then-stream contract (B2/B4) with durable offsets — a
strict improvement over its volatile MemoryOffsetBackingStore (connector
yaml line 31: restarts there re-snapshot).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import CUSTOMERS_ROW
from .cdc import parse_envelopes

# The exact record schema Spark's Kafka source produces — the downstream
# plan depends only on this, never on a live broker.
WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)


def kafka_reader_options(
    bootstrap_servers: str,
    subscribe: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """The option map for the Kafka reader (pure, testable).

    ``failOnDataLoss=false`` mirrors the reference's keep-flowing stance on
    imperfect input; ``maxOffsetsPerTrigger`` is the per-micro-batch rate
    cap (the backpressure knob a 100 TB backfill needs).
    """
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": subscribe,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe: str = "dbserver1.public.customers",
    **kwargs,
):
    """``readStream.format("kafka")`` wired with the CDC options.

    Returns the configured reader; ``.load()`` resolves the connector, which
    must be on the cluster classpath (org.apache.spark:spark-sql-kafka-0-10).
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(bootstrap_servers, subscribe, **kwargs).items():
        reader = reader.option(k, v)
    return reader


def kafka_cdc_plan(
    kafka_df: DataFrame, row_schema=CUSTOMERS_ROW
) -> DataFrame:
    """Kafka wire records → typed envelopes + per-record lineage (A1/A3/A15).

    Works identically on the streaming source and on any batch DataFrame
    with WIRE_SCHEMA. Output: envelope columns (before/after/source/op/
    ts_ms/_corrupt/_raw) + ``_topic``/``_partition``/``_offset`` — the
    Spark analogs of the reference's message context
    (cdc_enrichment_function.py:93-96), and per-key ordering metadata
    (Kafka guarantees order within a partition, the same contract Debezium
    relies on per key).
    """
    lineage = kafka_df.select(
        F.col("value").cast("string").alias("value"),
        F.col("topic").alias("_topic"),
        F.col("partition").alias("_partition"),
        F.col("offset").alias("_offset"),
    )
    return parse_envelopes(
        lineage, "value", row_schema,
        keep_cols=["_topic", "_partition", "_offset"],
    )


def kafka_message_id(df: DataFrame) -> Column:
    """``topic-partition-offset`` — the stable per-record id (the Pulsar
    message-id analog the reference stringifies, line 93)."""
    return F.concat_ws(
        "-", F.col("_topic"), F.col("_partition").cast("string"),
        F.col("_offset").cast("string"),
    )
