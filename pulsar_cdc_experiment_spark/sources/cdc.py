"""CDC source — snapshot + stream unification and envelope parsing.

The reference's source is a Debezium Pulsar IO connector
(reference kubernetes/manifests/debezium-postgres-connector.yaml:8-54):
``snapshot.mode: initial`` emits a full table scan as op='r' events, then
streams live WAL changes (A1/B4). In Spark the same contract is:

- batch backfill: ``spark.read`` over the snapshot + ``spark.readStream``
  over the live feed, or
- one replayable streaming source consumed from offset 0 with
  ``Trigger.AvailableNow`` for catch-up, then continuous micro-batches.

Offset durability: the reference uses a VOLATILE MemoryOffsetBackingStore
(connector yaml line 31 — restarts re-snapshot); Structured Streaming
checkpoints are a strict improvement with the same external behavior (B2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CORRUPT_COL, CUSTOMERS_ROW, envelope_schema_corrupt


def parse_envelopes(
    raw_df: DataFrame,
    value_col: str = "value",
    row_schema=CUSTOMERS_ROW,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Raw JSON bytes/strings → typed envelope rows (A3).

    PERMISSIVE parse: corrupt payloads yield null envelope columns, a
    non-null ``_corrupt`` marker, and are KEPT (reference never drops,
    cdc_enrichment_function.py:104-107). ``_corrupt`` is the only reliable
    parse-failure signal — from_json yields an all-null STRUCT, not NULL,
    for bad input, and a null ``op`` alone is a VALID op-less message that
    the reference enriches (op → "unknown"). The raw payload is retained in
    ``_raw`` so downstream pass-through / DLQ splits (B7) can route it.

    ``keep_cols`` carries source-metadata columns (e.g. Kafka
    topic/partition/offset lineage, sources/kafka.py) through the parse
    unchanged.
    """
    keep_cols = keep_cols or []
    raw = F.col(value_col).cast("string")
    parsed = F.from_json(
        raw,
        envelope_schema_corrupt(row_schema),
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    tmp = raw_df.select(parsed.alias("envelope"), raw.alias("_raw"), *keep_cols)
    env_cols = [
        F.col("envelope").getField(f.name).alias(f.name)
        for f in envelope_schema_corrupt(row_schema).fields
        if f.name != CORRUPT_COL
    ]
    # Empty/whitespace input makes from_json return a NULL struct (no corrupt
    # marker inside to read) — fold that case into the corrupt column.
    corrupt = F.when(F.col("envelope").isNull(), F.col("_raw")).otherwise(
        F.col("envelope").getField(CORRUPT_COL)
    )
    return tmp.select(*env_cols, corrupt.alias(CORRUPT_COL), "_raw", *keep_cols)


def parse_envelopes_rescued(
    raw_df: DataFrame,
    value_col: str = "value",
    row_schema=CUSTOMERS_ROW,
) -> DataFrame:
    """Typed envelope parse + mid-stream schema-drift rescue (A3 + drift).

    The reference's connector tolerates DDL it cannot parse and auto-adds
    tables (debezium-postgres-connector.yaml:37,40), so new columns CAN
    appear mid-stream. A fixed ``row_schema`` would silently drop them;
    here every ``after`` key not in the typed schema is preserved in a
    ``_rescued`` string→string map (Spark's rescued-data-column pattern),
    so no payload data is ever lost while the hot path stays fully typed.
    Promote a rescued key by adding it to ``row_schema`` — old envelopes
    read back with the field null, new ones typed: exactly
    ``unionByName(allowMissingColumns=True)`` semantics over time.
    """
    env = parse_envelopes(raw_df, value_col, row_schema)
    known = [f.name for f in row_schema.fields]
    after_map = F.from_json(
        F.get_json_object(F.col("_raw"), "$.after"), "map<string,string>"
    )
    rescued = F.map_filter(after_map, lambda k, _: ~k.isin(*known))
    # empty map (no drift) normalized to null: cheap to test, and rescued
    # rows stand out in a filter
    return env.withColumn(
        "_rescued",
        F.when(F.size(rescued) > 0, rescued),
    )


def table_filter(df: DataFrame, include: list[str]) -> DataFrame:
    """Source-side table include list (A2).

    Mirrors ``table.include.list: public.customers`` (connector yaml line 24)
    as a predicate on provenance; Catalyst pushes it into the scan.
    ``include`` entries are ``schema.table`` strings.
    """
    qualified = F.concat_ws(".", F.col("source.schema"), F.col("source.table"))
    return df.filter(qualified.isin(*include))


def read_cdc_stream(
    spark: SparkSession,
    path: str,
    row_schema=CUSTOMERS_ROW,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming CDC source over a directory of JSON envelope files.

    Stand-in for the Pulsar/Kafka topic in this environment; on a real
    cluster swap for ``spark.readStream.format("kafka")`` with the same
    ``parse_envelopes`` applied to the ``value`` column.
    """
    reader = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger or 1)
        .load(path)
    )
    return parse_envelopes(reader, "value", row_schema)


def route_by_table(df: DataFrame):
    """Content-based routing key (B6): one output partition per source table.

    Use with ``writeStream.partitionBy("_route")`` or per-table filters —
    the Spark face of "topic per table" (docs/architecture.md:395-396).
    """
    return df.withColumn(
        "_route",
        F.concat_ws(".", F.col("source.db"), F.col("source.schema"), F.col("source.table")),
    )
