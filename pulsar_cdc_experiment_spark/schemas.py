"""Typed schemas for the CDC data model.

The reference ships untyped JSON Debezium envelopes on Pulsar topics
(reference: docs/architecture.md:260-283, live sample docs/setup-guide.md:66-90)
and probes them schemalessly per message
(functions/cdc-enrichment/cdc_enrichment_function.py:23-26). Our engine makes
the envelope an explicit Spark ``StructType`` so Catalyst can prune nested
fields (SchemaPruning) and the whole pipeline stays in whole-stage codegen.

Type decisions mirror the reference connector config
(kubernetes/manifests/debezium-postgres-connector.yaml):
- ``decimal.handling.mode: double`` (line 46) → money is DoubleType, never
  DecimalType.
- ``time.precision.mode: adaptive_time_microseconds`` (line 43) → TIMESTAMP
  columns arrive as int64 epoch-MICROseconds (sample 1763741883901236,
  docs/setup-guide.md:73).
- top-level/source ``ts_ms`` are epoch-MILLIseconds (docs/architecture.md:281).
- ``source.snapshot`` is the STRING "true"/"false", compared as a string
  (cdc_enrichment_function.py:66) — kept StringType deliberately.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The reference's one source table (DDL at reference scripts/install.sh:330):
# CREATE TABLE customers(id SERIAL PRIMARY KEY, name VARCHAR(255) NOT NULL,
#   email VARCHAR(255) NOT NULL UNIQUE, created_at TIMESTAMP DEFAULT now())
# In CDC events created_at is int64 epoch-micros (see module docstring).
# `id` is LongType, not the SERIAL's int32: a 100 TB feed blows through
# 2^31 keys, Spark wraps int32 silently (ANSI off) while the SQL oracle
# keeps the true value — the same silent-at-scale divergence class the
# round-4 sampling-hash fix eliminated. Debezium's JSON carries plain
# numbers, so widening the parse type loses nothing (and the at-scale
# source column is BIGSERIAL anyway).
CUSTOMERS_ROW = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("created_at", T.LongType(), True),  # epoch micros
    ]
)

# Debezium source/provenance block (docs/setup-guide.md:66-90).
SOURCE = T.StructType(
    [
        T.StructField("version", T.StringType(), True),
        T.StructField("connector", T.StringType(), True),
        T.StructField("name", T.StringType(), True),  # e.g. "dbserver1"
        T.StructField("ts_ms", T.LongType(), True),  # epoch millis
        T.StructField("snapshot", T.StringType(), True),  # "true"/"false" STRING
        T.StructField("db", T.StringType(), True),
        T.StructField("schema", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("txId", T.LongType(), True),
        T.StructField("lsn", T.LongType(), True),  # WAL LSN: the ordering key
    ]
)


def envelope_schema(row_schema: T.StructType = CUSTOMERS_ROW) -> T.StructType:
    """Debezium change-event envelope for a table with ``row_schema``.

    op codes: c=create, u=update, d=delete, r=read/snapshot
    (reference connectors/README.md:152-157).
    """
    return T.StructType(
        [
            T.StructField("before", row_schema, True),
            T.StructField("after", row_schema, True),
            T.StructField("source", SOURCE, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


# Name of the PERMISSIVE-mode corrupt-record column. from_json returns an
# all-NULL struct (not NULL) for malformed input, so parse failure is only
# detectable via this column: non-null ⇔ the payload was not a JSON object.
# That is exactly the reference's error condition (json.loads raises, or the
# parsed value has no .get — cdc_enrichment_function.py:104-107); a VALID
# JSON object with fields missing is NOT an error there and is enriched.
CORRUPT_COL = "_corrupt"


def envelope_schema_corrupt(row_schema: T.StructType = CUSTOMERS_ROW) -> T.StructType:
    """Envelope schema + corrupt-record column for parse-failure detection."""
    return envelope_schema(row_schema).add(CORRUPT_COL, T.StringType())


# Schemaless variant: before/after as string→string maps, for tables whose
# schema is unknown at read time (the reference's "skip.unparseable.ddl"
# stance, debezium-postgres-connector.yaml:40).
def schemaless_envelope_schema() -> T.StructType:
    m = T.MapType(T.StringType(), T.StringType())
    return T.StructType(
        [
            T.StructField("before", m, True),
            T.StructField("after", m, True),
            T.StructField("source", SOURCE, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


# Driver-generated test tables (/root/testdata/sf*/, see TESTDATA.md).
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),  # JSON string
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)
