"""Schema-on-read text-format sources: JSON-lines and CSV feeds.

The reference's wire format is JSON text on a topic (one Debezium envelope
per message, reference docs/architecture.md:260-283); at rest the same
payloads land as JSONL dumps, and upstream exports frequently arrive as
CSV. These readers bring both formats into the engine with the SAME scale
discipline as the parquet table reader (sources/tables.py):

- **Explicit schema, always.** Schema inference on JSON/CSV is a full
  extra pass over the data before the real job starts — at 100 TB that is
  a cluster-sized scan paid per query. Callers pass the schema (or the
  DDL string) and the read plans zero jobs at construction, which keeps
  these sources inside the registry-wide zero-jobs-at-build gate
  (tests/test_scale_plans.py::test_query_construction_runs_no_jobs).
- **Malformed rows are survivable.** ``mode=PERMISSIVE`` plus an explicit
  ``columnNameOfCorruptRecord`` mirrors the envelope pipeline's
  error-tolerant pass-through (reference cdc_enrichment_function.py:104-107,
  operators/enrichment.py A17): bad lines become a captured raw string,
  never a failed job.
- **Text formats are an ingest format, not a storage format.** Neither
  JSON nor CSV carries row-group statistics, so there is no predicate
  pushdown to prune I/O — the 100 TB pattern is read-once → write parquet
  (then ``plans/layout.optimize_table`` for clustering). These readers
  exist for that first hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Read a JSON-lines directory with an explicit schema (no inference
    pass). Unparseable lines surface in ``_corrupt_record`` instead of
    failing the job; callers that want strictness filter on it."""
    return (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = False,
    sep: str = ",",
) -> DataFrame:
    """Read a CSV directory with an explicit schema (no inference pass),
    permissive malformed-row capture, and explicit delimiter."""
    return (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", "true" if header else "false")
        .option("sep", sep)
        .csv(path)
    )


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """Read an ORC directory — the other columnar format large estates
    carry (Hive-era tables). Spark bundles the reader natively; predicate
    pushdown and column pruning work as for parquet (plan-asserted in
    tests/test_ingest.py). Schema optional: ORC footers carry types, and
    unlike JSON/CSV the inference is a footer read, not a data scan —
    but passing one still skips the footer listing on wide tables."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)
