"""Readers for the driver-generated parquet tables (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. Readers are
plain ``spark.read.parquet`` so Catalyst gets predicate pushdown, column
pruning, and (on partitioned layouts) partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        _enable_nanos_as_long(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is physically TIMESTAMP(NANOS) which the Spark parquet
        # reader rejects; with nanosAsLong it arrives as int64 nanos and is
        # normalized here to micro-precision TimestampType (exactly what
        # DuckDB sees — its TIMESTAMP is µs).
        # integer `div`: float division would round (and int64-nanos exceeds
        # double's 2^53 exact range); DuckDB truncates ns→µs the same way.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _enable_nanos_as_long(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    _enable_nanos_as_long(spark)
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works over them."""
    _enable_nanos_as_long(spark)
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
