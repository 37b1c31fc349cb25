"""Plan-shape tuning utilities.

Small parquet inputs arrive as ONE partition (file < maxPartitionBytes), so
expression-heavy per-row stages (shingling, hashing, UDFs) run single-task
unless fanned out. At 100 TB the scan itself provides the parallelism and
``fan_out`` becomes a no-op by condition.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame


@contextmanager
def job_label(spark, desc: str):
    """Label every job submitted in the block (guide §1.5) so event-log
    profiles (tools/profile_query.py) attribute wall time to lifecycle
    VERBS instead of opaque py4j call sites. Thread-local on the Spark
    side; restores the enclosing label so nested verbs compose."""
    sc = spark.sparkContext
    prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try:
        yield
    finally:
        sc.setJobDescription(prev)


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to the session's core count when the
    input has fewer partitions — cheap for small inputs (the only case it
    triggers), a no-op where the scan already parallelizes."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
