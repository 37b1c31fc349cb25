"""Plan-shape tuning utilities.

Small parquet inputs arrive as ONE partition (file < maxPartitionBytes), so
expression-heavy per-row stages (shingling, hashing, UDFs) run single-task
unless fanned out. At 100 TB the scan itself provides the parallelism and
``fan_out`` becomes a no-op by condition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to the session's core count when the
    input has fewer partitions — cheap for small inputs (the only case it
    triggers), a no-op where the scan already parallelizes."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
