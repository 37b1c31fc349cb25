"""Idempotent sinks: exactly-once delivery from at-least-once execution.

Structured Streaming guarantees each micro-batch is either fully committed
or fully reprocessed (checkpoint + replayable source). Turning that into
exactly-once OUTPUT requires the sink to be idempotent per (batch id):
re-executing a batch must overwrite, not append. This module implements the
batch-keyed-directory pattern — the same contract a transactional table
format provides natively.

Contrast with the reference: at-least-once delivery with possible
duplicates on restart (reference functions/README.md:23 + volatile offsets,
debezium-postgres-connector.yaml:31). This is strictly stronger (B1/B2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class IdempotentParquetSink:
    """foreachBatch sink writing each micro-batch to ``batch=<id>/``.

    Reprocessing a batch (failure between write and checkpoint commit)
    overwrites its directory — output is exactly-once regardless of how
    many times the batch executes. Readers see the union of batch dirs.
    """

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite").parquet(
                os.path.join(self.out_dir, f"batch={batch_id}")
            )
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", self.out_dir).parquet(
            os.path.join(self.out_dir, "batch=*")
        )

    def attach(self, stream_df: DataFrame, checkpoint: str):
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
