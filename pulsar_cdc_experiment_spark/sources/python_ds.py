"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The reference's ingress is a packaged connector (Debezium Pulsar IO,
reference kubernetes/manifests/debezium-postgres-connector.yaml) — the
extension point that lets a deployment plug in a NEW wire protocol without
touching the engine. Spark 4's Python DataSource API is the same contract:
this module ships a file-backed CDC feed source ("cdc_feed") that

- plans ONE InputPartition PER FEED FILE (the scan parallelizes across
  executors exactly like the built-in file source — partition planning is
  the part of the API that matters at scale),
- emits the raw payload plus per-record lineage (file + offset within
  file), the analog of Kafka's topic/partition/offset (A15),
- composes unchanged with ``parse_envelopes`` / ``enrich`` downstream.

It is deliberately a THIN demonstration of the extension seam: real
deployments point the same class at a queue client; the partition-planning
and lineage shapes stay identical.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _FeedFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CdcFeedDataSource(DataSource):
    """``spark.read.format("cdc_feed").option("path", dir)`` source."""

    @classmethod
    def name(cls) -> str:
        return "cdc_feed"

    def schema(self) -> str:
        return "value string, _file string, _offset bigint"

    def reader(self, schema) -> "CdcFeedReader":
        return CdcFeedReader(self.options)


class CdcFeedReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_feed requires option 'path'")

    def partitions(self):
        # one partition per feed file: the planner-side split that makes
        # the scan scale with the file count (sorted for determinism)
        return [
            _FeedFilePartition(os.path.join(self.path, f))
            for f in sorted(os.listdir(self.path))
            if not f.startswith(".")
        ]

    def read(self, partition: _FeedFilePartition):
        fname = os.path.basename(partition.path)
        with open(partition.path) as fh:
            for i, line in enumerate(fh):
                line = line.rstrip("\n")
                if line:
                    yield (line, fname, i)


def register_cdc_feed(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(CdcFeedDataSource)
