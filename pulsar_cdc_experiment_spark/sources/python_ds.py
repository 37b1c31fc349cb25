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
- composes unchanged with ``parse_envelopes`` / ``enrich`` downstream,
- and the WRITE half (A18): per-task staging + driver-side commit — each
  task writes to a hidden staging file and returns a commit message; only
  the driver's commit() publishes (rename) them, abort() discards. The
  same two-phase shape every transactional sink (Kafka txn, Delta commit,
  the reference's Pulsar producer with dedup) reduces to, so a task retry
  or speculative duplicate can never surface half-written output.

It is deliberately a THIN demonstration of the extension seam: real
deployments point the same class at a queue client; the partition-planning,
lineage, and commit shapes stay identical.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


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

    def writer(self, schema, overwrite: bool) -> "CdcFeedWriter":
        return CdcFeedWriter(self.options, overwrite)


class CdcFeedReader(DataSourceReader):
    """Lists every feed file unconditionally by default — fine for
    handwritten feeds, but a read that races an in-flight overwrite
    commit (old parts swept, new parts mid-rename) can observe a partial
    batch. Pass ``.option("requireSuccess", "true")`` to get all-or-
    nothing visibility: the scan plans ZERO partitions unless the
    committer's ``_SUCCESS`` marker is present (the marker is removed
    FIRST during an overwrite sweep and re-created LAST, so gated readers
    never see a half-published directory)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_feed requires option 'path'")
        self.require_success = str(
            options.get("requireSuccess", "false")
        ).lower() in ("true", "1", "yes")

    def partitions(self):
        # one partition per feed file: the planner-side split that makes
        # the scan scale with the file count (sorted for determinism).
        # "."/"_" prefixes are skipped per the Hadoop convention — staging
        # dirs and _SUCCESS markers are metadata, not feed data.
        if self.require_success and not os.path.exists(
            os.path.join(self.path, "_SUCCESS")
        ):
            return []
        return [
            _FeedFilePartition(os.path.join(self.path, f))
            for f in sorted(os.listdir(self.path))
            if not f.startswith((".", "_"))
        ]

    def read(self, partition: _FeedFilePartition):
        if partition is None:  # zero planned partitions (gated, no marker)
            return
        fname = os.path.basename(partition.path)
        with open(partition.path) as fh:
            for i, line in enumerate(fh):
                line = line.rstrip("\n")
                if line:
                    yield (line, fname, i)


class _StagedFile(WriterCommitMessage):
    def __init__(self, staged: str):
        self.staged = staged


class CdcFeedWriter(DataSourceWriter):
    """Two-phase feed sink: tasks stage, the driver commits.

    ``write`` runs per task on executors — it writes the partition's
    ``value`` column to ``.staging/part-<uuid>`` and returns the staged
    path as its commit message. ``commit`` runs once on the driver with
    the messages of the SUCCESSFUL task attempts only: it renames each
    staged file to its final name and drops a ``_SUCCESS`` marker, so a
    failed/retried/speculative task's orphan staging file is never
    published (``abort`` sweeps them). Atomic batch visibility requires
    the READER to gate on the marker — the reader's
    ``requireSuccess`` option does exactly that (an ungated concurrent
    read during an overwrite commit can see a partial batch).

    Staging is batch-private (``.staging/<batch_id>/``): two concurrent
    appends into the same path stage side by side, and one batch's
    ``abort`` sweeps only its own directory, never the other's in-flight
    files.

    Final names carry a per-batch id (``part-<batch>-<i>.jsonl``), never a
    bare positional index: positional names made a second append batch
    silently overwrite the first's colliding parts, and an overwrite batch
    with fewer tasks left the previous batch's higher-numbered parts alive
    under the refreshed ``_SUCCESS`` — readers saw a mixed batch. In
    overwrite mode ``commit`` sweeps pre-existing parts (and ``_SUCCESS``)
    before publishing.
    """

    def __init__(self, options, overwrite: bool = False):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_feed sink requires option 'path'")
        self.overwrite = overwrite
        # driver-generated, pickled with the writer → every task and the
        # commit see the same batch id
        self.batch_id = uuid.uuid4().hex[:12]

    def write(self, iterator) -> _StagedFile:
        import uuid

        staging = os.path.join(self.path, ".staging", self.batch_id)
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"part-{uuid.uuid4().hex}")
        with open(staged, "w") as fh:
            for row in iterator:
                v = row["value"]
                if v is not None:
                    fh.write(v + "\n")
        return _StagedFile(staged)

    def commit(self, messages) -> None:
        if self.overwrite:
            # unpublish the previous batch FIRST (marker before parts, so
            # a crash mid-sweep leaves no _SUCCESS over partial contents)
            marker = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(marker):
                os.remove(marker)
            for f in os.listdir(self.path):
                if f.startswith("part-"):
                    os.remove(os.path.join(self.path, f))
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{self.batch_id}-{i:05d}.jsonl")
            os.replace(m.staged, final)
        self._cleanup_staging()
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        # messages only cover tasks that RETURNED — the task that failed
        # mid-write left its staged file with no message, so sweep THIS
        # batch's staging dir (batch-private: a concurrent batch's
        # in-flight staged files live under its own batch id)
        import shutil

        for m in messages:
            if m is not None:
                try:
                    os.remove(m.staged)
                except OSError:
                    pass
        shutil.rmtree(
            os.path.join(self.path, ".staging", self.batch_id),
            ignore_errors=True,
        )
        self._cleanup_staging()

    def _cleanup_staging(self) -> None:
        """Drop this batch's staging dir and the shared parent when empty."""
        import shutil

        root = os.path.join(self.path, ".staging")
        shutil.rmtree(os.path.join(root, self.batch_id), ignore_errors=True)
        if os.path.isdir(root) and not os.listdir(root):
            os.rmdir(root)


def register_cdc_feed(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(CdcFeedDataSource)
