"""Continuous CDC materialization: foreachBatch upsert into a state table.

The batch fold (operators/materialize.py) reconstructs state from the full
log; this module maintains the state INCREMENTALLY as micro-batches arrive —
the production shape for B5 at scale, where re-folding 100 TB of history per
batch is not an option.

Without a transactional table format in this environment, the state table is
a parquet directory swapped atomically per batch (read-modify-write of a
small latest-state table). On a real deployment the same ``foreachBatch``
body becomes a MERGE INTO against Delta/Iceberg — identical dataflow, the
sink API changes.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.materialize import latest_by_key


class IncrementalMaterializer:
    """Maintains latest-row-per-key state across micro-batches.

    Per batch: fold the new rows to per-key latest, union with current
    state, fold again, swap the state directory. Correct for any batch
    slicing because the fold is associative on the ordering keys.
    """

    def __init__(
        self,
        state_dir: str,
        key_cols: Sequence[str],
        order_cols: Sequence[str],
    ):
        self.state_dir = state_dir
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols)

    POINTER = "CURRENT"

    def _pointer_path(self) -> str:
        return os.path.join(self.state_dir, self.POINTER)

    def _current_dir(self) -> str | None:
        p = self._pointer_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            name = f.read().strip()
        d = os.path.join(self.state_dir, name)
        return d if name and os.path.exists(d) else None

    def current_state(self, spark: SparkSession) -> DataFrame | None:
        d = self._current_dir()
        if d is None:
            return None
        return spark.read.parquet(d)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Fold the batch into state and publish via ONE atomic rename.

        Publication is a pointer file (``CURRENT`` names the live state
        directory) updated with ``os.replace`` — there is no instant with
        no live state, unlike a two-rename directory swap (round-1 advice):
        a crash before the replace leaves the previous state live; a crash
        after it leaves the new state live. Superseded directories are GC'd
        AFTER publication, so a crash there leaks only dead files, never
        state.
        """
        spark = batch_df.sparkSession
        folded = latest_by_key(batch_df, self.key_cols, self.order_cols)
        prev_dir = self._current_dir()
        prev = self.current_state(spark)
        if prev is not None:
            folded = latest_by_key(
                prev.unionByName(folded), self.key_cols, self.order_cols
            )
        # The staging dir must NEVER be the live dir: on redelivery of batch
        # N (crash between publish and checkpoint commit), the pointer
        # already names state_N — `prev` is a LAZY scan of that directory,
        # and mode("overwrite") deletes the target before writing, so
        # staging into it would destroy the input mid-read (round-3 ADVICE;
        # it only ever worked because AQE happened to materialize the fold's
        # shuffle first). Attempt-suffix until the name differs from the
        # live dir; a dead leftover dir (crash mid-write) is safe to
        # overwrite, only the pointer target is load-bearing.
        staged_name = f"state_{batch_id}"
        attempt = 0
        while prev_dir is not None and staged_name == os.path.basename(prev_dir):
            attempt += 1
            staged_name = f"state_{batch_id}_r{attempt}"
        staged = os.path.join(self.state_dir, staged_name)
        folded.write.mode("overwrite").parquet(staged)

        tmp = os.path.join(self.state_dir, f".{self.POINTER}.tmp_{batch_id}")
        with open(tmp, "w") as f:
            f.write(staged_name)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer_path())  # the single atomic publish

        if prev_dir and os.path.abspath(prev_dir) != os.path.abspath(staged):
            shutil.rmtree(prev_dir, ignore_errors=True)

    def attach(self, stream_df: DataFrame, checkpoint: str | None = None):
        """Wire the materializer into a stream via foreachBatch."""
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option(
                "checkpointLocation",
                checkpoint or tempfile.mkdtemp(prefix="matz_ckpt_"),
            )
            .trigger(availableNow=True)
            .start()
        )
