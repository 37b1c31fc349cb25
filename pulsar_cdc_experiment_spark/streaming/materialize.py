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

Two maintainers share the :class:`AtomicStateDir` publication mechanism:

- :class:`IncrementalMaterializer` — latest-row-per-key state (O(keys)
  rows). Idempotent under redelivery because the latest fold is.
- :class:`IncrementalAggMaintainer` — per-group (count, sum) totals via
  the delta fold (O(groups) rows). Delta merging is NOT naturally
  idempotent, so redelivered batches are detected via the published
  directory's batch id and skipped.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.materialize import latest_by_key


class AtomicStateDir:
    """A parquet state table published by atomic pointer swap.

    Publication is a pointer file (``CURRENT`` names the live state
    directory) updated with ``os.replace`` — there is no instant with
    no live state, unlike a two-rename directory swap (round-1 advice):
    a crash before the replace leaves the previous state live; a crash
    after it leaves the new state live. Superseded directories are GC'd
    AFTER publication, so a crash there leaks only dead files, never
    state.
    """

    POINTER = "CURRENT"
    COMPLETE = "_COMPLETE"

    def __init__(self, state_dir: str, keep_versions: int = 1):
        self.state_dir = state_dir
        #: how many published versions stay on disk (>=1). More than one
        #: gives readers snapshot isolation ACROSS publishes (a reader
        #: holding version N keeps its files while N+1..N+k publish) and
        #: operators time travel: versions()/state_at() read any retained
        #: publication — the poor man's Delta version history, bounded.
        self.keep_versions = max(1, keep_versions)
        os.makedirs(state_dir, exist_ok=True)

    def _pointer_path(self) -> str:
        return os.path.join(self.state_dir, self.POINTER)

    def current_dir(self) -> str | None:
        p = self._pointer_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            name = f.read().strip()
        d = os.path.join(self.state_dir, name)
        return d if name and os.path.exists(d) else None

    def current_state(self, spark: SparkSession) -> DataFrame | None:
        d = self.current_dir()
        if d is None:
            return None
        return spark.read.parquet(d)

    @staticmethod
    def _version_key(name: str) -> tuple[int, int] | None:
        """Parse ``state_<id>[_r<n>]`` → (batch_id, attempt), else None."""
        parts = name.split("_")
        try:
            batch = int(parts[1])
        except (IndexError, ValueError):
            return None
        attempt = 0
        if len(parts) >= 3 and parts[2].startswith("r"):
            try:
                attempt = int(parts[2][1:])
            except ValueError:
                return None
        return (batch, attempt)

    def versions(self) -> list[str]:
        """Retained publication directory names, oldest → newest (by
        publish order; the live one is last).

        Publish order is ``(mtime, parsed batch_id, attempt)``: mtime
        carries the coarse chronology — which stays correct across a
        stream RESTART on a fresh checkpoint, where batch ids reset to 0
        and a name-only sort would rank the new run's state_0_r1 below
        the old run's stale state_2 (and GC would then drop the NEWEST
        snapshot; round-7 review catch) — while the parsed
        ``(batch_id, attempt)`` from ``state_<id>[_r<n>]`` breaks ties
        when a filesystem's 1-second mtime granularity makes rapid
        same-run publishes indistinguishable (round-6 ADVICE; within one
        run batch ids are monotone, so the tiebreak is exact). The one
        shape neither key resolves — a restart landing inside the same
        mtime tick as the previous run's last publish — would need a
        run-id in the name; publish cadence makes it unreachable here."""
        live = self.current_dir()
        out = [
            d
            for d in os.listdir(self.state_dir)
            if d.startswith("state_")
            and os.path.isdir(os.path.join(self.state_dir, d))
            # the completeness marker excludes dead staged dirs (crash
            # mid-write): they must neither occupy a retention slot (GC
            # would drop a REAL old version early) nor be readable as a
            # time-travel version while incomplete
            and os.path.exists(os.path.join(self.state_dir, d, self.COMPLETE))
        ]

        def sort_key(d: str):
            parsed = self._version_key(d) or (0, 0)
            mtime = os.path.getmtime(os.path.join(self.state_dir, d))
            return (mtime, parsed[0], parsed[1])

        out.sort(key=sort_key)
        if live is not None and os.path.basename(live) in out:
            out.remove(os.path.basename(live))
            out.append(os.path.basename(live))
        return out

    def state_at(self, spark: SparkSession, version_dir: str) -> DataFrame:
        """Read one retained publication (single-table publishes)."""
        return spark.read.parquet(os.path.join(self.state_dir, version_dir))

    def table_at(
        self, spark: SparkSession, version_dir: str, name: str
    ) -> DataFrame:
        """Read one table of a retained multi-table publication."""
        return spark.read.parquet(os.path.join(self.state_dir, version_dir, name))

    def applied_batch(self) -> int | None:
        """Batch id of the live state, parsed from its directory name
        (``state_<id>`` or ``state_<id>_r<n>``) — the redelivery guard
        for non-idempotent merges."""
        d = self.current_dir()
        if d is None:
            return None
        parts = os.path.basename(d).split("_")
        try:
            return int(parts[1])
        except (IndexError, ValueError):
            return None

    def publish(self, df: DataFrame, batch_id: int) -> None:
        """Write ``df`` to a staged directory and swap the pointer.

        The staging dir must NEVER be the live dir: on redelivery of batch
        N (crash between publish and checkpoint commit), the pointer
        already names state_N — a caller's lazy scan of that directory
        feeds this write, and mode("overwrite") deletes the target before
        writing, so staging into it would destroy the input mid-read
        (round-3 ADVICE; it only ever worked because AQE happened to
        materialize the fold's shuffle first). Attempt-suffix until the
        name differs from the live dir; a dead leftover dir (crash
        mid-write) is safe to overwrite, only the pointer target is
        load-bearing.
        """
        self._publish(lambda staged: df.write.mode("overwrite").parquet(staged), batch_id)

    def publish_tables(self, dfs: dict[str, DataFrame], batch_id: int) -> None:
        """Publish SEVERAL tables under ONE pointer swap: each df lands in
        ``<staged>/<name>`` and the pointer flips once — so a reader (and
        the redelivery guard) always sees a mutually consistent set. This
        is what makes a multi-table state transition (e.g. totals +
        keystate in :class:`IncrementalAggMaintainer`) atomic; two
        separate state dirs would let a crash land between their
        publishes and desynchronize them."""

        def write(staged: str) -> None:
            for name, df in dfs.items():
                df.write.mode("overwrite").parquet(os.path.join(staged, name))

        self._publish(write, batch_id)

    def current_table(self, spark: SparkSession, name: str) -> DataFrame | None:
        """Read one table of a :meth:`publish_tables` publication."""
        d = self.current_dir()
        if d is None:
            return None
        sub = os.path.join(d, name)
        if not os.path.exists(sub):
            return None
        # schema-cached read (sources.tables.read_dir): a published state
        # dir is immutable, so re-probing it must plan ZERO jobs — the
        # fixture-reuse gate in tests/test_scale_plans.py
        from ..sources.tables import read_dir

        return read_dir(spark, sub)

    def vacuum(self, keep: int | None = None) -> list[str]:
        """Explicit maintenance verb: drop retained publications beyond
        the newest ``keep`` (default: this dir's ``keep_versions``) and
        return the dropped names. The live version always survives.

        This is the Delta-style VACUUM half of the retention story: the
        per-publish GC bounds steady-state disk automatically, while
        vacuum lets an operator shrink the window after the fact (e.g.
        before a backfill). A reader that already MATERIALIZED a retained
        version (persist/cache) is unaffected — eviction is directory
        removal, not data rewrite — but an unmaterialized lazy plan over
        a vacuumed version will fail on next action, exactly like reading
        a vacuumed Delta snapshot (tests/test_streaming.py pins both
        sides)."""
        keep = self.keep_versions if keep is None else max(1, keep)
        vs = self.versions()
        live = self.current_dir()
        dropped = []
        for d in (vs[:-keep] if keep < len(vs) else []):
            if live is not None and d == os.path.basename(live):
                continue
            shutil.rmtree(os.path.join(self.state_dir, d), ignore_errors=True)
            dropped.append(d)
        return dropped

    def _publish(self, write_fn, batch_id: int) -> None:
        # The staged name must collide with NEITHER the live dir NOR any
        # retained (_COMPLETE-marked) version: with keep_versions>1 and a
        # stream restarted on a fresh checkpoint (batch ids reset to 0),
        # state_0 may be a retained older version a pinned reader still
        # holds — rmtree'ing it here would yank a live snapshot
        # (round-6 ADVICE). Only an UNMARKED pre-existing dir is a dead
        # staged leftover and safe to overwrite.
        prev_dir = self.current_dir()
        taken = set(self.versions())
        if prev_dir is not None:
            taken.add(os.path.basename(prev_dir))
        staged_name = f"state_{batch_id}"
        attempt = 0
        while staged_name in taken:
            attempt += 1
            staged_name = f"state_{batch_id}_r{attempt}"
        staged = os.path.join(self.state_dir, staged_name)
        if os.path.exists(staged):  # dead leftover from a crash mid-write
            shutil.rmtree(staged, ignore_errors=True)
        write_fn(staged)
        # contents-complete marker BEFORE the pointer swap: versions()
        # trusts it, and a dir with marker but no pointer (crash between
        # the two) is complete and safe to retain
        open(os.path.join(staged, self.COMPLETE), "w").close()

        tmp = os.path.join(self.state_dir, f".{self.POINTER}.tmp_{batch_id}")
        with open(tmp, "w") as f:
            f.write(staged_name)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer_path())  # the single atomic publish

        # GC: keep the newest keep_versions publications, delete older
        # ones (the live dir is always retained regardless of mtime skew)
        retained = self.versions()
        to_drop = [d for d in retained[:-self.keep_versions] if d != staged_name]
        for d in to_drop:
            shutil.rmtree(os.path.join(self.state_dir, d), ignore_errors=True)


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
        self._state = AtomicStateDir(state_dir)
        self.state_dir = state_dir
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols)

    def current_state(self, spark: SparkSession) -> DataFrame | None:
        return self._state.current_state(spark)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Fold the batch into state and publish via ONE atomic rename.

        Schema evolution (additive, the CDC reality — an upstream ALTER
        TABLE ADD COLUMN lands mid-stream): the union with prior state
        allows missing columns on either side, so a feed that GAINS a
        column widens the state table (old rows carry null, exactly what
        the upstream table had before the ALTER), and a feed that DROPS
        one keeps the column with nulls for new rows (no data loss on
        the reader side). Key and order columns must remain present —
        they are the materialization contract."""
        spark = batch_df.sparkSession
        folded = latest_by_key(batch_df, self.key_cols, self.order_cols)
        prev = self.current_state(spark)
        if prev is not None:
            folded = latest_by_key(
                prev.unionByName(folded, allowMissingColumns=True),
                self.key_cols,
                self.order_cols,
            )
        self._state.publish(folded, batch_id)

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


class IncrementalAggMaintainer:
    """Streaming incremental view maintenance of ``GROUP BY g: count,
    sum(v)`` over a keyed change feed — per-batch work proportional to
    the BATCH, state proportional to |groups| + |keys|.

    Two state tables under ``root``:

    - ``totals``  — (g, n_rows, sum_value): the maintained aggregate.
    - ``keystate`` — (key, group, value, *order_cols): each key's current
      image, consulted to derive the before-image of a batch's FIRST
      change per key. A feed that carries before-images natively (Debezium
      envelopes, reference docs/architecture.md:260-283) does not need
      this table at all — it exists because the test feed is bare upserts.

    Per batch: intra-batch before-images come from a per-key lag; the
    first change per key takes its before-image from ``keystate``; the
    batch's deltas (operators/materialize.delta_fold_group_agg with
    ``drop_empty=False`` — a partial may net negative) merge into
    ``totals`` by a |groups|-sized union+sum. Both tables publish in ONE
    :meth:`AtomicStateDir.publish_tables` pointer swap — they must move
    together, since the delta computation reads keystate as "state BEFORE
    this batch"; separate publishes would let a crash strand keystate a
    batch ahead of totals and corrupt the replayed deltas. Delta merging
    is not idempotent, so a redelivered batch (same id as the live
    publication) is skipped whole.

    Correctness precondition: per-key ordered delivery ACROSS batches
    (batch N's changes for a key precede batch N+1's) — the reference's
    B3 per-key ordering guarantee, which any keyed CDC transport
    provides. Within a batch, order_cols define the fold order.
    """

    def __init__(
        self,
        root: str,
        key_col: str,
        group_col: str,
        value_col: str,
        order_cols: Sequence[str],
        keep_versions: int = 1,
    ):
        self.key_col = key_col
        self.group_col = group_col
        self.value_col = value_col
        self.order_cols = list(order_cols)
        self._state = AtomicStateDir(root, keep_versions=keep_versions)

    def current_totals(self, spark: SparkSession) -> DataFrame | None:
        from pyspark.sql import functions as F

        t = self._state.current_table(spark, "totals")
        if t is None:
            return None
        # empty groups surface only at read time; partials must keep them
        return t.filter(F.col("n_rows") > 0)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from ..operators.materialize import delta_fold_group_agg

        if self._state.applied_batch() == batch_id:
            return  # redelivery: deltas were already merged
        spark = batch_df.sparkSession
        k, g, v = self.key_col, self.group_col, self.value_col

        w = Window.partitionBy(k).orderBy(*self.order_cols)
        b = batch_df.select(
            k,
            g,
            v,
            *self.order_cols,
            F.lag(g).over(w).alias("__bg"),
            F.lag(v).over(w).alias("__bv"),
            F.row_number().over(w).alias("__rn"),
        ).persist()
        try:
            prev_ks = self._state.current_table(spark, "keystate")
            if prev_ks is None:
                # null images typed from the FEED's own columns — a
                # hardcoded string/long here would corrupt non-string
                # groups or non-long values on the first batch
                g_t = b.schema[g].dataType
                v_t = b.schema[v].dataType
                changes = b.withColumn("__sg", F.lit(None).cast(g_t)).withColumn(
                    "__sv", F.lit(None).cast(v_t)
                )
            else:
                state = prev_ks.select(
                    F.col(k).alias("__sk"),
                    F.col(g).alias("__sg"),
                    F.col(v).alias("__sv"),
                )
                changes = b.join(state, b[k] == state["__sk"], "left").drop("__sk")
            deltas = delta_fold_group_agg(
                changes,
                before_group=F.when(F.col("__rn") == 1, F.col("__sg")).otherwise(
                    F.col("__bg")
                ),
                before_value=F.when(F.col("__rn") == 1, F.col("__sv")).otherwise(
                    F.col("__bv")
                ),
                after_group=F.col(g),
                after_value=F.col(v),
                drop_empty=False,
            ).select(
                F.col("g").alias(g),
                "n_rows",
                "sum_value",
            )

            prev_tot = self._state.current_table(spark, "totals")
            merged = (
                prev_tot.unionByName(deltas) if prev_tot is not None else deltas
            )
            merged = merged.groupBy(g).agg(
                F.sum("n_rows").alias("n_rows"),
                F.sum("sum_value").alias("sum_value"),
            )

            batch_last = latest_by_key(
                b.select(k, g, v, *self.order_cols), [k], self.order_cols
            )
            new_ks = (
                latest_by_key(
                    prev_ks.unionByName(batch_last), [k], self.order_cols
                )
                if prev_ks is not None
                else batch_last
            )

            self._state.publish_tables(
                {"totals": merged, "keystate": new_ks}, batch_id
            )
        finally:
            b.unpersist()


class IncrementalJoinMaintainer:
    """Streaming incremental maintenance of a JOIN view — the Z-set delta
    rule (operators/materialize.join_delta) driven from a change feed:
    per-batch work proportional to the BATCH's deltas (times join
    fan-out), never to the view.

    Three state tables under ``root``, published in ONE
    :meth:`AtomicStateDir.publish_tables` pointer swap (they must move
    together — ``d(A ⋈ B)`` is computed against the states BEFORE the
    batch, so a crash stranding ``a``/``b`` a batch ahead of ``view``
    would corrupt every replayed delta):

    - ``a`` / ``b`` — the two base relations' current states (set
      semantics: the feed's deletes carry the exact current row image,
      the CDC before/after contract, so multiplicities fold to 0/1).
    - ``view`` — the maintained per-group aggregate of the join
      (``group_cols``, ``n``, one ``sum_<c>`` per measure), updated by a
      |changed-groups|-sized union+sum fold of the batch's
      ``join_delta`` output. Bootstrap needs no special case: against
      empty states the rule degenerates to ``dA ⋈ dB``, which IS the
      initial materialization.

    Delta merging is not idempotent → a redelivered batch (same id as
    the live publication) is skipped whole, the
    :class:`IncrementalAggMaintainer` guard."""

    def __init__(
        self,
        root: str,
        on: Sequence[str],
        group_cols: Sequence[str],
        measure_cols: Sequence[str],
        z: str = "__z",
        keep_versions: int = 1,
    ):
        self.on = list(on)
        self.group_cols = list(group_cols)
        self.measure_cols = list(measure_cols)
        self.z = z
        self._state = AtomicStateDir(root, keep_versions=keep_versions)

    def current_view(self, spark: SparkSession) -> DataFrame | None:
        from pyspark.sql import functions as F

        v = self._state.current_table(spark, "view")
        if v is None:
            return None
        # groups net to zero only at read time; partials must keep them
        return v.filter(F.col("n") > 0)

    def _fold_side(self, state: DataFrame | None, delta: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        cols = [c for c in delta.columns if c != self.z]
        live = (
            delta.select(*cols, F.col(self.z).alias("__m"))
            if state is None
            else state.select(*cols, F.lit(1).cast("long").alias("__m")).unionByName(
                delta.select(*cols, F.col(self.z).alias("__m"))
            )
        )
        return (
            live.groupBy(*cols)
            .agg(F.sum("__m").alias("__m"))
            .filter(F.col("__m") > 0)
            .drop("__m")
        )

    def process_batch(self, da: DataFrame, db: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from ..operators.materialize import join_delta

        if self._state.applied_batch() == batch_id:
            return  # redelivery: deltas were already merged
        spark = da.sparkSession
        a_cols = [c for c in da.columns if c != self.z]
        b_cols = [c for c in db.columns if c != self.z]
        a = self._state.current_table(spark, "a")
        b = self._state.current_table(spark, "b")
        a_pre = a if a is not None else da.select(*a_cols).limit(0)
        b_pre = b if b is not None else db.select(*b_cols).limit(0)

        dv = join_delta(a_pre, b_pre, da, db, on=self.on, z=self.z)
        zc = F.col(self.z)
        dview = dv.groupBy(*self.group_cols).agg(
            F.sum(zc).alias("n"),
            *[
                F.sum(zc * F.col(c)).alias(f"sum_{c}")
                for c in self.measure_cols
            ],
        )
        view_old = self._state.current_table(spark, "view")
        merged = (
            dview
            if view_old is None
            else view_old.unionByName(dview)
            .groupBy(*self.group_cols)
            .agg(
                F.sum("n").alias("n"),
                *[
                    F.sum(f"sum_{c}").alias(f"sum_{c}")
                    for c in self.measure_cols
                ],
            )
        )
        self._state.publish_tables(
            {
                "a": self._fold_side(a, da),
                "b": self._fold_side(b, db),
                "view": merged,
            },
            batch_id,
        )


class IncrementalMinMaxMaintainer:
    """Streaming incremental maintenance of a MIN/MAX (+count/sum) group
    view — the NON-INVERTIBLE aggregate case, driven from a z-weighted
    change feed via ``operators.materialize.minmax_delta_maintain``.

    Two state tables under ``root``, published in ONE
    :meth:`AtomicStateDir.publish_tables` pointer swap (they must move
    together: the maintain rule reads the OLD view but the NEW base —
    a crash stranding one a batch ahead would recompute risky groups
    against the wrong base):

    - ``base`` — the current base relation (set semantics, folded like
      the join maintainer's sides: deletes carry the exact row image).
      MIN/MAX maintenance is what makes keeping the base mandatory —
      when a group's extremum is deleted, the next-best value exists
      nowhere in the view; the rule's recompute leg reads it from here,
      semi-join-pruned to the risky groups only.
    - ``view`` — one row per group: ``n_rows``, ``sum_v``, ``min_v``,
      ``max_v``.

    Per-batch work: delta-sized fold + risky-group-pruned base scan.
    Redelivered batch ids are skipped whole (merge is not idempotent),
    the IncrementalAggMaintainer guard."""

    def __init__(
        self,
        root: str,
        on: Sequence[str],
        val: str,
        z: str = "__z",
        keep_versions: int = 1,
    ):
        self.on = list(on)
        self.val = val
        self.z = z
        self._state = AtomicStateDir(root, keep_versions=keep_versions)

    def current_view(self, spark: SparkSession) -> DataFrame | None:
        return self._state.current_table(spark, "view")

    def _fold_base(
        self, state: DataFrame | None, delta: DataFrame
    ) -> DataFrame:
        from pyspark.sql import functions as F

        cols = [c for c in delta.columns if c != self.z]
        live = (
            delta.select(*cols, F.col(self.z).alias("__m"))
            if state is None
            else state.select(
                *cols, F.lit(1).cast("long").alias("__m")
            ).unionByName(delta.select(*cols, F.col(self.z).alias("__m")))
        )
        return (
            live.groupBy(*cols)
            .agg(F.sum("__m").alias("__m"))
            .filter(F.col("__m") > 0)
            .drop("__m")
        )

    def process_batch(self, delta: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from ..operators.materialize import minmax_delta_maintain

        if self._state.applied_batch() == batch_id:
            return  # redelivery: already merged
        spark = delta.sparkSession
        delta = delta.persist()
        try:
            base_old = self._state.current_table(spark, "base")
            base_new = self._fold_base(base_old, delta).persist()
            view_old = self._state.current_table(spark, "view")
            if view_old is None:
                from ..sources.tables import local_rows

                view_old = local_rows(spark,
                    [],
                    base_new.select(
                        *self.on,
                        F.lit(0).cast("long").alias("n_rows"),
                        F.lit(0).cast("long").alias("sum_v"),
                        F.col(self.val).alias("min_v"),
                        F.col(self.val).alias("max_v"),
                    ).schema,
                )
            # round-20 (guide §2.4): the maintainer's full-outer fold
            # already carries untouched view rows as identity folds —
            # take the FULL post-batch view from one plan instead of
            # re-scanning view_old and LeftAnti-joining the delta keys
            view_new = minmax_delta_maintain(
                view_old, base_new, delta, self.on, self.val, z=self.z,
                include_untouched=True,
            )
            self._state.publish_tables(
                {"base": base_new, "view": view_new}, batch_id,
            )
        finally:
            delta.unpersist()
            try:
                base_new.unpersist()
            except Exception:
                pass
