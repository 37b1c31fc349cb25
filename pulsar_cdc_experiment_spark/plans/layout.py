"""Table-layout maintenance: small-file compaction + range layout.

Streaming sinks produce a file per micro-batch per partition (A18); at
100 TB the resulting small-files problem degrades every downstream scan
(file-open overhead, tiny row groups, no useful min/max stats). The two
maintenance passes every parquet-based deployment runs:

- :func:`compact_parquet` — rewrite a directory into ~``target_mb`` files
  (count derived from actual bytes, never a guessed constant);
- :func:`range_layout` — additionally repartitionByRange + sort within
  files on a key, so parquet min/max stats make key-range scans prune at
  the ROW-GROUP level (the poor man's clustering index; at petabyte scale
  this is the difference between reading 3 files and 3,000).

Both write to a NEW directory; callers swap atomically (the pointer-file
pattern of streaming/materialize.py) or point the catalog at the new
location. Rewriting in place would lose the crash-safety story.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


# hidden-dir prefix pairs used by every in-place partition-swap
# operator in this package: (aside, staging) for partition-scoped
# OPTIMIZE (this module) and for MERGE (plans/merge.py). Recovery must
# sweep ALL pairs regardless of which operator is running — a table
# maintained by both would otherwise read minus a partition whose aside
# only the OTHER operator knows how to restore (round-9 review).
OPT_ASIDE, OPT_STAGING = ".opt_old_", ".opt_staging_"
MERGE_ASIDE, MERGE_STAGING = ".merge_old_", ".merge_staging_"
SWAP_PREFIXES = (
    (OPT_ASIDE, OPT_STAGING),
    (MERGE_ASIDE, MERGE_STAGING),
)


def recover_partition_swaps(root: str) -> None:
    """Crash-recovery sweep for the staged-swap rename discipline: an
    aside whose live dir vanished (crash between the two renames) is
    that partition's only complete copy — restore it; every other
    leftover aside/staging is dead weight (including the tombstone
    renames of intentionally-deleted partitions, which use a
    STAGING-prefixed name precisely so this sweep DISCARDS them instead
    of resurrecting rows a merge meant to remove — round-9 advice).
    Sweeps every operator's prefix family (SWAP_PREFIXES) and recurses
    into nested partition levels (``a=x/.merge_old_b=y`` for composite
    partition keys); hidden dirs like ``.merge_history`` are never
    descended into."""
    import shutil

    for entry in sorted(os.listdir(root)):
        p = os.path.join(root, entry)
        if not os.path.isdir(p):
            continue
        handled = False
        for aside, staging in SWAP_PREFIXES:
            if entry.startswith(aside):
                live = os.path.join(root, entry[len(aside):])
                if not os.path.exists(live):
                    os.rename(p, live)
                else:
                    shutil.rmtree(p, ignore_errors=True)
                handled = True
                break
            elif entry.startswith(staging):
                shutil.rmtree(p, ignore_errors=True)
                handled = True
                break
        if not handled and "=" in entry and not entry.startswith("."):
            recover_partition_swaps(p)


class maintenance_lock:
    """Single-writer guard for in-place table maintenance (MERGE,
    partition-scoped OPTIMIZE, rollback/vacuum): all of them sweep each
    other's staging/aside dirs at entry, so two concurrent maintainers
    on the same table root would destroy each other's in-flight state
    (round-9 advice — the contract was implicit and unguarded).

    Mutual exclusion is ``fcntl.flock`` (LOCK_EX|LOCK_NB) on a
    PERSISTENT sidecar file: the kernel releases the lock the instant
    the holder dies, so a crashed maintainer never needs a stale-lock
    steal — and there is no steal *protocol* to race on. The round-10
    rename-based steal was still double-grantable (round-11 advice: a
    waiter that read a dead pid could rename away a SECOND waiter's
    freshly-created live lock); flock's conflict check is atomic in the
    kernel per open-file-description, so exactly one acquirer wins, in-
    and cross-process alike. A ``.maintenance_lock`` pid file (created
    under the flock, removed on release) remains the human-readable
    "who holds this table" breadcrumb and feeds the loud-failure
    message. Local-filesystem stand-in for a table format's
    commit/transaction protocol — at 100 TB Delta/Iceberg's
    optimistic-concurrency commit does this job (flock is also not
    NFS-safe; neither is the rest of the rename discipline)."""

    def __init__(self, root: str):
        self.path = os.path.join(root, ".maintenance_lock")
        self._fd = -1

    def __enter__(self):
        import fcntl

        fd = os.open(self.path + ".flock", os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            os.close(fd)
            try:
                with open(self.path) as f:
                    pid = f.read().strip() or "unknown"
            except OSError:
                pid = "unknown"
            raise RuntimeError(
                f"table maintenance lock at {self.path} is held by "
                f"live pid {pid}; concurrent maintenance on one "
                "table root is not supported (single-writer "
                "contract)"
            ) from None
        self._fd = fd
        # breadcrumb written only AFTER the flock is ours; a leftover
        # pid file from a crashed holder is dead weight — overwrite it
        with open(self.path, "w") as f:
            f.write(str(os.getpid()))
        return self

    def __exit__(self, *exc):
        # remove only a breadcrumb THIS process wrote (a test/operator
        # may have replaced it); the flock itself releases on close
        try:
            with open(self.path) as f:
                own = f.read().strip() == str(os.getpid())
        except OSError:
            own = False
        if own:
            try:
                os.unlink(self.path)
            except FileNotFoundError:
                pass
        if self._fd >= 0:
            os.close(self._fd)
            self._fd = -1
        return False


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def target_file_count(total_bytes: int, target_mb: int = 256) -> int:
    return max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))


def compact_parquet(
    spark: SparkSession, src: str, dst: str, target_mb: int = 256
) -> int:
    """Rewrite ``src`` parquet into ``dst`` with ~``target_mb``-sized files.

    Returns the file count written. Round-robin repartition: compaction
    balances bytes, it does not impose an order — use :func:`range_layout`
    when downstream scans filter on a key.
    """
    n = target_file_count(dir_bytes(src), target_mb)
    df = spark.read.parquet(src)
    df.repartition(n).write.mode("overwrite").parquet(dst)
    return n


def range_layout(
    df: DataFrame, dst: str, key_cols: list[str], files: int
) -> None:
    """Write ``df`` as ``files`` parquet files range-partitioned AND sorted
    by ``key_cols`` — each file owns a disjoint key range and its row
    groups carry tight min/max stats, so key filters prune before I/O."""
    from pyspark.sql import functions as F

    (
        df.repartitionByRange(files, *[F.col(c) for c in key_cols])
        .sortWithinPartitions(*key_cols)
        .write.mode("overwrite")
        .parquet(dst)
    )


def optimize_table(
    spark: SparkSession,
    src: str,
    dst: str,
    zorder_cols: list[str] | None = None,
    target_mb: int = 256,
    bits: int = 12,
    bloom_cols: list[str] | None = None,
    bloom_ndv: int = 100_000,
) -> dict:
    """The user-facing "OPTIMIZE [ZORDER BY]" maintenance composite:
    small-file compaction to the byte-derived file count, optional
    multi-column Z-order clustering, and a footer-stats refresh — the
    Delta/Iceberg table-maintenance verb as one operator over plain
    parquet.

    Writes ``src`` rewritten into ``dst`` (a NEW directory; callers swap,
    see module docstring) and returns a maintenance report::

        {"bytes": ..., "files_before": ..., "files_after": ...,
         "target_files": ..., "stats": {col_min/col_max per zorder col}}

    The stats come from :func:`plans.stats.footer_min_max` over the
    REWRITTEN table — metadata-only (PushedAggregation), so the refresh
    costs footer reads, not a data scan. At 100 TB this is the scheduled
    job that keeps streaming-sink output scannable: compaction bounds
    file-open overhead, the Z-order pass restores multi-dimension
    pruning, and the refreshed stats feed whatever catalog fronts the
    table.
    """
    import glob

    from .stats import footer_min_max

    def n_files(path: str) -> int:
        return len(glob.glob(os.path.join(path, "part-*")))

    total = dir_bytes(src)
    n = target_file_count(total, target_mb)
    report: dict = {"bytes": total, "files_before": n_files(src), "target_files": n}
    df = spark.read.parquet(src)
    # bloom secondary indexes ride the SAME rewrite: the maintenance job
    # that restores clustering is the moment to (re)build the point-lookup
    # sketches too — one pass, no second write (plans/bloom.py)
    opts: dict[str, str] | None = None
    if bloom_cols:
        from .bloom import bloom_write_options

        opts = bloom_write_options(bloom_cols, bloom_ndv)
        report["bloom_cols"] = list(bloom_cols)
    if zorder_cols:
        zorder_layout(df, dst, zorder_cols, files=n, bits=bits, write_options=opts)
    else:
        w = df.repartition(n).write.mode("overwrite")
        for k, v in (opts or {}).items():
            w = w.option(k, v)
        w.parquet(dst)
    report["files_after"] = n_files(dst)
    if zorder_cols:
        report["stats"] = footer_min_max(spark, dst, zorder_cols).first().asDict()
    return report


def zorder_layout(
    df: DataFrame,
    dst: str,
    cols: list[str],
    files: int,
    bits: int = 12,
    write_options: dict[str, str] | None = None,
) -> None:
    """Write ``df`` clustered on the MORTON (Z-order) interleaving of
    ``cols`` — the multi-column analog of :func:`range_layout`.

    Range layout on one key gives perfect pruning on that key and NONE on
    any other (every file spans the full range of the second column).
    Z-order interleaves the quantized bits of k columns, so consecutive
    z-values are near each other in EVERY dimension: each written file
    owns a small hyper-rectangle, and parquet min/max stats prune
    row-groups for predicates on ANY clustered column (the technique
    behind Delta/Iceberg OPTIMIZE ZORDER — at 100 TB this is the
    difference between a 2-D range query reading ~sqrt(files) files and
    reading all of them).

    Columns are min-max quantized to ``bits`` levels (one bounds
    aggregate — a layout-maintenance job, like the byte-count in
    :func:`compact_parquet`); the z-value is pure integer expression
    work (shift/mask/or), never a UDF, and is dropped before write.
    """
    from pyspark.sql import functions as F

    bounds = df.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in cols],
        *[F.max(c).alias(f"__hi_{c}") for c in cols],
    ).first()
    n = len(cols)
    quantized = []
    for c in cols:
        lo, hi = bounds[f"__lo_{c}"], bounds[f"__hi_{c}"]
        if lo is None or hi is None:
            # empty input or an all-null clustering column: there is no
            # range to interleave — refuse loudly rather than write a
            # layout that silently clusters on garbage
            raise ValueError(
                f"zorder_layout: no min/max bounds for column {c!r} "
                "(empty DataFrame or all-null column)"
            )
        lo, hi = float(lo), float(hi)
        span = hi - lo if hi > lo else 1.0
        q = F.least(
            F.lit(2**bits - 1),
            ((F.col(c).cast("double") - F.lit(lo)) * F.lit((2**bits - 1) / span))
            .cast("long"),
        )
        # nulls quantize explicitly to bucket 0 (F.least SKIPS nulls, so
        # a null value would otherwise ride into the TOP bucket and
        # pollute the max-range files' min/max stats)
        quantized.append(
            F.when(F.col(c).isNull(), F.lit(0).cast("long")).otherwise(q)
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(quantized):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(q, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    w = (
        df.withColumn("__z", z)
        .repartitionByRange(files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
    )
    for k, v in (write_options or {}).items():
        w = w.option(k, v)
    w.parquet(dst)


def optimize_partitions(
    spark: SparkSession,
    root: str,
    frag_threshold_files: int = 8,
    target_mb: int = 256,
) -> dict[str, dict]:
    """Partition-scoped incremental OPTIMIZE over a hive-partitioned
    table — the ``OPTIMIZE table WHERE partition = ...`` shape Delta and
    Iceberg users schedule: inspect each partition directory's file
    count and rewrite ONLY the fragmented ones (more than
    ``frag_threshold_files`` data files), leaving healthy partitions
    byte-untouched (tests assert file-for-file identity).

    Why this matters at 100 TB: a streaming sink fragments only the
    partitions it currently lands in (today's date, the hot tenants); a
    whole-table OPTIMIZE rewrites 100 TB to fix 100 GB. Scoping the
    rewrite to fragmented partitions makes maintenance cost proportional
    to ingest since the last pass, not to table size — the property that
    lets maintenance run nightly.

    Per-partition swap: the compacted rewrite lands in a DOT-PREFIXED
    staging dir, the old partition moves to a dot-prefixed aside dir,
    staged renames live, aside is removed. Dot prefixes matter (round-7
    review catch): Spark's partition discovery skips hidden dirs, so
    NEITHER crash window can corrupt reads — a crash between the two
    renames leaves that partition temporarily ABSENT from reads (its
    data intact in the hidden aside; the next run restores it), never
    half-written, never duplicated, never resurfacing under a bogus
    ``event_type=click.old`` partition value. (On a transactional table
    format the same loop is one metadata commit.)

    Returns ``{partition_dir_name: {"files_before", "files_after",
    "rewritten"}}``.
    """
    import glob
    import shutil

    ASIDE, STAGING = OPT_ASIDE, OPT_STAGING

    def data_files(path: str) -> list[str]:
        return sorted(glob.glob(os.path.join(path, "part-*")))

    with maintenance_lock(root):
        recover_partition_swaps(root)

        report: dict[str, dict] = {}
        for entry in sorted(os.listdir(root)):
            pdir = os.path.join(root, entry)
            if entry.startswith(".") or not (
                os.path.isdir(pdir) and "=" in entry
            ):
                continue
            before = len(data_files(pdir))
            if before > frag_threshold_files:
                staged = os.path.join(root, STAGING + entry)
                n = target_file_count(dir_bytes(pdir), target_mb)
                # reading the partition dir directly yields data columns
                # only (the partition value lives in the dir name) — the
                # rewrite preserves exactly the on-disk column set
                spark.read.parquet(pdir).repartition(n).write.mode(
                    "overwrite"
                ).parquet(staged)
                aside = os.path.join(root, ASIDE + entry)
                os.rename(pdir, aside)
                os.rename(staged, pdir)
                shutil.rmtree(aside)
                report[entry] = {
                    "files_before": before,
                    "files_after": len(data_files(pdir)),
                    "rewritten": True,
                }
            else:
                report[entry] = {
                    "files_before": before,
                    "files_after": before,
                    "rewritten": False,
                }
        return report
