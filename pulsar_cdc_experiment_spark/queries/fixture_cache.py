"""Session-scoped fixture-directory cache for layout/ingest queries.

The layout and ingest queries write a derived copy of ``events`` (a
Z-ordered layout, a bloom-indexed layout, a partitioned layout, a text
feed) at construction — the write IS the fixture, sanctioned in the
build-jobs gate. Before round 7, EVERY invocation wrote a fresh
``tempfile.mkdtemp`` copy, so a session that runs driver + parity + bench
accumulated ~5 copies of the table per pass with no reuse or cleanup
(round-6 verdict, "what's wrong" #2).

This cache keys each fixture by ``(kind, sf_dir, content-version)`` and
builds it AT MOST ONCE per process; later invocations of the same query
reuse the directory and run only the probe. The content-version string is
bumped whenever the fixture's bytes would change (schema, corruption
keying, layout parameters), which is what makes reuse sound: a cached dir
is only ever served to the exact build recipe that produced it.

Teardown: every cached dir is removed at interpreter exit (atexit), and
``clear()`` offers an explicit hook — bench.py clears between timed runs
of fixture-building queries so their measured cost stays the FULL
build+probe cycle (continuity with rounds 1–6), and the build-jobs gate
clears first so construction demonstrably still runs the sanctioned jobs.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from collections.abc import Callable

_CACHE: dict[tuple[str, str, str], str] = {}


def session_fixture(
    kind: str, sf_dir: str, version: str, build: Callable[[str], None]
) -> str:
    """Return the fixture root for ``(kind, sf_dir, version)``, invoking
    ``build(root)`` only on the first call per process. A failed build
    removes its partial directory and does not poison the cache."""
    key = (kind, os.path.abspath(sf_dir), version)
    path = _CACHE.get(key)
    if path is not None and os.path.isdir(path):
        return path
    path = tempfile.mkdtemp(prefix=f"{kind}_")
    try:
        build(path)
    except BaseException:
        shutil.rmtree(path, ignore_errors=True)
        raise
    _CACHE[key] = path
    return path


def write_feed_batches(
    feed_root: str,
    parts,
    base: int = 1_700_000_000,
    step: int = 60,
    flat: bool = False,
) -> None:
    """Write time-ordered streaming feed batches in ONE Spark job.

    The naive loop — one ``coalesce(1).write`` per batch — re-runs each
    part's full lineage, so window-derived batches pay a repeated
    scan + shuffle per batch. Tagging every part with a literal
    ``__batch`` and writing once with ``partitionBy`` shares a single
    pass over the union; ``repartition("__batch")`` lands each batch in
    exactly ONE task, hence ONE file per batch dir — the invariant
    ``maxFilesPerTrigger=1`` replay depends on. Batch dirs are renamed
    to ``{i:03d}`` and mtime-stamped ``base + i*step`` so the file
    stream replays them in feed order (the same layout the old loop
    produced)."""
    from pyspark.sql import functions as F

    parts = list(parts)
    tagged = None
    for i, p in enumerate(parts):
        t = p.withColumn("__batch", F.lit(i))
        tagged = t if tagged is None else tagged.unionByName(t)
    _write_tagged_feed(feed_root, tagged, len(parts), base, step, flat)


def write_feed_batches_by(
    feed_root: str,
    df,
    batch_col,
    n: int,
    base: int = 1_700_000_000,
    step: int = 60,
    flat: bool = False,
) -> None:
    """:func:`write_feed_batches` for a feed SLICED from one DataFrame
    (``batch_col`` ∈ 0..n-1): tags with the expression directly, so the
    source is scanned ONCE instead of once per slice-filter leg."""
    _write_tagged_feed(
        feed_root, df.withColumn("__batch", batch_col), n, base, step,
        flat,
    )


def _write_tagged_feed(
    feed_root: str, tagged, n: int, base: int, step: int, flat: bool
) -> None:
    import glob as _glob

    staging = feed_root.rstrip(os.sep) + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    tagged.repartition("__batch").write.partitionBy("__batch").parquet(
        staging
    )
    os.makedirs(feed_root, exist_ok=True)
    for i in range(n):
        src = os.path.join(staging, f"__batch={i}")
        if not os.path.isdir(src):
            raise RuntimeError(
                f"feed batch {i} produced no rows — every batch of a "
                "replayed feed must be non-empty"
            )
        t = base + i * step
        if flat:
            # readers without recursiveFileLookup take one FILE per
            # batch directly under the feed root
            part = _glob.glob(os.path.join(src, "part-*.parquet"))
            if len(part) != 1:
                raise RuntimeError(f"expected one part file under {src}")
            dst = os.path.join(feed_root, f"{i:03d}.parquet")
            os.replace(part[0], dst)
            os.utime(dst, (t, t))
        else:
            dst = os.path.join(feed_root, f"{i:03d}")
            os.replace(src, dst)
            for fn in os.listdir(dst):
                os.utime(os.path.join(dst, fn), (t, t))
    shutil.rmtree(staging, ignore_errors=True)


_ONCE: set[tuple[str, str, str]] = set()


def session_once(
    kind: str, sf_dir: str, version: str, action: Callable[[], None]
) -> None:
    """Run ``action`` once per process for this key — the non-directory
    cousin of :func:`session_fixture`, for fixtures that live in the
    session CATALOG (bucketed saveAsTable) rather than a temp dir. A
    failed action does not mark the key done. ``clear()`` resets the
    marker (the build-jobs gate relies on this to re-observe the build);
    the catalog table itself persists in the temp warehouse and is
    rewritten by the next action run (mode=overwrite)."""
    key = (kind, os.path.abspath(sf_dir), version)
    if key in _ONCE:
        return
    action()
    _ONCE.add(key)


def clear(remove: bool = True, markers: bool = True) -> None:
    """Forget every cached fixture; ``remove=True`` also deletes the
    directories (the teardown hook). ``markers=False`` keeps the
    :func:`session_once` markers — bench.py uses this so clearing a
    DIRECTORY fixture between timed runs doesn't force unrelated
    catalog fixtures (bucketed tables) to rebuild inside a later
    query's timed region (round-7 review catch); the build-jobs gate
    clears with ``markers=True`` to re-observe every build."""
    for path in _CACHE.values():
        if remove:
            shutil.rmtree(path, ignore_errors=True)
    _CACHE.clear()
    if markers:
        _ONCE.clear()


atexit.register(clear)
