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
