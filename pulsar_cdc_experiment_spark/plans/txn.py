"""Multi-table MERGE transactions: all-or-nothing changeset application
across SEVERAL partitioned tables.

A CDC feed routinely carries one upstream transaction's rows for many
tables (the reference fans one Postgres publication out to
topic-per-table, docs/setup-guide.md:33-35); applying them independently
lets a crash strand table A updated and table B not — the cross-table
inconsistency this module closes.

Design: a journaled SAGA over the battle-tested single-table primitives,
NOT a re-implementation of publish. Each leg runs
``merge_into(keep_history=True)`` (its own crash-window discipline and
per-table maintenance lock apply unchanged); the journal — one JSON file
under the caller's transaction root, every update an atomic
``os.replace`` — records the planned legs, the leg in flight (with the
history version it WILL create), and each completed leg's version. On
failure or crash, recovery compensates: completed legs roll back newest
first via ``rollback_last_merge`` (itself crash-safe and idempotent), the
in-flight leg rolls back only if its expected history version actually
landed, and a leg that died mid-merge needs nothing (``merge_into``'s own
recovery discards its staging). Before the commit mark the protocol is
presumed-abort: every crash point converges to "no table changed".

What this deliberately does NOT give locally: snapshot-isolated READS
across tables mid-transaction — a reader between leg publishes sees leg 1
applied and leg 2 not. At 100 TB that isolation comes from a table
format's commit coordinator (one metastore swap covering all tables);
the all-or-nothing OUTCOME proven here is the part the engine owns.
"""

from __future__ import annotations

import json
import os

from .merge import merge_history, merge_into, rollback_last_merge

JOURNAL = ".merge_txn.json"


def _journal_path(txn_root: str) -> str:
    return os.path.join(txn_root, JOURNAL)


def _write_journal(txn_root: str, state: dict) -> None:
    os.makedirs(txn_root, exist_ok=True)
    tmp = _journal_path(txn_root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _journal_path(txn_root))


def _next_version(path: str) -> int:
    """The version the NEXT ``merge_into(keep_history=True)`` on ``path``
    will create — must mirror merge_into's own assignment (max over ALL
    version dirs, manifest-complete or not: a crash-orphaned dir still
    claims its number), not merge_history's complete-only view."""
    hist_root = os.path.join(path, ".merge_history")
    if not os.path.isdir(hist_root):
        return 1
    prior = [
        int(d[1:])
        for d in os.listdir(hist_root)
        if d.startswith("v") and d[1:].isdigit()
    ]
    return max(prior, default=0) + 1


def recover_merge_transaction(txn_root: str) -> dict | None:
    """Recovery sweep: if an incomplete transaction journal exists under
    ``txn_root``, compensate it — roll back every completed leg (newest
    first) plus the in-flight leg if its expected version landed — and
    remove the journal. Returns a summary dict, or None if there was
    nothing to recover. Idempotent: each ``rollback_last_merge`` is
    guarded by the journal's recorded version, so a crash DURING recovery
    re-converges on the next call (a leg already rolled back no longer
    matches its recorded version and is skipped)."""
    jp = _journal_path(txn_root)
    if not os.path.exists(jp):
        return None
    with open(jp) as f:
        state = json.load(f)
    if state.get("committed"):
        os.remove(jp)
        return {"rolled_back": [], "committed": True}
    rolled = []
    legs = list(state.get("completed", []))
    inflight = state.get("in_flight")
    if inflight is not None:
        legs.append(inflight)
    for leg in reversed(legs):
        hist = merge_history(leg["path"])
        if hist and hist[-1]["version"] == leg["version"]:
            rollback_last_merge(leg["path"])
            rolled.append(leg["path"])
        # else: the leg never completed (merge_into's own staging
        # recovery applies) or was already rolled back — nothing to undo
    os.remove(jp)
    return {"rolled_back": rolled, "committed": False}


def merge_transaction(spark, txn_root: str, ops: list[dict]) -> dict:
    """Apply ``ops`` — each a kwargs dict for :func:`merge_into` with at
    least ``path``, ``source``, ``keys``, ``partition_col`` — as one
    all-or-nothing transaction journaled under ``txn_root``.

    Every leg runs with ``keep_history=True`` (the rollback capability IS
    the transaction mechanism; vacuum the history separately per
    retention policy). Raises the first leg's error after compensating
    already-applied legs. A pre-existing incomplete journal from a
    crashed transaction is recovered first."""
    recover_merge_transaction(txn_root)
    state: dict = {
        "ops": [op["path"] for op in ops],
        "completed": [],
        "in_flight": None,
        "committed": False,
    }
    _write_journal(txn_root, state)
    reports = []
    try:
        for op in ops:
            op = dict(op)
            op["keep_history"] = True
            path = op.pop("path")
            source = op.pop("source")
            state["in_flight"] = {
                "path": path,
                "version": _next_version(path),
            }
            _write_journal(txn_root, state)
            rep = merge_into(spark, path, source, **op)
            state["completed"].append(
                {"path": path, "version": rep["version"]}
            )
            state["in_flight"] = None
            _write_journal(txn_root, state)
            reports.append(rep)
    except BaseException:
        recover_merge_transaction(txn_root)
        raise
    state["committed"] = True
    _write_journal(txn_root, state)
    os.remove(_journal_path(txn_root))
    return {"reports": reports, "n_legs": len(reports)}
