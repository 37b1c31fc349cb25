"""Multi-table MERGE transactions: all-or-nothing changeset application
across SEVERAL partitioned tables.

A CDC feed routinely carries one upstream transaction's rows for many
tables (the reference fans one Postgres publication out to
topic-per-table, docs/setup-guide.md:33-35); applying them independently
lets a crash strand table A updated and table B not — the cross-table
inconsistency this module closes.

Legs are HETEROGENEOUS (round 15): each table keeps its own physical
strategy — copy-on-write (``plans/merge``) or merge-on-read
(``plans/mor``) — detected per path, with each strategy supplying its
own apply (``merge_into`` / ``merge_into_mor``), compensation
(``rollback_last_merge`` / ``rollback_last_mor``), history
(``merge_history`` / ``mor_history``), and snapshot read
(``read_version`` / ``read_mor``). A hot high-churn table can run MoR
while its dimension stays CoW, and one upstream transaction still lands
all-or-nothing across both.

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

Snapshot-isolated READS (round 13): a plain reader between leg publishes
still sees leg 1 applied and leg 2 not — but
:func:`read_transaction_snapshot` composes the journal, the committed-txn
log, and ``merge_into``'s version retention (``plans/merge.read_version``)
into a CONSISTENT cross-table view: every leg table AS OF the same
transaction boundary (all-pre or all-post), never a mix. At 100 TB the
same isolation comes from a table format's commit coordinator (one
metastore swap covering all tables); here the committed log plus
time-travel reads supply the read view while the saga supplies the
all-or-nothing write outcome.
"""

from __future__ import annotations

import json
import os

from .layout import maintenance_lock
from .merge import merge_history, merge_into, rollback_last_merge


def _is_mor(path: str) -> bool:
    """A leg table's physical strategy — merge-on-read tables carry a
    ``.mor/manifest.json``; the saga routes each leg to its strategy's
    primitives (merge_into_mor / rollback_last_mor / read_mor) so ONE
    transaction can span copy-on-write and MoR tables heterogeneously."""
    from .mor import _manifest_path

    return os.path.exists(_manifest_path(path))


def _leg_history_version(path: str) -> int | None:
    """Newest published version/sequence of a leg table (None if no
    history): the idempotency guard recovery checks before compensating."""
    if _is_mor(path):
        from .mor import mor_history

        hist = mor_history(path)
        return hist[-1]["seq"] if hist else None
    hist = merge_history(path)
    return hist[-1]["version"] if hist else None


def _leg_rollback(path: str) -> None:
    if _is_mor(path):
        from .mor import rollback_last_mor

        rollback_last_mor(path)
    else:
        rollback_last_merge(path)

JOURNAL = ".merge_txn.json"

#: committed-transaction log (append-only JSON list, atomic os.replace):
#: the durable record of each committed txn's (path, version) legs that
#: read_transaction_snapshot pins its consistent view to — the journal
#: alone cannot serve reads because it is removed on commit
TXN_LOG = ".merge_txn_log.json"


def _journal_path(txn_root: str) -> str:
    return os.path.join(txn_root, JOURNAL)


def _write_journal(txn_root: str, state: dict) -> None:
    os.makedirs(txn_root, exist_ok=True)
    tmp = _journal_path(txn_root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _journal_path(txn_root))


def _next_version(path: str) -> int:
    """The version the NEXT merge on ``path`` will create, mirroring
    each strategy's own assignment. Copy-on-write: max over ALL version
    dirs, manifest-complete or not (a crash-orphaned dir still claims
    its number) — not merge_history's complete-only view. Merge-on-read:
    the manifest is the only source of sequence numbers (a crashed
    writer's unpublished files never claim one — the sweep removes
    them), continuing above base_seq after a full compaction."""
    if _is_mor(path):
        from .mor import _read_manifest

        man = _read_manifest(path)
        if man["seqs"]:
            return man["seqs"][-1]["seq"] + 1
        return man.get("base_seq", 0) + 1
    hist_root = os.path.join(path, ".merge_history")
    if not os.path.isdir(hist_root):
        return 1
    prior = [
        int(d[1:])
        for d in os.listdir(hist_root)
        if d.startswith("v") and d[1:].isdigit()
    ]
    return max(prior, default=0) + 1


def committed_transactions(txn_root: str) -> list[dict]:
    """The committed-txn log, oldest → newest: one entry per committed
    transaction, ``{"txn_seq": n, "legs": [{"path", "version"}, ...]}``."""
    p = os.path.join(txn_root, TXN_LOG)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)


def _append_committed(txn_root: str, state: dict) -> None:
    """Append a committed journal state to the log — idempotent on
    ``txn_seq``, so the commit path AND a recovery sweep that finds a
    committed journal (crash between commit mark and journal removal)
    can both call it without duplicating the entry."""
    log = committed_transactions(txn_root)
    seq = state.get("txn_seq")
    if seq is None:  # pre-log-era journal: assign the next sequence
        seq = (log[-1]["txn_seq"] + 1) if log else 1
    if any(t["txn_seq"] == seq for t in log):
        return
    log.append({"txn_seq": seq, "legs": list(state["completed"])})
    p = os.path.join(txn_root, TXN_LOG)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(log, f)
    os.replace(tmp, p)


def recover_merge_transaction(txn_root: str) -> dict | None:
    """Recovery sweep: if an incomplete transaction journal exists under
    ``txn_root``, compensate it — roll back every completed leg (newest
    first) plus the in-flight leg if its expected version landed — and
    remove the journal. Returns a summary dict, or None if there was
    nothing to recover. Idempotent: each ``rollback_last_merge`` is
    guarded by the journal's recorded version, so a crash DURING recovery
    re-converges on the next call (a leg already rolled back no longer
    matches its recorded version and is skipped).

    Runs under the txn root's maintenance lock — the journal and the
    committed-txn log are read-modify-write state, so two writers on one
    ``txn_root`` fail LOUD instead of losing a committed entry or
    duplicating a ``txn_seq`` (round-13 advice: ``_append_committed``
    was an unlocked RMW)."""
    os.makedirs(txn_root, exist_ok=True)
    with maintenance_lock(txn_root):
        return _recover_unlocked(txn_root)


def _recover_unlocked(txn_root: str) -> dict | None:
    jp = _journal_path(txn_root)
    if not os.path.exists(jp):
        return None
    with open(jp) as f:
        state = json.load(f)
    if state.get("committed"):
        # crash landed between the commit mark and journal removal:
        # finish the commit — log first (idempotent), then clean up
        _append_committed(txn_root, state)
        os.remove(jp)
        return {"rolled_back": [], "committed": True}
    rolled = []
    legs = list(state.get("completed", []))
    inflight = state.get("in_flight")
    if inflight is not None:
        legs.append(inflight)
    for leg in reversed(legs):
        if _leg_history_version(leg["path"]) == leg["version"]:
            _leg_rollback(leg["path"])
            rolled.append(leg["path"])
        # else: the leg never completed (each strategy's own staging
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
    crashed transaction is recovered first.

    The whole saga holds the txn root's maintenance lock (single writer
    per ``txn_root``, fail-loud): the journal and the committed-txn log
    are read-modify-write files, and two concurrent sagas would clobber
    each other's journal and could lose/duplicate log entries that
    ``read_transaction_snapshot`` later pins to. Per-TABLE locks are
    taken by each leg's ``merge_into`` as before (different lock files —
    no self-deadlock). Snapshot READS stay lock-free: every journal/log
    update is an atomic ``os.replace``, so a reader sees either the old
    or the new file, never a torn one."""
    os.makedirs(txn_root, exist_ok=True)
    with maintenance_lock(txn_root):
        return _merge_transaction_locked(spark, txn_root, ops)


def _merge_transaction_locked(spark, txn_root: str, ops: list[dict]) -> dict:
    _recover_unlocked(txn_root)
    prior = committed_transactions(txn_root)
    state: dict = {
        "txn_seq": (prior[-1]["txn_seq"] + 1) if prior else 1,
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
            path = op.pop("path")
            source = op.pop("source")
            mor = _is_mor(path)
            if mor:
                bad = [k for k in ("keys", "partition_col") if k in op]
                if bad:
                    raise ValueError(
                        f"leg {path} is a merge-on-read table: {bad} are "
                        "pinned in its manifest — remove them from the op"
                    )
            else:
                op["keep_history"] = True
            state["in_flight"] = {
                "path": path,
                "version": _next_version(path),
            }
            _write_journal(txn_root, state)
            if mor:
                from .mor import merge_into_mor

                rep = merge_into_mor(spark, path, source, **op)
                version = rep["seq"]
            else:
                rep = merge_into(spark, path, source, **op)
                version = rep["version"]
            # an empty changeset publishes nothing (MoR seq=None):
            # no leg to compensate, and the snapshot reader treats the
            # table as untouched by this transaction
            if version is not None:
                state["completed"].append(
                    {"path": path, "version": version}
                )
            state["in_flight"] = None
            _write_journal(txn_root, state)
            reports.append(rep)
    except BaseException:
        # already holding the txn-root lock — recover directly (the
        # public wrapper would self-conflict on the flock)
        _recover_unlocked(txn_root)
        raise
    state["committed"] = True
    _write_journal(txn_root, state)
    _append_committed(txn_root, state)
    os.remove(_journal_path(txn_root))
    return {
        "reports": reports,
        "n_legs": len(reports),
        "txn_seq": state["txn_seq"],
    }


def read_transaction_snapshot(
    spark, txn_root: str, txn_seq: int | None = None, at: str = "post"
) -> dict:
    """Consistent multi-table READ over the transaction log — every leg
    table AS OF the same transaction boundary, closing the module's
    documented isolation gap locally (a reader between saga legs no
    longer has to see leg 1 applied and leg 2 not).

    Returns ``{table_path: DataFrame}``. ``at="post"`` reads each leg
    table as of the version that transaction committed for it;
    ``at="pre"`` reads each as of the version just before — both are
    time-travel reads (``plans/merge.read_version``), so the view is
    stable even after LATER merges land on the tables. ``txn_seq=None``
    picks the newest committed transaction; if an INCOMPLETE journal is
    present (a transaction in flight or crashed mid-saga), the default
    view instead serves every journaled table at its PRE-txn state —
    the only boundary that is consistent before the commit mark, and
    exactly what a table format's snapshot isolation would show.
    Requires the spanned versions still retained (un-vacuumed), same
    contract as read_version.

    At 100 TB this is pure manifest work per table plus partition-pruned
    scans — no data copies; the log is one small JSON per txn root.
    """
    from .merge import read_version

    def leg_read(path: str, version: int):
        if _is_mor(path):
            from .mor import read_mor

            return read_mor(spark, path, version)
        return read_version(spark, path, version)

    if at not in ("pre", "post"):
        raise ValueError(f"at must be 'pre' or 'post', got {at!r}")
    jp = _journal_path(txn_root)
    if txn_seq is None and os.path.exists(jp):
        with open(jp) as f:
            state = json.load(f)
        if not state.get("committed"):
            # in-flight / crashed saga: the consistent boundary is the
            # pre-state of every journaled leg. A completed leg rewinds
            # one version; the in-flight leg rewinds only if its
            # expected version actually landed; untouched legs read as
            # of their latest retained version (their pre == current).
            out = {}
            done = {
                leg["path"]: leg["version"]
                for leg in state.get("completed", [])
            }
            inflight = state.get("in_flight")
            if inflight is not None:
                landed = _leg_history_version(inflight["path"])
                if landed is not None and landed == inflight["version"]:
                    done[inflight["path"]] = inflight["version"]
            for path in state["ops"]:
                if path in done:
                    out[path] = leg_read(path, done[path] - 1)
                elif _is_mor(path):
                    from .mor import read_mor

                    out[path] = read_mor(spark, path)
                else:
                    hist = merge_history(path)
                    if hist:
                        out[path] = read_version(
                            spark, path, hist[-1]["version"]
                        )
                    else:
                        out[path] = spark.read.parquet(path)
            return out
    log = committed_transactions(txn_root)
    if not log:
        raise ValueError(f"no committed transactions under {txn_root}")
    if txn_seq is None:
        txn = log[-1]
    else:
        match = [t for t in log if t["txn_seq"] == txn_seq]
        if not match:
            raise ValueError(
                f"txn_seq {txn_seq} not in committed log "
                f"({[t['txn_seq'] for t in log]})"
            )
        txn = match[0]
    delta = 0 if at == "post" else 1
    return {
        leg["path"]: leg_read(leg["path"], leg["version"] - delta)
        for leg in txn["legs"]
    }
