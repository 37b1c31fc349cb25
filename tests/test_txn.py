"""Multi-table MERGE transactions (plans/txn.py): all-or-nothing outcome
across tables, journaled saga recovery at every crash point."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest

from pulsar_cdc_experiment_spark.plans.merge import merge_history, merge_into
from pulsar_cdc_experiment_spark.plans.txn import (
    JOURNAL,
    merge_transaction,
    recover_merge_transaction,
)


def _mk(spark, root, name):
    path = os.path.join(root, name)
    rows = [(k, float(k), "a" if k % 2 == 0 else "b") for k in range(20)]
    spark.createDataFrame(rows, "k bigint, v double, p string").coalesce(
        1
    ).write.partitionBy("p").parquet(path)
    return path


def _chg(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, v double, p string, is_delete boolean"
    )


def _state(spark, path):
    return {
        (r["k"], r["v"], r["p"]) for r in spark.read.parquet(path).collect()
    }


@pytest.fixture()
def two_tables(spark):
    root = tempfile.mkdtemp(prefix="txn_")
    t1, t2 = _mk(spark, root, "t1"), _mk(spark, root, "t2")
    yield root, t1, t2
    shutil.rmtree(root, ignore_errors=True)


def _op(path, src):
    return {
        "path": path,
        "source": src,
        "keys": ["k"],
        "partition_col": "p",
    }


def test_txn_happy_path_applies_all_legs(spark, two_tables):
    root, t1, t2 = two_tables
    s1, s2 = _state(spark, t1), _state(spark, t2)
    out = merge_transaction(
        spark,
        root,
        [
            _op(t1, _chg(spark, [(4, 400.0, "a", False)])),
            _op(t2, _chg(spark, [(5, 0.0, "b", True), (100, 1.0, "a", False)])),
        ],
    )
    assert out["n_legs"] == 2
    assert not os.path.exists(os.path.join(root, JOURNAL))
    assert _state(spark, t1) == (s1 - {(4, 4.0, "a")}) | {(4, 400.0, "a")}
    assert _state(spark, t2) == (s2 - {(5, 5.0, "b")}) | {(100, 1.0, "a")}
    # history retained per leg (rollback capability outlives the commit)
    assert [m["version"] for m in merge_history(t1)] == [1]


def test_txn_failed_leg_rolls_back_completed_legs(spark, two_tables):
    root, t1, t2 = two_tables
    s1, s2 = _state(spark, t1), _state(spark, t2)
    bogus = spark.createDataFrame(
        [(1, "a", False)], "wrong bigint, p string, is_delete boolean"
    )
    with pytest.raises(Exception):
        merge_transaction(
            spark,
            root,
            [
                _op(t1, _chg(spark, [(4, 400.0, "a", False)])),
                _op(t2, bogus),  # missing key column -> leg 2 raises
            ],
        )
    assert not os.path.exists(os.path.join(root, JOURNAL))
    assert _state(spark, t1) == s1, "leg 1 must be compensated"
    assert _state(spark, t2) == s2
    assert merge_history(t1) == []  # rollback consumed the history copy


def test_recover_crash_after_leg1_before_leg2(spark, two_tables):
    """Journal says leg1 completed, leg2 in flight but never landed."""
    root, t1, t2 = two_tables
    s1 = _state(spark, t1)
    rep = merge_into(
        spark, t1, _chg(spark, [(4, 400.0, "a", False)]),
        keys=["k"], partition_col="p", keep_history=True,
    )
    with open(os.path.join(root, JOURNAL), "w") as f:
        json.dump(
            {
                "ops": [t1, t2],
                "completed": [{"path": t1, "version": rep["version"]}],
                "in_flight": {"path": t2, "version": 1},
                "committed": False,
            },
            f,
        )
    out = recover_merge_transaction(root)
    assert out == {"rolled_back": [t1], "committed": False}
    assert _state(spark, t1) == s1
    assert recover_merge_transaction(root) is None  # idempotent


def test_recover_crash_after_inflight_leg_landed(spark, two_tables):
    """Both legs' merges landed but the second was never recorded as
    completed (crash between merge and journal update): recovery must
    roll back BOTH — the expected-version guard identifies the landed
    in-flight leg."""
    root, t1, t2 = two_tables
    s1, s2 = _state(spark, t1), _state(spark, t2)
    r1 = merge_into(
        spark, t1, _chg(spark, [(4, 400.0, "a", False)]),
        keys=["k"], partition_col="p", keep_history=True,
    )
    r2 = merge_into(
        spark, t2, _chg(spark, [(5, 0.0, "b", True)]),
        keys=["k"], partition_col="p", keep_history=True,
    )
    with open(os.path.join(root, JOURNAL), "w") as f:
        json.dump(
            {
                "ops": [t1, t2],
                "completed": [{"path": t1, "version": r1["version"]}],
                "in_flight": {"path": t2, "version": r2["version"]},
                "committed": False,
            },
            f,
        )
    out = recover_merge_transaction(root)
    assert sorted(out["rolled_back"]) == sorted([t1, t2])
    assert _state(spark, t1) == s1 and _state(spark, t2) == s2


def test_recover_committed_journal_is_cleanup_only(spark, two_tables):
    root, t1, t2 = two_tables
    rep = merge_into(
        spark, t1, _chg(spark, [(4, 400.0, "a", False)]),
        keys=["k"], partition_col="p", keep_history=True,
    )
    after = _state(spark, t1)
    with open(os.path.join(root, JOURNAL), "w") as f:
        json.dump(
            {
                "ops": [t1],
                "completed": [{"path": t1, "version": rep["version"]}],
                "in_flight": None,
                "committed": True,
            },
            f,
        )
    out = recover_merge_transaction(root)
    assert out == {"rolled_back": [], "committed": True}
    assert _state(spark, t1) == after  # nothing undone


def test_txn_recovers_stale_journal_before_running(spark, two_tables):
    """A new transaction over a root holding a crashed predecessor's
    journal compensates it first, then applies cleanly."""
    root, t1, t2 = two_tables
    s1 = _state(spark, t1)
    rep = merge_into(
        spark, t1, _chg(spark, [(6, 600.0, "a", False)]),
        keys=["k"], partition_col="p", keep_history=True,
    )
    with open(os.path.join(root, JOURNAL), "w") as f:
        json.dump(
            {
                "ops": [t1],
                "completed": [{"path": t1, "version": rep["version"]}],
                "in_flight": None,
                "committed": False,
            },
            f,
        )
    merge_transaction(
        spark, root, [_op(t2, _chg(spark, [(7, 700.0, "b", False)]))]
    )
    assert _state(spark, t1) == s1, "stale leg compensated"
    assert (7, 700.0, "b") in _state(spark, t2)


def test_recover_skips_foreign_merge_on_top(spark, two_tables):
    """If a FOREIGN merge landed on a table after the crash, its history
    version no longer matches the journal's record — recovery must NOT
    roll back work it does not own."""
    root, t1, t2 = two_tables
    r1 = merge_into(
        spark, t1, _chg(spark, [(4, 400.0, "a", False)]),
        keys=["k"], partition_col="p", keep_history=True,
    )
    merge_into(
        spark, t1, _chg(spark, [(8, 800.0, "a", False)]),
        keys=["k"], partition_col="p", keep_history=True,
    )
    st = _state(spark, t1)
    with open(os.path.join(root, JOURNAL), "w") as f:
        json.dump(
            {
                "ops": [t1],
                "completed": [{"path": t1, "version": r1["version"]}],
                "in_flight": None,
                "committed": False,
            },
            f,
        )
    out = recover_merge_transaction(root)
    assert out["rolled_back"] == []
    assert _state(spark, t1) == st


def test_snapshot_read_post_pre_and_stability_under_later_merges(
    spark, two_tables
):
    """read_transaction_snapshot (round 13): post-snapshot shows every
    leg as committed by the txn; pre-snapshot shows every leg's state
    just before; and BOTH stay stable after a later foreign merge lands
    on one of the tables (the view is pinned to retained versions, not
    the live dirs)."""
    from pulsar_cdc_experiment_spark.plans.txn import (
        read_transaction_snapshot,
    )

    root, t1, t2 = two_tables
    pre1, pre2 = _state(spark, t1), _state(spark, t2)
    out = merge_transaction(
        spark, root,
        [
            _op(t1, _chg(spark, [(4, 400.0, "a", False)])),
            _op(t2, _chg(spark, [(5, 0.0, "b", True)])),
        ],
    )
    post1, post2 = _state(spark, t1), _state(spark, t2)

    def snap_state(df):
        return {(r["k"], r["v"], r["p"]) for r in df.collect()}

    snap = read_transaction_snapshot(spark, root)
    assert snap_state(snap[t1]) == post1
    assert snap_state(snap[t2]) == post2
    snap_pre = read_transaction_snapshot(
        spark, root, txn_seq=out["txn_seq"], at="pre"
    )
    assert snap_state(snap_pre[t1]) == pre1
    assert snap_state(snap_pre[t2]) == pre2

    # later foreign merge on t1 must not leak into either boundary
    merge_into(
        spark, t1, _chg(spark, [(6, 666.0, "a", False)]),
        keys=["k"], partition_col="p", keep_history=True,
    )
    snap2 = read_transaction_snapshot(
        spark, root, txn_seq=out["txn_seq"], at="post"
    )
    assert snap_state(snap2[t1]) == post1, "post view drifted"
    assert (6, 666.0, "a") not in snap_state(snap2[t1])

    with pytest.raises(ValueError, match="not in committed log"):
        read_transaction_snapshot(spark, root, txn_seq=99)
    with pytest.raises(ValueError, match="pre.*post|'pre' or 'post'"):
        read_transaction_snapshot(spark, root, at="live")


def test_snapshot_never_mixes_between_crashed_legs(spark, two_tables):
    """The isolation gap the module used to document: leg 1 applied,
    crash before leg 2. A plain reader sees the mix; the default
    snapshot view serves BOTH tables at their pre-txn boundary — t1
    rewound one version, t2 as it stands — never one of each."""
    from pulsar_cdc_experiment_spark.plans.txn import (
        read_transaction_snapshot,
    )

    root, t1, t2 = two_tables
    s1, s2 = _state(spark, t1), _state(spark, t2)
    rep = merge_into(
        spark, t1, _chg(spark, [(4, 400.0, "a", False)]),
        keys=["k"], partition_col="p", keep_history=True,
    )
    assert _state(spark, t1) != s1  # plain reader sees the mix
    with open(os.path.join(root, JOURNAL), "w") as f:
        json.dump(
            {
                "txn_seq": 1,
                "ops": [t1, t2],
                "completed": [{"path": t1, "version": rep["version"]}],
                "in_flight": {"path": t2, "version": 1},
                "committed": False,
            },
            f,
        )

    def snap_state(df):
        return {(r["k"], r["v"], r["p"]) for r in df.collect()}

    snap = read_transaction_snapshot(spark, root)
    assert snap_state(snap[t1]) == s1, "t1 not rewound to pre-txn"
    assert snap_state(snap[t2]) == s2


def test_commit_crash_between_mark_and_removal_finishes_log(
    spark, two_tables
):
    """Crash window between the journal's commit mark and its removal:
    recovery must FINISH the commit — append the txn to the committed
    log (idempotently) — so the snapshot read still finds it."""
    from pulsar_cdc_experiment_spark.plans.txn import (
        committed_transactions,
        read_transaction_snapshot,
    )

    root, t1, t2 = two_tables
    rep = merge_into(
        spark, t1, _chg(spark, [(4, 400.0, "a", False)]),
        keys=["k"], partition_col="p", keep_history=True,
    )
    after = _state(spark, t1)
    with open(os.path.join(root, JOURNAL), "w") as f:
        json.dump(
            {
                "txn_seq": 1,
                "ops": [t1],
                "completed": [{"path": t1, "version": rep["version"]}],
                "in_flight": None,
                "committed": True,
            },
            f,
        )
    out = recover_merge_transaction(root)
    assert out == {"rolled_back": [], "committed": True}
    log = committed_transactions(root)
    assert [t["txn_seq"] for t in log] == [1]
    snap = read_transaction_snapshot(spark, root)
    assert {
        (r["k"], r["v"], r["p"]) for r in snap[t1].collect()
    } == after
    # re-running recovery (or the same committed journal reappearing)
    # must not duplicate the log entry
    with open(os.path.join(root, JOURNAL), "w") as f:
        json.dump(
            {
                "txn_seq": 1,
                "ops": [t1],
                "completed": [{"path": t1, "version": rep["version"]}],
                "in_flight": None,
                "committed": True,
            },
            f,
        )
    recover_merge_transaction(root)
    assert [t["txn_seq"] for t in committed_transactions(root)] == [1]


def test_merge_transaction_single_writer_per_txn_root(spark, two_tables):
    """Round-13 advice: the journal and committed-txn log are
    read-modify-write files — a second saga on the same txn_root while
    one is in flight must fail LOUD (maintenance-lock pattern), not
    lose a committed entry or duplicate a txn_seq."""
    from pulsar_cdc_experiment_spark.plans.layout import maintenance_lock
    from pulsar_cdc_experiment_spark.plans.txn import committed_transactions

    root, t1, _t2 = two_tables
    with maintenance_lock(root):
        with pytest.raises(RuntimeError, match="maintenance lock"):
            merge_transaction(
                spark,
                root,
                [
                    {
                        "path": t1,
                        "source": _chg(spark, [(4, 400.0, "a", False)]),
                        "keys": ["k"],
                        "partition_col": "p",
                    }
                ],
            )
    # lock released: the same saga now commits, with no duplicate or
    # lost sequence
    out = merge_transaction(
        spark,
        root,
        [
            {
                "path": t1,
                "source": _chg(spark, [(4, 400.0, "a", False)]),
                "keys": ["k"],
                "partition_col": "p",
            }
        ],
    )
    assert out["n_legs"] == 1
    seqs = [t["txn_seq"] for t in committed_transactions(root)]
    assert seqs == sorted(set(seqs))


# --- heterogeneous sagas (round 15): CoW + MoR legs in ONE transaction ---


@pytest.fixture()
def mixed_tables(spark):
    from pulsar_cdc_experiment_spark.plans.mor import init_mor

    root = tempfile.mkdtemp(prefix="txn_mixed_")
    cow = _mk(spark, root, "cow")
    mor = os.path.join(root, "mor")
    rows = [(k, float(k), "a" if k % 2 == 0 else "b") for k in range(20)]
    init_mor(
        spark, mor,
        spark.createDataFrame(rows, "k bigint, v double, p string"),
        keys=["k"], partition_col="p",
    )
    yield root, cow, mor
    shutil.rmtree(root, ignore_errors=True)


def _mor_state(spark, path, as_of=None):
    from pulsar_cdc_experiment_spark.plans.mor import read_mor

    return {
        (r["k"], r["v"], r["p"])
        for r in read_mor(spark, path, as_of).collect()
    }


def test_mixed_txn_happy_path(spark, mixed_tables):
    """One saga spanning a copy-on-write leg and a merge-on-read leg:
    both apply, each through its own strategy's primitives — the CoW
    leg gets a history version, the MoR leg a published sequence."""
    from pulsar_cdc_experiment_spark.plans.mor import mor_history
    from pulsar_cdc_experiment_spark.plans.txn import committed_transactions

    root, cow, mor = mixed_tables
    s_cow, s_mor = _state(spark, cow), _mor_state(spark, mor)
    out = merge_transaction(
        spark, root,
        [
            _op(cow, _chg(spark, [(4, 400.0, "a", False)])),
            # MoR op: keys/partition pinned in the manifest — path+source only
            {"path": mor, "source": _chg(spark, [(5, 0.0, "b", True),
                                                 (100, 1.0, "a", False)])},
        ],
    )
    assert out["n_legs"] == 2
    assert not os.path.exists(os.path.join(root, JOURNAL))
    assert _state(spark, cow) == (s_cow - {(4, 4.0, "a")}) | {(4, 400.0, "a")}
    assert _mor_state(spark, mor) == (
        s_mor - {(5, 5.0, "b")}
    ) | {(100, 1.0, "a")}
    assert [m["version"] for m in merge_history(cow)] == [1]
    assert [s["seq"] for s in mor_history(mor)] == [1]
    legs = committed_transactions(root)[-1]["legs"]
    assert {(l["path"], l["version"]) for l in legs} == {(cow, 1), (mor, 1)}


def test_mixed_txn_rejects_cow_kwargs_on_mor_leg(spark, mixed_tables):
    root, cow, mor = mixed_tables
    with pytest.raises(ValueError, match="pinned in its manifest"):
        merge_transaction(
            spark, root,
            [_op(mor, _chg(spark, [(4, 400.0, "a", False)]))],
        )


def test_mixed_txn_failed_cow_leg_compensates_mor_leg(spark, mixed_tables):
    """MoR leg 1 lands (sidecar + delta + manifest publish), CoW leg 2
    raises: compensation must unpublish the MoR sequence — state byte
    identical, sequence gone, files swept."""
    from pulsar_cdc_experiment_spark.plans.mor import mor_history

    root, cow, mor = mixed_tables
    s_cow, s_mor = _state(spark, cow), _mor_state(spark, mor)
    bogus = spark.createDataFrame(
        [(1, "a", False)], "wrong bigint, p string, is_delete boolean"
    )
    with pytest.raises(Exception):
        merge_transaction(
            spark, root,
            [
                {"path": mor,
                 "source": _chg(spark, [(4, 400.0, "a", False)])},
                _op(cow, bogus),
            ],
        )
    assert not os.path.exists(os.path.join(root, JOURNAL))
    assert _mor_state(spark, mor) == s_mor
    assert mor_history(mor) == []
    assert _state(spark, cow) == s_cow
    # and the table keeps working: a later merge re-claims seq 1
    merge_transaction(
        spark, root,
        [{"path": mor, "source": _chg(spark, [(6, 600.0, "a", False)])}],
    )
    assert (6, 600.0, "a") in _mor_state(spark, mor)
    assert [s["seq"] for s in mor_history(mor)] == [1]


def test_mixed_recovery_inflight_mor_leg_landed(spark, mixed_tables):
    """Crash between the MoR merge landing and the journal recording it
    completed: the expected-sequence guard identifies the landed leg
    and rolls it back alongside the completed CoW leg."""
    from pulsar_cdc_experiment_spark.plans.mor import merge_into_mor

    root, cow, mor = mixed_tables
    s_cow, s_mor = _state(spark, cow), _mor_state(spark, mor)
    r1 = merge_into(
        spark, cow, _chg(spark, [(4, 400.0, "a", False)]),
        keys=["k"], partition_col="p", keep_history=True,
    )
    r2 = merge_into_mor(spark, mor, _chg(spark, [(5, 0.0, "b", True)]))
    with open(os.path.join(root, JOURNAL), "w") as f:
        json.dump(
            {
                "ops": [cow, mor],
                "completed": [{"path": cow, "version": r1["version"]}],
                "in_flight": {"path": mor, "version": r2["seq"]},
                "committed": False,
            },
            f,
        )
    out = recover_merge_transaction(root)
    assert sorted(out["rolled_back"]) == sorted([cow, mor])
    assert _state(spark, cow) == s_cow
    assert _mor_state(spark, mor) == s_mor


def test_mixed_snapshot_read_pre_post_and_inflight(spark, mixed_tables):
    """Snapshot reads across a mixed txn: post serves both strategies at
    the committed boundary, pre at the boundary before, both STABLE
    under later merges; an in-flight journal serves every leg pre."""
    from pulsar_cdc_experiment_spark.plans.mor import merge_into_mor
    from pulsar_cdc_experiment_spark.plans.txn import (
        read_transaction_snapshot,
    )

    root, cow, mor = mixed_tables
    s_cow0, s_mor0 = _state(spark, cow), _mor_state(spark, mor)
    out = merge_transaction(
        spark, root,
        [
            _op(cow, _chg(spark, [(4, 400.0, "a", False)])),
            {"path": mor, "source": _chg(spark, [(5, 500.0, "b", False)])},
        ],
    )
    seq = out["txn_seq"]
    s_cow1, s_mor1 = _state(spark, cow), _mor_state(spark, mor)
    # later out-of-band merge on the MoR table must not move the snapshot
    merge_into_mor(spark, mor, _chg(spark, [(7, 0.0, "b", True)]))
    snap = read_transaction_snapshot(spark, root, seq, at="post")
    assert {
        (r["k"], r["v"], r["p"]) for r in snap[mor].collect()
    } == s_mor1
    assert {
        (r["k"], r["v"], r["p"]) for r in snap[cow].collect()
    } == s_cow1
    pre = read_transaction_snapshot(spark, root, seq, at="pre")
    assert {(r["k"], r["v"], r["p"]) for r in pre[mor].collect()} == s_mor0
    assert {(r["k"], r["v"], r["p"]) for r in pre[cow].collect()} == s_cow0
    # in-flight journal: every journaled leg serves PRE
    with open(os.path.join(root, JOURNAL), "w") as f:
        json.dump(
            {
                "ops": [cow, mor],
                "completed": [],
                "in_flight": None,
                "committed": False,
            },
            f,
        )
    try:
        live = read_transaction_snapshot(spark, root)
        got = {(r["k"], r["v"], r["p"]) for r in live[mor].collect()}
        # untouched-in-this-journal legs read latest (incl. the 7-delete)
        assert (7, 7.0, "b") not in got
    finally:
        os.remove(os.path.join(root, JOURNAL))


def test_rollback_last_mor_guards_and_schema_shrink(spark, mixed_tables):
    from pulsar_cdc_experiment_spark.plans.mor import (
        merge_into_mor,
        mor_history,
        read_mor,
        rollback_last_mor,
    )

    root, cow, mor = mixed_tables
    with pytest.raises(ValueError, match="nothing to roll back"):
        rollback_last_mor(mor)
    wide = spark.createDataFrame(
        [(4, 400.0, "a", "gold", False)],
        "k bigint, v double, p string, tier string, is_delete boolean",
    )
    merge_into_mor(spark, mor, wide, evolve_schema=True)
    assert read_mor(spark, mor).columns == ["k", "v", "p", "tier"]
    rep = rollback_last_mor(mor)
    assert rep == {"rolled_back_seq": 1}
    assert read_mor(spark, mor).columns == ["k", "v", "p"]
    assert mor_history(mor) == []
    assert (4, 4.0, "a") in _mor_state(spark, mor)
