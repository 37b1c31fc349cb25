"""plans/merge file-level scoping + version retention (rounds 10-12):

- file_scope: inside a touched partition, only files whose footer key
  range can hold a changeset key are rewritten; the rest survive
  byte-identical under their own names (hardlinked through the swap)
- keep_history / rollback_last_merge / vacuum_merge_history: the
  .merge_history keep-N retention + Delta-RESTORE-style undo
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest

from pulsar_cdc_experiment_spark.plans.merge import (
    merge_history,
    merge_into,
    partition_file_listing,
    rollback_last_merge,
    vacuum_merge_history,
)


def _mk_ranged_table(spark, root):
    """3 files per partition, each a TIGHT key range ([0,10), [10,20),
    [20,30)) — the layout a range/Z-order maintenance pass produces,
    where file scoping pays off."""
    for lo in (0, 10, 20):
        rows = [
            (k, float(k), "a" if k % 2 == 0 else "b")
            for k in range(lo, lo + 10)
        ]
        df = spark.createDataFrame(rows, "k bigint, v double, p string")
        df.coalesce(1).write.mode("append").partitionBy("p").parquet(root)


def _state(spark, root):
    return {
        (r["k"], r["v"], r["p"])
        for r in spark.read.parquet(root).collect()
    }


def _chg(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, v double, p string, is_delete boolean"
    )


def _files(root, pdir):
    return sorted(
        (f, os.path.getsize(os.path.join(root, pdir, f)))
        for f in os.listdir(os.path.join(root, pdir))
        if f.startswith("part-")
    )


def test_file_scope_rewrites_only_intersecting_files(spark):
    root = tempfile.mkdtemp(prefix="mscope1_")
    _mk_ranged_table(spark, root)
    before_a = _files(root, "p=a")
    assert len(before_a) == 3
    st0 = _state(spark, root)

    # k=4 lives in the [0,10) file of p=a only
    rep = merge_into(
        spark, root, _chg(spark, [(4, 400.0, "a", False)]),
        keys=["k"], partition_col="p", file_scope_min_mb=0,
    )
    assert rep["touched"] == ["a"]
    assert rep["files_rewritten"] == 1
    assert rep["files_kept"] == 2
    after_a = _files(root, "p=a")
    # the two non-intersecting files survive under their own names/bytes
    kept = set(before_a) & set(after_a)
    assert len(kept) == 2
    st = _state(spark, root)
    assert (4, 400.0, "a") in st
    assert st == (st0 - {(4, 4.0, "a")}) | {(4, 400.0, "a")}
    shutil.rmtree(root, ignore_errors=True)


def test_file_scope_pure_insert_misses_every_range(spark):
    """Insert keys outside every file's range: zero files rewritten, all
    kept, the new rows land in fresh files."""
    root = tempfile.mkdtemp(prefix="mscope2_")
    _mk_ranged_table(spark, root)
    before_a = _files(root, "p=a")
    rep = merge_into(
        spark, root, _chg(spark, [(1000, 1.0, "a", False)]),
        keys=["k"], partition_col="p", file_scope_min_mb=0,
    )
    assert rep["files_rewritten"] == 0
    assert rep["files_kept"] == 3
    after_a = _files(root, "p=a")
    assert set(before_a) <= set(after_a)
    assert (1000, 1.0, "a") in _state(spark, root)
    shutil.rmtree(root, ignore_errors=True)


def test_file_scope_delete_whole_file_keeps_rest(spark):
    """Deleting every key of ONE file leaves the partition holding the
    two kept files alone (the staged-dir-absent + kept-files branch)."""
    root = tempfile.mkdtemp(prefix="mscope3_")
    _mk_ranged_table(spark, root)
    # p=a holds even keys; [0,10) file of p=a = {0,2,4,6,8}
    dele = [(k, 0.0, "a", True) for k in (0, 2, 4, 6, 8)]
    rep = merge_into(
        spark, root, _chg(spark, dele), keys=["k"], partition_col="p", file_scope_min_mb=0
    )
    assert rep["touched"] == ["a"]
    assert rep["n_deleted"] == 5
    assert rep["files_kept"] == 2
    st = _state(spark, root)
    assert not any(k < 10 and p == "a" for k, _v, p in st)
    assert (10, 10.0, "a") in st and (28, 28.0, "a") in st
    shutil.rmtree(root, ignore_errors=True)


def test_file_scope_idempotent_and_drift_containment(spark):
    """Re-apply is a no-op under scoping (the updated copy's file now
    intersects); drift (a->b) still leaves no stale twin."""
    root = tempfile.mkdtemp(prefix="mscope4_")
    _mk_ranged_table(spark, root)
    chg = _chg(spark, [(4, 999.0, "b", False)])  # k=4 moves a -> b
    rep = merge_into(spark, root, chg, keys=["k"], partition_col="p", file_scope_min_mb=0)
    assert rep["touched"] == ["a", "b"]
    st1 = _state(spark, root)
    assert [t for t in st1 if t[0] == 4] == [(4, 999.0, "b")]
    merge_into(spark, root, chg, keys=["k"], partition_col="p", file_scope_min_mb=0)
    assert _state(spark, root) == st1
    shutil.rmtree(root, ignore_errors=True)


def test_file_scope_off_matches_on(spark):
    """Same changeset with scoping on vs off: identical final state."""
    roots = []
    states = []
    for scope in (True, False):
        root = tempfile.mkdtemp(prefix=f"mscope5{int(scope)}_")
        roots.append(root)
        _mk_ranged_table(spark, root)
        rep = merge_into(
            spark, root,
            _chg(spark, [(4, 7.0, "a", False), (15, 0.0, "b", True)]),
            keys=["k"], partition_col="p", file_scope=scope,
            file_scope_min_mb=0,
        )
        if scope:
            assert "files_rewritten" in rep
        else:
            assert "files_rewritten" not in rep
        states.append(_state(spark, root))
    assert states[0] == states[1]
    for r in roots:
        shutil.rmtree(r, ignore_errors=True)


# ---------------------------------------------------------------------------
# version retention / rollback / vacuum


def test_history_rollback_restores_pre_merge_state(spark):
    root = tempfile.mkdtemp(prefix="mhist1_")
    _mk_ranged_table(spark, root)
    st0 = _state(spark, root)
    listing0 = partition_file_listing(root, "p")

    dele = [(k, 0.0, "b", True) for k in range(30) if k % 2 == 1]
    chg = _chg(spark, [(4, 44.0, "a", False), (501, 5.0, "c", False)] + dele)
    rep = merge_into(
        spark, root, chg, keys=["k"], partition_col="p",
        keep_history=True,
    )
    rep = json.loads(json.dumps(rep))
    assert rep["version"] == 1
    assert rep["deleted_partitions"] == ["b"]  # fully tombstoned
    assert os.path.isdir(os.path.join(root, "p=c"))
    st1 = _state(spark, root)
    assert (4, 44.0, "a") in st1 and (501, 5.0, "c") in st1
    assert not any(p == "b" for _k, _v, p in st1)

    man = rollback_last_merge(root)
    assert man["version"] == 1
    assert _state(spark, root) == st0
    # byte-level: every partition back to its original file listing
    assert partition_file_listing(root, "p") == listing0
    # created partition p=c is gone, history consumed
    assert not os.path.exists(os.path.join(root, "p=c"))
    assert merge_history(root) == []
    shutil.rmtree(root, ignore_errors=True)


def test_history_chain_and_vacuum_keep_n(spark):
    root = tempfile.mkdtemp(prefix="mhist2_")
    _mk_ranged_table(spark, root)
    for i in range(3):
        merge_into(
            spark, root,
            _chg(spark, [(4, float(i), "a", False)]),
            keys=["k"], partition_col="p", keep_history=True,
        )
    vs = [m["version"] for m in merge_history(root)]
    assert vs == [1, 2, 3]
    dropped = vacuum_merge_history(root, keep_last=1)
    assert dropped == [1, 2]
    assert [m["version"] for m in merge_history(root)] == [3]
    # rollback still reaches the retained tail
    rollback_last_merge(root)
    st = _state(spark, root)
    assert (4, 1.0, "a") in st  # state after version 2
    with pytest.raises(ValueError, match="no retained merge history"):
        rollback_last_merge(root)
    shutil.rmtree(root, ignore_errors=True)


def test_rollback_crash_window_recovers(spark):
    """Kill the rollback between the live-discard and the aside-restore:
    the recovery sweep must finish the job (aside restored)."""
    root = tempfile.mkdtemp(prefix="mhist3_")
    _mk_ranged_table(spark, root)
    st0 = _state(spark, root)
    merge_into(
        spark, root, _chg(spark, [(4, 9.0, "a", False)]),
        keys=["k"], partition_col="p", keep_history=True,
    )
    # hand-simulate the crash: history copy moved to the aside name and
    # the merged live dir already discarded — exactly the window between
    # _discard_live and the final rename
    from pulsar_cdc_experiment_spark.plans.layout import (
        recover_partition_swaps,
    )
    from pulsar_cdc_experiment_spark.plans.merge import HISTORY

    vdir = os.path.join(root, HISTORY, "v000001")
    os.rename(
        os.path.join(vdir, "p=a"), os.path.join(root, ".merge_old_p=a")
    )
    shutil.rmtree(os.path.join(root, "p=a"))
    recover_partition_swaps(root)
    assert _state(spark, root) == st0
    shutil.rmtree(root, ignore_errors=True)


# --- read_version: time-travel READ over .merge_history ---------------------


def _tt_state(df):
    return {(r["k"], r["v"], r["p"]) for r in df.collect()}


def test_read_version_reconstructs_every_retained_state(spark):
    from pulsar_cdc_experiment_spark.plans.merge import read_version

    root = tempfile.mkdtemp(prefix="mtt1_")
    _mk_ranged_table(spark, root)
    snaps = {0: _state(spark, root)}
    # v1: update + drift; v2: delete a whole partition's rows via keys;
    # v3: pure insert creating a NEW partition value
    changes = [
        [(4, 400.0, "a", False), (5, 555.0, "a", False)],   # 5 drifts b->a
        [(k, 0.0, "b", True) for k in range(1, 30, 2)],      # delete all b
        [(100, 1.0, "c", False), (101, 2.0, "c", False)],    # create p=c
    ]
    for i, rows in enumerate(changes, start=1):
        rep = merge_into(
            spark, root, _chg(spark, rows), keys=["k"],
            partition_col="p", keep_history=True,
        )
        assert rep["version"] == i
        snaps[i] = _state(spark, root)
    for v, want in snaps.items():
        got = _tt_state(read_version(spark, root, v))
        assert got == want, f"as_of={v}"
    # deleted-partition coverage: v2 removed p=b entirely; as_of=1 must
    # resurrect it read-only while live stays without it
    assert {t for t in _tt_state(read_version(spark, root, 1)) if t[2] == "b"}
    assert not {t for t in _state(spark, root) if t[2] == "b"}
    shutil.rmtree(root, ignore_errors=True)


def test_read_version_rejects_future_and_vacuumed_gap(spark):
    from pulsar_cdc_experiment_spark.plans.merge import read_version

    root = tempfile.mkdtemp(prefix="mtt2_")
    _mk_ranged_table(spark, root)
    for rows in ([(4, 1.0, "a", False)], [(6, 2.0, "a", False)]):
        merge_into(
            spark, root, _chg(spark, rows), keys=["k"],
            partition_col="p", keep_history=True,
        )
    with pytest.raises(ValueError, match="newer than the latest"):
        read_version(spark, root, 9)
    live = _state(spark, root)
    assert _tt_state(read_version(spark, root, 2)) == live
    vacuum_merge_history(root, keep_last=1)  # drops v1 -> gap below v1
    assert _tt_state(read_version(spark, root, 1)) is not None  # still ok
    with pytest.raises(ValueError, match="history gap|no retained"):
        read_version(spark, root, 0)
    shutil.rmtree(root, ignore_errors=True)


def test_file_probe_plan_bucketed_no_nested_loop(spark):
    """_file_probe_plan (round-13): integer-keyed file stats take the
    bin-bucketed EQUI-join path — no BroadcastNestedLoopJoin anywhere in
    the probe plan (the round-12 review's 10M-keys × 10k-files
    10^11-comparison trap) — and the hit set is exactly the naive
    range-intersection answer. String-keyed stats keep the bounded
    fallback range join."""
    from pulsar_cdc_experiment_spark.plans.merge import _file_probe_plan

    # 40 files with tight, partially overlapping int ranges
    rows = [(f"p=a/f{i}", i * 10, i * 10 + 14) for i in range(40)]
    src = spark.createDataFrame(
        [(k,) for k in (5, 63, 199, 777, 2_000_000)], "k bigint"
    )
    plan_df = _file_probe_plan(spark, src, ["k"], rows)
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan, plan
    got = {r["__path"] for r in plan_df.collect()}
    want = {
        path for path, lo, hi in rows
        if any(lo <= k <= hi for k in (5, 63, 199, 777, 2_000_000))
    }
    assert got == want

    # degenerate domain (all files share one key value) — width floor
    one = [(f"f{i}", 7, 7) for i in range(3)]
    hit1 = {
        r["__path"]
        for r in _file_probe_plan(
            spark, spark.createDataFrame([(7,), (8,)], "k bigint"),
            ["k"], one,
        ).collect()
    }
    assert hit1 == {"f0", "f1", "f2"}

    # string key: falls back to the range join, same answer
    srows = [("fa", "a", "f"), ("fb", "g", "m"), ("fc", "n", "z")]
    ssrc = spark.createDataFrame([("c",), ("x",)], "k string")
    sgot = {
        r["__path"]
        for r in _file_probe_plan(spark, ssrc, ["k"], srows).collect()
    }
    assert sgot == {"fa", "fc"}


def test_file_probe_composite_key_bins_on_first_int_column(spark):
    """Composite keys: the bin column is the FIRST key with integer
    stats; the exact AND-of-ranges post-filter still applies to every
    key column, so a file matching on k but not on k2 is NOT hit."""
    from pulsar_cdc_experiment_spark.plans.merge import _file_probe_plan

    rows = [
        ("f0", 0, 9, 0, 4),      # k in [0,9], k2 in [0,4]
        ("f1", 0, 9, 5, 9),      # k in [0,9], k2 in [5,9]
        ("f2", 10, 19, 0, 9),
    ]
    src = spark.createDataFrame([(3, 7), (12, 2)], "k bigint, k2 bigint")
    got = {
        r["__path"]
        for r in _file_probe_plan(spark, src, ["k", "k2"], rows).collect()
    }
    assert got == {"f1", "f2"}


def test_purge_keys_erases_live_history_and_feed(spark):
    """purge_keys (round-13 erasure verb): after purging, the key is
    gone from the LIVE table, from EVERY read_version reconstruction,
    and from the change feed — while every other row survives everywhere
    and untouched history leaves stay byte-identical."""
    from pulsar_cdc_experiment_spark.plans.merge import (
        change_feed,
        purge_keys,
        read_version,
    )

    root = tempfile.mkdtemp(prefix="purge_t1_")
    rows = [(k, float(k), "a" if k % 2 == 0 else "b") for k in range(20)]
    spark.createDataFrame(rows, "k bigint, v double, p string").coalesce(
        1
    ).write.mode("overwrite").partitionBy("p").parquet(root)
    # v1 updates k=4 (partition a) so history retains a's pre-state
    chg = spark.createDataFrame(
        [(4, 400.0, "a", False)],
        "k bigint, v double, p string, is_delete boolean",
    )
    merge_into(
        spark, root, chg, keys=["k"], partition_col="p",
        keep_history=True,
    )
    key_rows = spark.createDataFrame([(4,), (7,)], "k bigint")
    rep = purge_keys(
        spark, root, key_rows, keys=["k"], partition_col="p"
    )
    assert rep["live_deleted"] == 2
    assert rep["history_rows_purged"] >= 1  # k=4's pre-image in v1
    assert rep["versions_scrubbed"] == [1]

    live = {r["k"] for r in spark.read.parquet(root).collect()}
    assert 4 not in live and 7 not in live and 0 in live and 5 in live

    for as_of in (0, 1):
        snap = {
            r["k"] for r in read_version(spark, root, as_of).collect()
        }
        assert 4 not in snap and 7 not in snap, (as_of, sorted(snap))
        assert 0 in snap and 5 in snap

    feed = change_feed(spark, root, 0, 1)
    assert feed.filter("k IN (4, 7)").count() == 0

    # idempotent re-run: nothing left to do
    rep2 = purge_keys(
        spark, root, key_rows, keys=["k"], partition_col="p"
    )
    assert rep2 == {
        "live_deleted": 0,
        "history_rows_purged": 0,
        "versions_scrubbed": [],
    }
    shutil.rmtree(root, ignore_errors=True)


def test_read_version_converges_crashed_purge(spark):
    """Round-13 advice (medium): a crash between purge's two renames
    leaves a version leaf MISSING with a ``.purge_old_`` sibling. A
    plain ``read_version`` — no purge re-run, no explicit recover — must
    converge the window and serve the correct historical rows instead of
    silently skipping the leaf and falling back to a newer copy."""
    from pulsar_cdc_experiment_spark.plans.merge import (
        _PURGE_OLD,
        read_version,
    )

    root = tempfile.mkdtemp(prefix="purge_read_")
    rows = [(k, float(k), "a") for k in range(10)]
    spark.createDataFrame(rows, "k bigint, v double, p string").coalesce(
        1
    ).write.mode("overwrite").partitionBy("p").parquet(root)
    merge_into(
        spark, root,
        spark.createDataFrame(
            [(1, 100.0, "a", False)],
            "k bigint, v double, p string, is_delete boolean",
        ),
        keys=["k"], partition_col="p", keep_history=True,
    )
    import urllib.parse

    vdir = os.path.join(root, ".merge_history", "v000001")
    flat = urllib.parse.quote("p=a", safe="")
    # crash window: saved leaf renamed away, swap never completed
    os.rename(
        os.path.join(vdir, "p=a"), os.path.join(vdir, _PURGE_OLD + flat)
    )
    # read_version alone must restore the leaf and serve v0's rows —
    # in particular k=1 at its PRE-merge value, which the live fallback
    # would get wrong
    got = {(r["k"], r["v"]) for r in read_version(spark, root, 0).collect()}
    assert (1, 1.0) in got and len(got) == 10
    assert os.path.isdir(os.path.join(vdir, "p=a"))
    shutil.rmtree(root, ignore_errors=True)


def _purge_jobs(spark, n_leaves: int, tag: str) -> int:
    """Zero-hit purge job count over a 2-version, ``n_leaves``-leaf
    table (helper for the O(versions)-not-O(versions×leaves) test)."""
    from pulsar_cdc_experiment_spark.plans.merge import purge_keys

    root = tempfile.mkdtemp(prefix=f"purgejobs_{tag}_")
    leaves = [f"l{i:02d}" for i in range(n_leaves)]
    rows = [(k, float(k), leaves[k % n_leaves]) for k in range(10 * n_leaves)]
    spark.createDataFrame(
        rows, "k bigint, v double, p string"
    ).coalesce(1).write.mode("overwrite").partitionBy("p").parquet(root)
    for v in range(2):
        chg = spark.createDataFrame(
            [(k, 1000.0 + v, leaves[k % n_leaves], False)
             for k in range(n_leaves)],
            "k bigint, v double, p string, is_delete boolean",
        )
        merge_into(
            spark, root, chg, keys=["k"], partition_col="p",
            keep_history=True,
        )
    tracker = spark.sparkContext.statusTracker()
    spark.sparkContext.setJobGroup(f"purge_jobs_{tag}", "audit")
    rep = purge_keys(
        spark, root,
        spark.createDataFrame([(999_999,)], "k bigint"),
        keys=["k"], partition_col="p",
    )
    spark.sparkContext.setJobGroup(f"purge_jobs_{tag}_done", "")
    assert rep["versions_scrubbed"] == []
    n = len(tracker.getJobIdsForGroup(f"purge_jobs_{tag}"))
    shutil.rmtree(root, ignore_errors=True)
    return n


def test_purge_hit_detection_jobs_scale_with_versions_not_leaves(spark):
    """Round-13 verdict #2: hit detection is ONE job per version — the
    per-(version, leaf) count() loop it replaced paid ~leaf-count extra
    jobs per version (measured 51 vs 21 at 3 versions × 6 leaves).
    Doubling the leaf count at fixed version count must not add jobs
    beyond scheduler noise."""
    jobs_small = _purge_jobs(spark, 4, "small")
    jobs_big = _purge_jobs(spark, 8, "big")
    # old behavior: +2 versions × +4 leaves ≈ +8 jobs; new: identical
    # modulo at most a stage-retry flake
    assert jobs_big <= jobs_small + 2, (jobs_small, jobs_big)


def test_purge_recover_converges_both_crash_windows(spark):
    """_purge_recover: a staged dir is discarded; an old-copy whose
    target leaf is missing is restored (crash between the two renames);
    an old-copy whose target exists is trash."""
    from pulsar_cdc_experiment_spark.plans.merge import (
        _PURGE_OLD,
        _PURGE_STAGE,
        _purge_recover,
        read_version,
    )

    root = tempfile.mkdtemp(prefix="purge_t2_")
    rows = [(k, float(k), "a") for k in range(10)]
    spark.createDataFrame(rows, "k bigint, v double, p string").coalesce(
        1
    ).write.mode("overwrite").partitionBy("p").parquet(root)
    merge_into(
        spark, root,
        spark.createDataFrame(
            [(1, 100.0, "a", False)],
            "k bigint, v double, p string, is_delete boolean",
        ),
        keys=["k"], partition_col="p", keep_history=True,
    )
    import urllib.parse

    vdir = os.path.join(root, ".merge_history", "v000001")
    flat = urllib.parse.quote("p=a", safe="")

    # window 1: crash after rename(saved -> old): leaf missing
    os.rename(os.path.join(vdir, "p=a"), os.path.join(vdir, _PURGE_OLD + flat))
    _purge_recover(vdir)
    assert os.path.isdir(os.path.join(vdir, "p=a"))
    assert read_version(spark, root, 0).count() == 10

    # window 2: leftover stage + leftover old with target present
    os.makedirs(os.path.join(vdir, _PURGE_STAGE + flat))
    os.makedirs(os.path.join(vdir, _PURGE_OLD + flat))
    _purge_recover(vdir)
    assert not os.path.exists(os.path.join(vdir, _PURGE_STAGE + flat))
    assert not os.path.exists(os.path.join(vdir, _PURGE_OLD + flat))
    assert read_version(spark, root, 0).count() == 10
    shutil.rmtree(root, ignore_errors=True)
