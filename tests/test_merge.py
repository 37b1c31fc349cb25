"""plans/merge.merge_into — the guarantees the oracle cannot see:
untouched-partition byte identity, partition-drift containment, re-apply
idempotence, empty-partition removal, crash recovery, and the fail-loud
preconditions (duplicate changeset keys, null partition values)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pulsar_cdc_experiment_spark.plans.merge import (
    ASIDE,
    merge_into,
    partition_file_listing,
)


def _mk_table(spark, root, rows):
    df = spark.createDataFrame(
        rows, "k bigint, v double, p string"
    )
    df.repartition(2).write.mode("overwrite").partitionBy("p").parquet(root)


def _state(spark, root):
    return {
        (r["k"], r["v"], r["p"])
        for r in spark.read.parquet(root).collect()
    }


def _base_rows():
    return [
        (i, float(i), "a" if i % 3 == 0 else ("b" if i % 3 == 1 else "c"))
        for i in range(30)
    ]


def _chg(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, v double, p string, is_delete boolean"
    )


def test_merge_untouched_partitions_byte_identical_and_values(spark):
    root = tempfile.mkdtemp(prefix="merge_t1_")
    _mk_table(spark, root, _base_rows())
    before = partition_file_listing(root, "p")

    # update two 'a' rows, insert one new 'a' row, delete one 'a' row;
    # 'b' and 'c' never mentioned
    chg = _chg(
        spark,
        [
            (0, 100.0, "a", False),
            (3, 103.0, "a", False),
            (900, 900.0, "a", False),
            (6, 0.0, "a", True),
        ],
    )
    rep = merge_into(spark, root, chg, keys=["k"], partition_col="p")
    assert rep["touched"] == ["a"]
    assert sorted(rep["untouched"]) == ["b", "c"]
    assert rep["n_updated"] == 2
    assert rep["n_deleted"] == 1
    assert rep["n_inserted"] == 1
    assert rep["n_noop_deletes"] == 0

    after = partition_file_listing(root, "p")
    assert before["p=b"] == after["p=b"]
    assert before["p=c"] == after["p=c"]

    st = _state(spark, root)
    assert (0, 100.0, "a") in st and (3, 103.0, "a") in st
    assert (900, 900.0, "a") in st
    assert not any(k == 6 for k, _, _ in st)
    # untouched rows intact
    expect_rest = {
        (i, float(i), "b" if i % 3 == 1 else "c")
        for i in range(30)
        if i % 3 != 0
    }
    assert expect_rest <= st


def test_merge_partition_drift_leaves_no_stale_twin(spark):
    root = tempfile.mkdtemp(prefix="merge_t2_")
    _mk_table(spark, root, _base_rows())
    # move k=9 (lives in 'a') to partition 'b' with a new value
    chg = _chg(spark, [(9, 999.0, "b", False)])
    rep = merge_into(spark, root, chg, keys=["k"], partition_col="p")
    # both the destination AND the old home were rewritten
    assert rep["touched"] == ["a", "b"]
    st = _state(spark, root)
    copies = [(k, v, p) for (k, v, p) in st if k == 9]
    assert copies == [(9, 999.0, "b")]


def test_merge_reapply_is_idempotent(spark):
    root = tempfile.mkdtemp(prefix="merge_t3_")
    _mk_table(spark, root, _base_rows())
    chg = _chg(
        spark,
        [(0, 50.0, "a", False), (1, 51.0, "b", False), (2, 0.0, "c", True),
         (700, 7.0, "a", False)],
    )
    merge_into(spark, root, chg, keys=["k"], partition_col="p")
    st1 = _state(spark, root)
    rep2 = merge_into(spark, root, chg, keys=["k"], partition_col="p")
    assert _state(spark, root) == st1
    # second apply: the insert's key now matches (counted as update),
    # the delete is now unmatched (no-op)
    assert rep2["n_inserted"] == 0
    assert rep2["n_updated"] == 3
    assert rep2["n_noop_deletes"] == 1


def test_merge_can_empty_a_partition(spark):
    root = tempfile.mkdtemp(prefix="merge_t4_")
    _mk_table(
        spark, root, [(1, 1.0, "solo"), (2, 2.0, "rest"), (3, 3.0, "rest")]
    )
    chg = _chg(spark, [(1, 0.0, "solo", True)])
    rep = merge_into(spark, root, chg, keys=["k"], partition_col="p")
    assert rep["deleted_partitions"] == ["solo"]
    assert not os.path.exists(os.path.join(root, "p=solo"))
    assert _state(spark, root) == {(2, 2.0, "rest"), (3, 3.0, "rest")}


def test_merge_noop_delete_does_not_touch_its_partition(spark):
    root = tempfile.mkdtemp(prefix="merge_t5_")
    _mk_table(spark, root, _base_rows())
    before = partition_file_listing(root, "p")
    chg = _chg(spark, [(12345, 0.0, "b", True)])  # absent key
    rep = merge_into(spark, root, chg, keys=["k"], partition_col="p")
    assert rep["touched"] == [] and rep["n_noop_deletes"] == 1
    assert partition_file_listing(root, "p") == before


def test_merge_crash_recovery_restores_lost_partition(spark):
    root = tempfile.mkdtemp(prefix="merge_t6_")
    _mk_table(spark, root, _base_rows())
    st0 = _state(spark, root)
    # simulate the crash window between the two renames: live dir moved
    # aside, staged dir never renamed in
    os.rename(os.path.join(root, "p=b"), os.path.join(root, ASIDE + "p=b"))
    assert "p=b" not in partition_file_listing(root, "p")
    # next merge run recovers it before doing anything else
    rep = merge_into(
        spark, root, _chg(spark, [(0, 42.0, "a", False)]),
        keys=["k"], partition_col="p",
    )
    assert rep["touched"] == ["a"]
    st = _state(spark, root)
    assert {(k, v, p) for (k, v, p) in st if p == "b"} == {
        (k, v, p) for (k, v, p) in st0 if p == "b"
    }
    assert (0, 42.0, "a") in st


def test_merge_crash_window_keeps_partition_deleted(spark):
    """Delete path of the crash-recovery discipline (round-10 advice #1):
    an intentionally-emptied partition is tombstoned with the STAGING
    prefix, so a crash between the tombstone rename and the rmtree must
    leave the partition DELETED after recovery — the old ASIDE rename
    made recovery resurrect every deleted row."""
    root = tempfile.mkdtemp(prefix="merge_t11_")
    _mk_table(
        spark, root, [(1, 1.0, "solo"), (2, 2.0, "rest"), (3, 3.0, "rest")]
    )
    # run the real delete so the code path itself is exercised once
    merge_into(
        spark, root, _chg(spark, [(1, 0.0, "solo", True)]),
        keys=["k"], partition_col="p",
    )
    assert _state(spark, root) == {(2, 2.0, "rest"), (3, 3.0, "rest")}
    # now simulate the crash window: rebuild, rename the live dir to the
    # tombstone name exactly as the publish does, but "crash" before the
    # rmtree — the next merge's recovery sweep must DISCARD it
    shutil.rmtree(root)
    _mk_table(
        spark, root, [(1, 1.0, "solo"), (2, 2.0, "rest"), (3, 3.0, "rest")]
    )
    from pulsar_cdc_experiment_spark.plans.merge import STAGING

    os.rename(
        os.path.join(root, "p=solo"),
        os.path.join(root, STAGING + "deleted_p=solo"),
    )
    rep = merge_into(
        spark, root, _chg(spark, [(2, 22.0, "rest", False)]),
        keys=["k"], partition_col="p",
    )
    assert rep["touched"] == ["rest"]
    assert not os.path.exists(os.path.join(root, "p=solo"))
    assert _state(spark, root) == {(2, 22.0, "rest"), (3, 3.0, "rest")}
    shutil.rmtree(root, ignore_errors=True)


def test_merge_fails_loud_under_concurrent_maintenance(spark):
    """merge_into runs under maintenance_lock (round-10 advice #2): with
    another maintainer holding the table root's lock, the merge must
    refuse — and must leave the table untouched."""
    root = tempfile.mkdtemp(prefix="merge_t12_")
    _mk_table(spark, root, _base_rows())
    snapshot = _state(spark, root)
    lock_path = os.path.join(root, ".maintenance_lock")
    with open(lock_path, "w") as f:
        f.write(str(os.getpid()))  # a live "other" holder
    with pytest.raises(RuntimeError, match="held by live pid"):
        merge_into(
            spark, root, _chg(spark, [(0, 1.0, "a", False)]),
            keys=["k"], partition_col="p",
        )
    os.unlink(lock_path)
    assert _state(spark, root) == snapshot
    # lock is released after a successful merge
    merge_into(
        spark, root, _chg(spark, [(0, 1.0, "a", False)]),
        keys=["k"], partition_col="p",
    )
    assert not os.path.exists(lock_path)
    shutil.rmtree(root, ignore_errors=True)


def test_merge_rejects_duplicate_keys_and_null_partitions(spark):
    root = tempfile.mkdtemp(prefix="merge_t7_")
    _mk_table(spark, root, _base_rows())
    snapshot = _state(spark, root)
    with pytest.raises(ValueError, match="unique changeset"):
        merge_into(
            spark, root,
            _chg(spark, [(0, 1.0, "a", False), (0, 2.0, "a", False)]),
            keys=["k"], partition_col="p",
        )
    with pytest.raises(ValueError, match="NULL or empty"):
        merge_into(
            spark, root, _chg(spark, [(0, 1.0, None, False)]),
            keys=["k"], partition_col="p",
        )
    # failed merges left the table untouched
    assert _state(spark, root) == snapshot
    shutil.rmtree(root, ignore_errors=True)


def test_merge_fixture_report_matches_changeset_definition(spark, sf_dir):
    """The registered query's fixture report agrees with the closed-form
    changeset the oracle uses."""
    import json

    from pulsar_cdc_experiment_spark.queries.merge_q import (
        merge_orders_fixture,
    )
    from pulsar_cdc_experiment_spark.sources.tables import table

    root = merge_orders_fixture(spark, sf_dir)
    with open(os.path.join(root, "report.json")) as f:
        rep = json.load(f)
    assert rep["touched"] == ["1-URGENT", "3-MEDIUM"]
    assert "4-NOT SPECIFIED" in rep["untouched"]

    o = table(spark, sf_dir, "orders")
    key, pri = F.col("o_orderkey"), F.col("o_orderpriority")
    n_upd = o.filter(
        (key % 50 == 3) & pri.isin("1-URGENT", "3-MEDIUM")
    ).count() + o.filter((key % 50 == 19) & (pri == "3-MEDIUM")).count()
    n_del = o.filter(
        (key % 50 == 7) & pri.isin("1-URGENT", "3-MEDIUM")
    ).count()
    n_ins = o.filter((key % 50 == 11) & (pri == "5-LOW")).count()
    n_noop = o.filter(
        (key % 50 == 13) & (pri == "4-NOT SPECIFIED")
    ).count()
    assert rep["n_updated"] == n_upd
    assert rep["n_deleted"] == n_del
    assert rep["n_inserted"] == n_ins
    assert rep["n_noop_deletes"] == n_noop


def test_cdc_merge_apply_exercises_every_clause(spark, sf_dir):
    """The CDC-apply capstone must be non-vacuous: the changeset really
    produced updates, deletes, AND inserts, and at least one update
    DRIFTED partitions (the user's latest event_type changed across the
    cutover) — otherwise the oracle match proves less than it claims."""
    import json

    from pulsar_cdc_experiment_spark.operators.materialize import (
        latest_by_key,
    )
    from pulsar_cdc_experiment_spark.queries.merge_q import (
        _T0,
        cdc_merge_fixture,
    )
    from pulsar_cdc_experiment_spark.sources.tables import table

    root = cdc_merge_fixture(spark, sf_dir)
    with open(os.path.join(root, "report.json")) as f:
        rep = json.load(f)
    assert rep["n_updated"] > 0
    assert rep["n_deleted"] > 0
    assert rep["n_inserted"] > 0

    # drift really happened: some user's latest pre-cutover type (the
    # base partition) differs from their latest post-cutover type
    ev = table(spark, sf_dir, "events")
    t0 = F.col("ts") < F.lit(_T0).cast("timestamp_ntz")
    base = (
        latest_by_key(
            ev.filter(t0 & (F.col("user_id") % 5 != 0)),
            ["user_id"], ["ts", "event_id"],
        )
        .filter(F.col("event_type") != "error")
        .select("user_id", F.col("event_type").alias("base_type"))
    )
    chg = latest_by_key(
        ev.filter(~t0), ["user_id"], ["ts", "event_id"]
    ).select("user_id", F.col("event_type").alias("chg_type"))
    drifted = (
        base.join(chg, "user_id")
        .filter(
            (F.col("chg_type") != "error")
            & (F.col("chg_type") != F.col("base_type"))
        )
        .count()
    )
    assert drifted > 0

    # and the served table holds exactly one row per surviving user
    st = spark.read.parquet(os.path.join(root, "state"))
    assert st.count() == st.select("user_id").distinct().count()


def test_merge_schema_evolution_widens_only_with_opt_in(spark):
    """(a) A changeset carrying an unknown column fails loud by default,
    (b) evolve_schema=True widens rewritten partitions (old surviving
    rows NULL in the new column, union-by-name convention), (c) the
    report names the evolution, (d) a SECOND merge against the evolved
    (mixed-width) table sees the union schema via footer merge."""
    root = tempfile.mkdtemp(prefix="merge_t8_")
    _mk_table(spark, root, _base_rows())

    chg = spark.createDataFrame(
        [(0, 100.0, "a", "gold", False)],
        "k bigint, v double, p string, tier string, is_delete boolean",
    )
    with pytest.raises(ValueError, match="evolve_schema"):
        merge_into(spark, root, chg, keys=["k"], partition_col="p")

    rep = merge_into(
        spark, root, chg, keys=["k"], partition_col="p",
        evolve_schema=True,
    )
    assert rep["schema_evolved"] == ["tier"]
    assert rep["touched"] == ["a"]

    evolved = spark.read.option("mergeSchema", "true").parquet(root)
    assert "tier" in evolved.columns
    rows = {(r["k"], r["tier"]) for r in evolved.filter("p = 'a'").collect()}
    assert (0, "gold") in rows
    # surviving old rows in the rewritten partition: tier NULL
    assert (3, None) in rows
    # untouched partitions were not rewritten (no tier column on disk
    # there; mergeSchema read presents NULL)
    assert evolved.filter("p = 'b' AND tier IS NOT NULL").count() == 0

    # (d) second merge: target schema is the footer union, so a
    # changeset with the evolved column is no longer "extra"
    chg2 = spark.createDataFrame(
        [(1, 51.0, "b", "silver", False)],
        "k bigint, v double, p string, tier string, is_delete boolean",
    )
    rep2 = merge_into(spark, root, chg2, keys=["k"], partition_col="p")
    assert rep2["schema_evolved"] == []
    after = spark.read.option("mergeSchema", "true").parquet(root)
    got = {(r["k"], r["tier"]) for r in after.filter("p = 'b'").collect()}
    assert (1, "silver") in got
    shutil.rmtree(root, ignore_errors=True)


def test_merge_rejects_hive_default_partition_both_sides(spark):
    """Round-9 review: ''-valued partition values land in
    __HIVE_DEFAULT_PARTITION__, whose dir name does not round-trip to
    the value — a naive merge would stage the row and then silently
    discard it (verified data loss). Both sides fail loud: a changeset
    carrying ''/NULL partition values, and a target already holding a
    hive default partition dir."""
    root = tempfile.mkdtemp(prefix="merge_t9_")
    _mk_table(spark, root, _base_rows())
    snapshot = _state(spark, root)
    with pytest.raises(ValueError, match="NULL or empty"):
        merge_into(
            spark, root, _chg(spark, [(900, 1.0, "", False)]),
            keys=["k"], partition_col="p",
        )
    assert _state(spark, root) == snapshot

    # target side: a pre-existing default-partition dir is refused
    # outright (its rows read back as NULL, so drift tracking for keys
    # living there would be blind)
    spark.createDataFrame([(777, 7.0, None)], "k bigint, v double, p string") \
        .write.mode("append").partitionBy("p").parquet(root)
    assert os.path.isdir(os.path.join(root, "p=__HIVE_DEFAULT_PARTITION__"))
    with pytest.raises(ValueError, match="default partition"):
        merge_into(
            spark, root, _chg(spark, [(0, 1.0, "a", False)]),
            keys=["k"], partition_col="p",
        )
    shutil.rmtree(root, ignore_errors=True)


def test_merge_recovers_other_operators_asides(spark):
    """The recovery sweep covers EVERY swap-operator's prefix family
    (round-9 review): a crashed optimize_partitions aside (.opt_old_)
    must be restored by merge_into's entry sweep — otherwise merge
    reads a table minus that partition, re-inserts its keys elsewhere,
    and a later optimize restore duplicates them."""
    root = tempfile.mkdtemp(prefix="merge_t10_")
    _mk_table(spark, root, _base_rows())
    st0 = _state(spark, root)
    os.rename(
        os.path.join(root, "p=c"), os.path.join(root, ".opt_old_p=c")
    )
    rep = merge_into(
        spark, root, _chg(spark, [(0, 42.0, "a", False)]),
        keys=["k"], partition_col="p",
    )
    assert rep["touched"] == ["a"]
    st = _state(spark, root)
    assert {t for t in st if t[2] == "c"} == {t for t in st0 if t[2] == "c"}
    shutil.rmtree(root, ignore_errors=True)
