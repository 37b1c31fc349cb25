"""Top-k materialized views (round 19, plans/mv_topk.py): creation,
rollup serving (coarser group sets from the stored union), incremental
maintenance under insert/delete churn (property-tested: maintained ==
refreshed for arbitrary change histories), the MoR sequence-clock loop,
and the lazy live serve with risky-delete recompute."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

ORDER = [("v", "desc"), ("k", "desc")]


def _rows_df(spark, rows):
    return spark.createDataFrame(rows, "g string, k bigint, v bigint")


def _exact_topk(rows, group_cols, k):
    """Pure-Python oracle: per-group top-k under (v desc, k desc)."""
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, kk, v in rows:
        key = tuple(g if c == "g" else None for c in group_cols)
        by_g[key].append((g, kk, v))
    out = []
    for grp_rows in by_g.values():
        grp_rows.sort(key=lambda r: (-r[2], -r[1]))
        out.extend(grp_rows[:k])
    return sorted(out)


def _stored(spark, mv_root, name):
    from pulsar_cdc_experiment_spark.plans.mv import mv_data_dir

    return sorted(
        tuple(r)
        for r in spark.read.parquet(mv_data_dir(mv_root, name))
        .select("g", "k", "v")
        .collect()
    )


def test_create_serve_and_rollup(spark):
    """Fresh serving: the finest set from the stored rows, a COARSER
    set (global top-k) by re-ranking the stored union, a bigger k and
    a different order fall back to the base."""
    from pulsar_cdc_experiment_spark.plans.mv_topk import (
        answer_topk,
        create_topk_mv,
    )

    base = tempfile.mkdtemp(prefix="tk_serve_")
    try:
        src_dir = os.path.join(base, "src")
        rows = [
            (["a", "b", "c"][i % 3], i, (i * 41) % 500) for i in range(90)
        ]
        _rows_df(spark, rows).write.parquet(src_dir)
        src = spark.read.parquet(src_dir)
        mv_root = os.path.join(base, "mvs")
        create_topk_mv(
            spark, mv_root, name="tk", source_path=src_dir, source=src,
            group_cols=["g"], order_by=ORDER, k=4,
            payload_cols=["k", "v"],
        )

        def serve(gc, k, order=ORDER):
            df, used = answer_topk(
                spark, mv_root, src, src_dir,
                group_cols=gc, order_by=order, k=k,
            )
            return sorted(
                tuple(r) for r in df.select("g", "k", "v").collect()
            ), used

        got, used = serve(["g"], 4)
        assert used == "tk" and got == _exact_topk(rows, ["g"], 4)
        # coarser: global top-2 re-ranked from the stored union
        got, used = serve([], 2)
        assert used == "tk" and got == _exact_topk(rows, [], 2)
        # k too big → base fallback, still exact
        got, used = serve(["g"], 9)
        assert used is None and got == _exact_topk(rows, ["g"], 9)
        # different order → base fallback
        got, used = serve(["g"], 2, order=[("v", "asc"), ("k", "asc")])
        assert used is None
        # stale source → base fallback
        _rows_df(spark, [("z", 10 ** 6, 10 ** 6)]).write.mode(
            "append"
        ).parquet(src_dir)
        got, used = serve(["g"], 4)
        assert used is None
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_create_topk_guards(spark):
    from pulsar_cdc_experiment_spark.plans.mv_topk import create_topk_mv

    base = tempfile.mkdtemp(prefix="tk_guard_")
    try:
        src_dir = os.path.join(base, "src")
        _rows_df(spark, [("a", 1, 1)]).write.parquet(src_dir)
        src = spark.read.parquet(src_dir)
        with pytest.raises(ValueError, match="k must be"):
            create_topk_mv(
                spark, os.path.join(base, "m1"), name="x",
                source_path=src_dir, source=src, group_cols=["g"],
                order_by=ORDER, k=0, payload_cols=["k", "v"],
            )
        with pytest.raises(ValueError, match="not stored"):
            create_topk_mv(
                spark, os.path.join(base, "m2"), name="x",
                source_path=src_dir, source=src, group_cols=["g"],
                order_by=[("missing", "desc")], k=1,
                payload_cols=["k", "v"],
            )
        with pytest.raises(ValueError, match="asc|desc"):
            create_topk_mv(
                spark, os.path.join(base, "m3"), name="x",
                source_path=src_dir, source=src, group_cols=["g"],
                order_by=[("v", "down")], k=1, payload_cols=["k", "v"],
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@settings(max_examples=6, deadline=None)
@given(
    history=st.lists(
        st.tuples(
            # inserts: fresh (group_idx, value) pairs
            st.lists(
                st.tuples(
                    st.integers(0, 2), st.integers(0, 99)
                ),
                max_size=4,
            ),
            # deletes: indices into the live key set
            st.lists(st.integers(0, 10 ** 6), max_size=3),
        ),
        min_size=1,
        max_size=3,
    )
)
def test_maintain_matches_refresh_under_churn(spark_global, history):
    """The MIN/MAX-IVM-style property, k-generalized: for ARBITRARY
    insert/delete histories (including deletes of stored top-k rows,
    boundary ties, groups shrinking below k, and groups emptying
    entirely), folding each change batch through maintain_topk_mv
    leaves the stored rows IDENTICAL to a from-scratch top-k of the
    final table."""
    from pulsar_cdc_experiment_spark.plans.mv_topk import (
        create_topk_mv,
        maintain_topk_mv,
    )

    spark = spark_global
    base = tempfile.mkdtemp(prefix="tk_prop_")
    try:
        src_dir = os.path.join(base, "src")
        os.makedirs(src_dir)  # fingerprinted source stand-in
        live = {
            i: (["a", "b", "c"][i % 3], i, (i * 17) % 50)
            for i in range(12)
        }
        next_key = 100
        mv_root = os.path.join(base, "mvs")
        create_topk_mv(
            spark, mv_root, name="tk", source_path=src_dir,
            source=_rows_df(spark, list(live.values())),
            group_cols=["g"], order_by=ORDER, k=3,
            payload_cols=["k", "v"],
        )
        for ins_spec, del_spec in history:
            changes = []
            for gi, v in ins_spec:
                row = (["a", "b", "c"][gi], next_key, v)
                live[next_key] = row
                next_key += 1
                changes.append((*row, 1))
            for di in del_spec:
                if not live:
                    break
                key = sorted(live)[di % len(live)]
                changes.append((*live.pop(key), -1))
            if not changes:
                continue
            maintain_topk_mv(
                spark, mv_root, "tk",
                spark.createDataFrame(
                    changes, "g string, k bigint, v bigint, __z int"
                ),
                base_new=_rows_df(
                    spark,
                    list(live.values()) or [("__none__", -1, -1)],
                ).filter(F.col("k") >= 0),
            )
            assert _stored(spark, mv_root, "tk") == _exact_topk(
                list(live.values()), ["g"], 3
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_mor_loop_and_live_serve(spark):
    """The sequence-clock loop: bind → merge (risky #1 delete + new
    top insert + upsert) → live serve exact at mode mv_delta →
    maintain folds → serve mv; a purge then poisons both (benign vs
    non-benign classification shared with the aggregate family)."""
    from pulsar_cdc_experiment_spark.plans.mor import (
        init_mor,
        merge_into_mor,
        purge_keys_mor,
        read_mor,
        rollback_last_mor,
    )
    from pulsar_cdc_experiment_spark.plans.mv import bind_mv_to_mor
    from pulsar_cdc_experiment_spark.plans.mv_topk import (
        _topk_of,
        answer_topk_live,
        maintain_topk_from_mor,
    )
    from pulsar_cdc_experiment_spark.plans.mv_topk import (
        create_topk_mv,
    )

    base = tempfile.mkdtemp(prefix="tk_mor_")
    try:
        root = os.path.join(base, "t")
        mv_root = os.path.join(base, "mvs")
        manifest = os.path.join(root, ".mor", "manifest.json")
        rows = [(k, ["a", "b"][k % 2], (k * 37) % 400) for k in range(120)]
        init_mor(
            spark, root,
            spark.createDataFrame(rows, "k bigint, g string, v bigint"),
            keys=["k"], partition_col="g",
        )
        src = read_mor(spark, root).select("g", "k", "v")
        create_topk_mv(
            spark, mv_root, name="tk", source_path=manifest, source=src,
            group_cols=["g"], order_by=ORDER, k=3,
            payload_cols=["k", "v"],
        )
        bind_mv_to_mor(mv_root, "tk", root)

        def project(df):
            cols = [F.col("g"), F.col("k"), F.col("v")]
            if "change_type" in df.columns:
                cols = [F.col("change_type")] + cols
            return df.select(*cols)

        def exact():
            return sorted(
                tuple(r)
                for r in _topk_of(
                    read_mor(spark, root).select("g", "k", "v"),
                    ["g"], [["v", "desc"], ["k", "desc"]], 3,
                ).select("g", "k", "v").collect()
            )

        def live():
            df, mode = answer_topk_live(
                spark, mv_root, "tk", project,
                group_cols=["g"], order_by=ORDER, k=3,
            )
            return sorted(
                tuple(r) for r in df.select("g", "k", "v").collect()
            ), mode

        got, mode = live()
        assert mode == "mv" and got == exact()

        top_a = (
            read_mor(spark, root).filter(F.col("g") == "a")
            .orderBy(F.col("v").desc(), F.col("k").desc())
            .limit(1).collect()[0]
        )
        merge_into_mor(spark, root, spark.createDataFrame(
            [
                (int(top_a["k"]), "a", int(top_a["v"]), True),
                (9001, "b", 99999, False),
                (5, "a", 777, False),
            ],
            "k bigint, g string, v bigint, is_delete boolean",
        ))
        got, mode = live()
        assert mode == "mv_delta" and got == exact()

        rep = maintain_topk_from_mor(spark, mv_root, "tk", project)
        assert rep["folded"] is True
        got, mode = live()
        assert mode == "mv" and got == exact()

        # benign rollback (never-folded seq): live keeps serving
        merge_into_mor(spark, root, spark.createDataFrame(
            [(9002, "a", 123, False)],
            "k bigint, g string, v bigint, is_delete boolean",
        ))
        rollback_last_mor(root)
        got, mode = live()
        assert mode == "mv" and got == exact()

        # purge: non-benign — live falls back (exact), maintain raises
        merge_into_mor(spark, root, spark.createDataFrame(
            [(9003, "b", 55, False)],
            "k bigint, g string, v bigint, is_delete boolean",
        ))
        purge_keys_mor(
            spark, root, spark.createDataFrame([(9001,)], "k bigint")
        )
        got, mode = live()
        assert mode is None and got == exact()
        with pytest.raises(RuntimeError, match="mutation counter"):
            maintain_topk_from_mor(spark, mv_root, "tk", project)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_streaming_topk_maintenance_rides_the_sequence_clock(spark):
    """The STREAMING face of top-k maintenance (the stream_mv_maintain
    shape, ranked): a foreachBatch loop merges each micro-batch into
    the MoR table and calls maintain_topk_from_mor right after — the
    sequence-clock catch-up makes redelivery safe by construction (a
    replayed batch re-merges at a NEW sequence; the next catch-up folds
    exactly that span). After the drain the top-k MV equals a
    from-scratch top-k of the final table and serves fresh (mode
    'mv')."""
    from pulsar_cdc_experiment_spark.plans.mor import (
        init_mor,
        merge_into_mor,
        read_mor,
    )
    from pulsar_cdc_experiment_spark.plans.mv import bind_mv_to_mor
    from pulsar_cdc_experiment_spark.plans.mv_topk import (
        _topk_of,
        answer_topk_live,
        create_topk_mv,
        maintain_topk_from_mor,
    )

    base = tempfile.mkdtemp(prefix="tk_stream_")
    try:
        root = os.path.join(base, "t")
        mv_root = os.path.join(base, "mvs")
        feed_root = os.path.join(base, "feed")
        manifest = os.path.join(root, ".mor", "manifest.json")
        rows = [(k, ["a", "b"][k % 2], (k * 37) % 400) for k in range(80)]
        init_mor(
            spark, root,
            spark.createDataFrame(rows, "k bigint, g string, v bigint"),
            keys=["k"], partition_col="g",
        )
        create_topk_mv(
            spark, mv_root, name="tk", source_path=manifest,
            source=read_mor(spark, root).select("g", "k", "v"),
            group_cols=["g"], order_by=ORDER, k=3,
            payload_cols=["k", "v"],
        )
        bind_mv_to_mor(mv_root, "tk", root)

        def project(df):
            cols = [F.col("g"), F.col("k"), F.col("v")]
            if "change_type" in df.columns:
                cols = [F.col("change_type")] + cols
            return df.select(*cols)

        # three time-ordered micro-batch files: inserts, a risky
        # delete of group a's current top row, and an upsert
        top_a = (
            read_mor(spark, root).filter(F.col("g") == "a")
            .orderBy(F.col("v").desc(), F.col("k").desc())
            .limit(1).collect()[0]
        )
        batches = [
            [(9001, "a", 500, False), (9002, "b", 600, False)],
            [(int(top_a["k"]), "a", int(top_a["v"]), True)],
            [(5, "b", 777, False), (9003, "a", 1, False)],
        ]
        os.makedirs(feed_root)
        import time as _time

        t0 = 1_700_000_000
        for i, b in enumerate(batches):
            p = os.path.join(feed_root, f"{i:03d}")
            spark.createDataFrame(
                b, "k bigint, g string, v bigint, is_delete boolean"
            ).coalesce(1).write.parquet(p)
            for f in os.listdir(p):
                os.utime(os.path.join(p, f), (t0 + i * 60, t0 + i * 60))

        from pulsar_cdc_experiment_spark.queries.streaming_q import (
            drain_or_raise,
        )

        folds = []

        def apply_batch(batch_df, batch_id):
            if batch_df.isEmpty():
                return
            merge_into_mor(spark, root, batch_df)
            rep = maintain_topk_from_mor(spark, mv_root, "tk", project)
            folds.append(rep["folded"])

        stream = (
            spark.readStream
            .schema("k bigint, g string, v bigint, is_delete boolean")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(feed_root)
        )
        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option(
                "checkpointLocation", os.path.join(base, "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        drain_or_raise(q, 300, "stream_topk_maintain")
        assert folds and all(folds), folds

        want = sorted(
            tuple(r)
            for r in _topk_of(
                read_mor(spark, root).select("g", "k", "v"),
                ["g"], [["v", "desc"], ["k", "desc"]], 3,
            ).select("g", "k", "v").collect()
        )
        assert _stored(spark, mv_root, "tk") == want
        df, mode = answer_topk_live(
            spark, mv_root, "tk", project,
            group_cols=["g"], order_by=ORDER, k=3,
        )
        assert mode == "mv"
        got = sorted(tuple(r) for r in df.select("g", "k", "v").collect())
        assert got == want
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_topk_policied_routes_and_degrades(spark):
    """answer_topk_policied: the kind-agnostic policy routes the top-k
    verbs — fresh → 'mv'; small span → 'live'; a hot request rate
    flips the same span to 'maintain' (workload economics) and folds;
    a purge → 'base' with exact values (no raise from the read
    path)."""
    from pulsar_cdc_experiment_spark.plans.mor import (
        init_mor,
        merge_into_mor,
        purge_keys_mor,
        read_mor,
    )
    from pulsar_cdc_experiment_spark.plans.mv import bind_mv_to_mor
    from pulsar_cdc_experiment_spark.plans.mv_topk import (
        _topk_of,
        answer_topk_policied,
        create_topk_mv,
    )

    base = tempfile.mkdtemp(prefix="tk_pol_")
    try:
        root = os.path.join(base, "t")
        mv_root = os.path.join(base, "mvs")
        manifest = os.path.join(root, ".mor", "manifest.json")
        rows = [(k, ["a", "b"][k % 2], (k * 37) % 400) for k in range(60)]
        init_mor(
            spark, root,
            spark.createDataFrame(rows, "k bigint, g string, v bigint"),
            keys=["k"], partition_col="g",
        )
        create_topk_mv(
            spark, mv_root, name="tk", source_path=manifest,
            source=read_mor(spark, root).select("g", "k", "v"),
            group_cols=["g"], order_by=ORDER, k=3,
            payload_cols=["k", "v"],
        )
        bind_mv_to_mor(mv_root, "tk", root)

        def project(df):
            cols = [F.col("g"), F.col("k"), F.col("v")]
            if "change_type" in df.columns:
                cols = [F.col("change_type")] + cols
            return df.select(*cols)

        def exact():
            return sorted(
                tuple(r)
                for r in _topk_of(
                    read_mor(spark, root).select("g", "k", "v"),
                    ["g"], [["v", "desc"], ["k", "desc"]], 3,
                ).select("g", "k", "v").collect()
            )

        def serve(**kw):
            df, action = answer_topk_policied(
                spark, mv_root, "tk", project,
                group_cols=["g"], order_by=ORDER, k=3, **kw,
            )
            got = sorted(
                tuple(r) for r in df.select("g", "k", "v").collect()
            )
            assert got == exact(), action
            return action

        assert serve() == "mv"
        merge_into_mor(spark, root, spark.createDataFrame(
            [(9001, "a", 900, False)],
            "k bigint, g string, v bigint, is_delete boolean",
        ))
        assert serve() == "live"
        assert serve(expected_requests=1) == "live"
        # hot rate: maintain fires, then serves fresh
        assert serve(expected_requests=100) == "maintain"
        assert serve() == "mv"
        # purge: base, degraded not raised
        merge_into_mor(spark, root, spark.createDataFrame(
            [(9002, "b", 5, False)],
            "k bigint, g string, v bigint, is_delete boolean",
        ))
        purge_keys_mor(
            spark, root, spark.createDataFrame([(9001,)], "k bigint")
        )
        assert serve() == "base"
    finally:
        shutil.rmtree(base, ignore_errors=True)
