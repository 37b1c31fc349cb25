"""Per-table isolation + multi-batch incrementality of the streaming
multi-table fan-out (round-5 verdict task 5).

stream_cdc_multi_table_state's oracle already pins the VALUES; these tests
pin the two properties the oracle cannot see: (a) the routed landing and
the per-table state dirs contain ONLY their own table's rows, and (b) the
incremental fold across REAL multiple micro-batches equals the one-shot
batch fold — batch-slicing invariance, the property that makes
foreachBatch materialization correct under any trigger cadence.
"""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from pulsar_cdc_experiment_spark.queries.streaming_q import (
    FANOUT_TABLES,
    multi_table_flat_stream,
    run_multi_table_fanout,
)
from pulsar_cdc_experiment_spark.streaming.pipeline import EVENTS_RAW


def _two_file_stream(spark, sf_dir):
    """Stage the events table as TWO files and stream them one per
    micro-batch — a real 2-batch run, not AvailableNow-in-one-gulp."""
    src = tempfile.mkdtemp(prefix="fanout_src_")
    ev = spark.read.schema(EVENTS_RAW).parquet(
        os.path.join(sf_dir, "events.parquet")
    )
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    return (
        spark.readStream.schema(EVENTS_RAW)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        ev,
    )


def test_fanout_isolates_tables_and_folds_incrementally(spark, sf_dir):
    stream, ev = _two_file_stream(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="fanout_root_")
    state, routed = run_multi_table_fanout(
        spark, multi_table_flat_stream(stream), root
    )

    # (a) routed landing: one directory per table, each holding ONLY its
    # table's rows (partition-value isolation), jointly exhaustive
    part_dirs = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(routed, "tbl=*"))
    )
    assert part_dirs == [f"tbl={t}" for t in FANOUT_TABLES]
    mod_of = {"customers": 0, "orders": 1, "products": 2}
    total = 0
    for t in FANOUT_TABLES:
        rows = spark.read.parquet(os.path.join(routed, f"tbl={t}"))
        n = rows.count()
        total += n
        assert n > 0
        assert rows.filter(F.col("row_id") % 3 != mod_of[t]).count() == 0
    assert total == ev.count()

    # per-table STATE isolation: each materializer's state holds only its
    # own table's keys
    for t in FANOUT_TABLES:
        st = state.filter(F.col("tbl") == t)
        assert st.filter(F.col("row_id") % 3 != mod_of[t]).count() == 0

    # (b) 2-batch incremental fold == one-shot batch fold over the feed
    flat_batch = multi_table_flat_stream(ev)
    from pulsar_cdc_experiment_spark.operators.materialize import latest_by_key

    expect = latest_by_key(flat_batch, ["tbl", "row_id"], ["lsn"])
    got = state.select("tbl", "row_id", "lsn", "op", "__v")
    assert got.count() == expect.count()
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


def test_hetero_fanout_typed_schemas_and_batch_invariance(spark, sf_dir):
    """Round-8 heterogeneous fan-out: two tables with DIFFERENT key
    types and after-schemas in one envelope feed. Pins (a) each
    per-table state carries exactly its own TYPED schema (bigint key vs
    string key — nothing stringly-typed survives the routing), and (b)
    the 2-micro-batch incremental fold equals the one-shot batch fold
    per table (batch-slicing invariance with per-table typed parsing in
    the loop)."""
    from pulsar_cdc_experiment_spark.operators.materialize import latest_by_key
    from pulsar_cdc_experiment_spark.queries.streaming_q import (
        HETERO_SPECS,
        hetero_envelope_stream,
        run_heterogeneous_fanout,
    )

    stream, ev = _two_file_stream(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="hetero_root_")
    state = run_heterogeneous_fanout(spark, hetero_envelope_stream(stream), root)

    # (a) typed per-table schemas: the union carries BOTH tables' typed
    # columns; each table's slice is non-null exactly on its own columns
    types = dict(state.dtypes)
    assert types["acct_id"] == "bigint" and types["sess_key"] == "string"
    assert types["balance"] == "double" and types["hits"] == "bigint"
    acc = state.filter(F.col("tbl") == "accounts")
    sess = state.filter(F.col("tbl") == "sessions")
    assert acc.filter(F.col("acct_id").isNull()).count() == 0
    assert acc.filter(F.col("sess_key").isNotNull()).count() == 0
    assert sess.filter(F.col("sess_key").isNull()).count() == 0
    assert sess.filter(F.col("acct_id").isNotNull()).count() == 0
    # different key types really met different fold keys: accounts keys
    # are per-user, sessions keys collapse onto the s<residue> space
    assert acc.count() == ev.filter(F.col("user_id") % 2 == 0).select(
        "user_id"
    ).distinct().count()

    # (b) incremental 2-batch fold == one-shot fold, per table
    env_batch = hetero_envelope_stream(ev)
    for t, spec in HETERO_SPECS.items():
        typed = (
            env_batch.filter(F.col("tbl") == t)
            .select(
                "lsn", "op",
                F.from_json(F.col("after_json"), spec["schema"]).alias("a"),
            )
            .select("lsn", "op", "a.*")
        )
        expect = latest_by_key(typed, spec["keys"], ["lsn"])
        got = state.filter(F.col("tbl") == t).select(*expect.columns)
        assert got.count() == expect.count()
        assert got.exceptAll(expect).count() == 0
        assert expect.exceptAll(got).count() == 0


def test_hetero_fanout_rejects_unrouted_table(spark, sf_dir):
    """An envelope whose tbl has no spec must FAIL the stream, not vanish:
    silently dropping an upstream table added before its spec lands is
    exactly the data-loss mode multi-table CDC exists to prevent (r8
    ADVICE). Pins that route() raises and the error names the stray
    table count."""
    import pytest

    from pulsar_cdc_experiment_spark.queries.streaming_q import (
        hetero_envelope_stream,
        run_heterogeneous_fanout,
    )

    stream, _ = _two_file_stream(spark, sf_dir)
    env = hetero_envelope_stream(stream)
    # rebadge a slice of the feed as a table no spec knows about
    env = env.withColumn(
        "tbl",
        F.when(F.col("lsn") % 97 == 0, F.lit("ghosts")).otherwise(
            F.col("tbl")
        ),
    )
    root = tempfile.mkdtemp(prefix="hetero_unrouted_")
    with pytest.raises(Exception, match="no spec"):
        run_heterogeneous_fanout(spark, env, root)


def test_hetero_fanout_rejects_null_table(spark, sf_dir):
    """NULL tbl must count as unrouted too: ~isin(NULL) is NULL, which
    a plain filter silently drops — the round-9-review hole in the r8
    fail-loud guard. A malformed feed where the table field is missing
    must fail the stream, not vanish."""
    import pytest

    from pulsar_cdc_experiment_spark.queries.streaming_q import (
        hetero_envelope_stream,
        run_heterogeneous_fanout,
    )

    stream, _ = _two_file_stream(spark, sf_dir)
    env = hetero_envelope_stream(stream).withColumn(
        "tbl",
        F.when(F.col("lsn") % 97 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("tbl")),
    )
    root = tempfile.mkdtemp(prefix="hetero_nulltbl_")
    with pytest.raises(Exception, match="no spec"):
        run_heterogeneous_fanout(spark, env, root)


def test_hetero_fanout_schema_evolution(spark, sf_dir):
    """Per-table typed parsing PINS the schema; the realistic evolution
    path is a parser redeploy with a v2 spec over the SAME state root.
    Pins: (a) the evolved table's state widens (new column typed, old
    rows null — the materializer's union-by-name), (b) the OTHER
    table's state is untouched by the evolution, (c) later-lsn v2 rows
    supersede v1 rows for the same key across the restart."""
    import os

    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.queries.streaming_q import (
        HETERO_SPECS,
        run_heterogeneous_fanout,
    )
    from pulsar_cdc_experiment_spark.streaming.pipeline import EVENTS_RAW

    ev = spark.read.schema(EVENTS_RAW).parquet(
        os.path.join(sf_dir, "events.parquet")
    )
    tbl = F.when(F.col("user_id") % 2 == 0, "accounts").otherwise("sessions")
    base_after = F.to_json(
        F.struct(
            F.col("user_id").cast("long").alias("acct_id"),
            F.col("value").alias("balance"),
            F.col("event_type").alias("status"),
        )
    )
    sess_after = F.to_json(
        F.struct(
            F.concat(F.lit("s"), (F.col("user_id") % 500).cast("string")).alias(
                "sess_key"
            ),
            (F.col("event_id") % 7).cast("long").alias("hits"),
            F.upper(F.col("event_type")).alias("agent"),
        )
    )
    # v2 payload: accounts gains a typed `tier` column upstream
    v2_after = F.to_json(
        F.struct(
            F.col("user_id").cast("long").alias("acct_id"),
            F.col("value").alias("balance"),
            F.col("event_type").alias("status"),
            (F.col("user_id") % 3).cast("long").alias("tier"),
        )
    )

    def env(after_acc, lsn_shift):
        return ev.select(
            tbl.alias("tbl"),
            (F.col("event_id") + lsn_shift).cast("long").alias("lsn"),
            F.lit("u").alias("op"),
            F.when(tbl == "accounts", after_acc)
            .otherwise(sess_after)
            .alias("after_json"),
        )

    def stream_of(df):
        src = tempfile.mkdtemp(prefix="hetero_evo_src_")
        df.coalesce(1).write.mode("overwrite").parquet(src)
        return (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    root = tempfile.mkdtemp(prefix="hetero_evo_root_")
    # run 1: v1 parser
    run_heterogeneous_fanout(spark, stream_of(env(base_after, 0)), root)
    # run 2 (redeploy): v2 parser, SAME root, later lsns
    specs_v2 = {
        "accounts": {
            "schema": "acct_id BIGINT, balance DOUBLE, status STRING, tier BIGINT",
            "keys": ["acct_id"],
        },
        "sessions": HETERO_SPECS["sessions"],
    }
    state = run_heterogeneous_fanout(
        spark, stream_of(env(v2_after, 1_000_000)), root, specs=specs_v2
    )

    # (a) widened + typed; v2 rows superseded v1 (all lsns shifted)
    acc = state.filter(F.col("tbl") == "accounts")
    assert dict(state.dtypes)["tier"] == "bigint"
    assert acc.filter(F.col("lsn") < 1_000_000).count() == 0
    assert acc.filter(F.col("tier").isNull()).count() == 0
    assert (
        acc.filter(F.col("tier") != F.col("acct_id") % 3).count() == 0
    )
    # (b) sessions untouched by accounts' evolution: no tier values
    sess = state.filter(F.col("tbl") == "sessions")
    assert sess.filter(F.col("tier").isNotNull()).count() == 0
    assert sess.count() > 0
