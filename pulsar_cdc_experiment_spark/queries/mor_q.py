"""Merge-on-read (deletion-vector) driver queries — the O(changeset)
MERGE write path (plans/mor.py) value-checked end-to-end.

Same oracle discipline as the copy-on-write family (queries/merge_q.py):
every query's DuckDB oracle recomputes the expected state from the
ORIGINAL table and the changesets' closed-form definitions, so a wrong
delete-sidecar application, a leaked pre-image, or a sequence mix-up
shifts an aggregate. The shared fixture applies the SAME standard
changeset as merge_upsert_partitioned — the two merge strategies are
value-checked against the same closed form, proving they implement one
MERGE semantics with different physical cost models.

Reference analog: the reference's CDC stream IS the changeset feed
(c/u/d row images, connectors/README.md:152-157); merge-on-read is how
a high-frequency CDC apply keeps write amplification at O(feed).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from ..plans.mor import (
    change_feed_mor,
    compact_mor,
    init_mor,
    merge_into_mor,
    mor_history,
    purge_keys_mor,
    read_mor,
)
from ..registry import register
from ..sources.tables import local_rows, table
from .fixture_cache import (
    session_fixture,
    write_feed_batches,
    write_feed_batches_by,
)
from .merge_q import _ORDER_COLS, _TOUCHED, _changeset


def mor_orders_fixture(spark, sf_dir: str) -> str:
    """orders as a MoR table → seq 1 = the STANDARD changeset (same as
    the copy-on-write fixture) → seq 2 = delete seq 1's inserts and
    re-update the 1.07 keys by 1.10 (the replay-fixture shape). The
    build asserts the base generation stays byte-identical through both
    merges — the O(changeset) write-cost claim, checked where the
    oracle cannot see it."""

    def build(root: str) -> None:
        from ..plans.merge import partition_file_listing

        dst = os.path.join(root, "orders")
        orders = table(spark, sf_dir, "orders").select(*_ORDER_COLS)
        init_mor(
            spark, dst, orders,
            keys=["o_orderkey"], partition_col="o_orderpriority",
        )
        base = os.path.join(dst, "base-000000")
        before = partition_file_listing(base, "o_orderpriority")
        rep1 = merge_into_mor(spark, dst, _changeset(orders))
        assert rep1["seq"] == 1 and rep1["n_appended"] > 0
        merged1 = read_mor(spark, dst, 1)
        chg2 = (
            merged1.filter(F.col("o_orderkey") >= 10_000_000)
            .withColumn("is_delete", F.lit(True))
            .unionByName(
                merged1.filter(
                    (F.col("o_orderkey") % 50 == 3)
                    & F.col("o_orderpriority").isin(*_TOUCHED)
                )
                .withColumn("o_totalprice", F.col("o_totalprice") * 1.10)
                .withColumn("is_delete", F.lit(False))
            )
        )
        rep2 = merge_into_mor(spark, dst, chg2)
        assert rep2["seq"] == 2
        assert partition_file_listing(base, "o_orderpriority") == before, (
            "MoR merge rewrote base files — the write path must be "
            "O(changeset)"
        )
        with open(os.path.join(root, "reports.json"), "w") as f:
            json.dump({"r1": rep1, "r2": rep2}, f)

    return session_fixture("mor_orders", sf_dir, "cs50_s1_s2", build)


def _cents():
    # lazy: building a Column requires an active SparkContext, and this
    # module must import session-free (registry enumeration, tooling)
    return F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")


def _pri_agg(df, extra_cols=()):
    return (
        df.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(_cents()).alias("sum_cents"),
            F.sum((F.col("o_orderkey") >= 10_000_000).cast("long")).alias(
                "n_ins"
            ),
        )
        .select(*extra_cols, "o_orderpriority", "n", "sum_cents", "n_ins")
    )


@register(
    "merge_upsert_dv",
    oracle="""
    WITH chg_upd AS (
      SELECT o_orderkey, floor(o_totalprice * 1.07 * 100 + 0.5) AS cents,
             o_orderpriority
      FROM orders
      WHERE o_orderkey % 50 = 3 AND o_orderpriority IN ('1-URGENT','3-MEDIUM')
    ), chg_mov AS (
      SELECT o_orderkey, floor(o_totalprice * 100 + 0.5) AS cents,
             '1-URGENT' AS o_orderpriority
      FROM orders
      WHERE o_orderkey % 50 = 19 AND o_orderpriority = '3-MEDIUM'
    ), chg_ins AS (
      SELECT o_orderkey + 10000000 AS o_orderkey,
             floor(o_totalprice * 100 + 0.5) AS cents,
             '1-URGENT' AS o_orderpriority
      FROM orders
      WHERE o_orderkey % 50 = 11 AND o_orderpriority = '5-LOW'
    ), chg_keys AS (
      SELECT o_orderkey FROM chg_upd
      UNION ALL SELECT o_orderkey FROM chg_mov
      UNION ALL SELECT o_orderkey FROM chg_ins
      UNION ALL SELECT o_orderkey FROM orders
        WHERE o_orderkey % 50 = 7
          AND o_orderpriority IN ('1-URGENT','3-MEDIUM')
    ), final AS (
      SELECT o_orderkey, floor(o_totalprice * 100 + 0.5) AS cents,
             o_orderpriority
      FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM chg_keys)
      UNION ALL SELECT * FROM chg_upd
      UNION ALL SELECT * FROM chg_mov
      UNION ALL SELECT * FROM chg_ins
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(cents AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(sum(CASE WHEN o_orderkey >= 10000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ins
    FROM final GROUP BY 1
    """,
)
def merge_upsert_dv(spark, sf_dir):
    """MERGE INTO via deletion vectors (merge-on-read, plans/mor.py):
    the SAME standard changeset as merge_upsert_partitioned — updates,
    a partition-drift move (free here: the equality delete kills the
    old image wherever it lives), inserts, deletes, and no-op deletes —
    applied as one delete sidecar + one delta append, with the base
    generation asserted byte-identical in the fixture. Read applies the
    sidecars as a changeset-sized LEFT join (broadcastable at scale;
    the base scan never shuffles). The oracle is the copy-on-write
    query's closed form — both strategies must produce one MERGE
    semantics. Public design analog: Iceberg equality deletes / Delta
    deletion vectors."""
    root = mor_orders_fixture(spark, sf_dir)
    return _pri_agg(read_mor(spark, os.path.join(root, "orders"), 1))


@register(
    "merge_dv_time_travel",
    oracle="""
    WITH s1 AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             CASE WHEN o_orderkey % 50 = 3
                    AND o_orderpriority IN ('1-URGENT','3-MEDIUM')
                  THEN floor(o_totalprice * 1.07 * 100 + 0.5)
                  ELSE floor(o_totalprice * 100 + 0.5) END AS cents
      FROM orders
      WHERE NOT (o_orderkey % 50 = 7
                 AND o_orderpriority IN ('1-URGENT','3-MEDIUM'))
        AND NOT (o_orderkey % 50 = 19 AND o_orderpriority = '3-MEDIUM')
      UNION ALL
      SELECT o_orderkey, '1-URGENT', o_totalprice,
             floor(o_totalprice * 100 + 0.5)
      FROM orders
      WHERE o_orderkey % 50 = 19 AND o_orderpriority = '3-MEDIUM'
      UNION ALL
      SELECT o_orderkey + 10000000, '1-URGENT', o_totalprice,
             floor(o_totalprice * 100 + 0.5)
      FROM orders
      WHERE o_orderkey % 50 = 11 AND o_orderpriority = '5-LOW'
    )
    SELECT 0 AS seq, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM orders GROUP BY 2
    UNION ALL
    SELECT 1, o_orderpriority, CAST(count(*) AS BIGINT),
           CAST(sum(CAST(cents AS BIGINT)) AS BIGINT)
    FROM s1 GROUP BY 2
    UNION ALL
    SELECT 2, o_orderpriority, CAST(count(*) AS BIGINT),
           CAST(sum(CAST(CASE WHEN o_orderkey % 50 = 3
                     AND o_orderpriority IN ('1-URGENT','3-MEDIUM')
                     AND o_orderkey < 10000000
                THEN floor(o_totalprice * 1.07 * 1.10 * 100 + 0.5)
                ELSE cents END AS BIGINT)) AS BIGINT)
    FROM s1 WHERE o_orderkey < 10000000 GROUP BY 2
    """,
)
def merge_dv_time_travel(spark, sf_dir):
    """Sequence time travel over the MoR table: seq 0 (base), seq 1
    (post standard changeset), seq 2 (inserts deleted, 1.07 keys
    re-updated ×1.10) — each reconstructed by overlaying only the
    sidecars at-or-below the sequence, never a data rewrite. The oracle
    derives all three states closed-form; a delete applied to the wrong
    side of a row's birth sequence (the off-by-one every overlay
    scheme risks) shifts seq 1 vs seq 2. CoW relative: read_version
    (merge_time_travel_read)."""
    root = mor_orders_fixture(spark, sf_dir)
    dst = os.path.join(root, "orders")
    parts = []
    for seq in (0, 1, 2):
        parts.append(
            read_mor(spark, dst, seq)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"), F.sum(_cents()).alias("sum_cents"))
            .select(
                F.lit(seq).alias("seq"), "o_orderpriority", "n", "sum_cents"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "merge_dv_change_feed",
    oracle="""
    SELECT o_orderkey, 'update_pre' AS change_type, o_orderpriority,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
    WHERE o_orderkey % 50 = 3
      AND o_orderpriority IN ('1-URGENT','3-MEDIUM')
    UNION ALL
    SELECT o_orderkey, 'update_post', o_orderpriority,
           CAST(floor(o_totalprice * 1.07 * 1.10 * 100 + 0.5) AS BIGINT)
    FROM orders
    WHERE o_orderkey % 50 = 3
      AND o_orderpriority IN ('1-URGENT','3-MEDIUM')
    UNION ALL
    SELECT o_orderkey, 'update_pre', o_orderpriority,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
    FROM orders
    WHERE o_orderkey % 50 = 19 AND o_orderpriority = '3-MEDIUM'
    UNION ALL
    SELECT o_orderkey, 'update_post', '1-URGENT',
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
    FROM orders
    WHERE o_orderkey % 50 = 19 AND o_orderpriority = '3-MEDIUM'
    UNION ALL
    SELECT o_orderkey, 'delete', o_orderpriority,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
    FROM orders
    WHERE o_orderkey % 50 = 7
      AND o_orderpriority IN ('1-URGENT','3-MEDIUM')
    """,
)
def merge_dv_change_feed(spark, sf_dir):
    """NET change feed seq 0 → seq 2 over the MoR table: the seq-1
    inserts are deleted at seq 2 and must CANCEL; the 1.07×1.10 double
    update collapses to one pre/post pair; the drift move surfaces as
    an update pair with the new partition value. Both reconstructions
    are pruned to the spanned DELETE SIDECARS' keys before the
    full-outer diff — the sidecars are the feed's touched-key metadata,
    so cost tracks the changesets, never table size. CoW relative:
    merge_change_feed (same output contract, same closed-form oracle
    family)."""
    root = mor_orders_fixture(spark, sf_dir)
    feed = change_feed_mor(spark, os.path.join(root, "orders"), 0)
    return feed.select(
        "o_orderkey", "change_type", "o_orderpriority",
        _cents().alias("cents"),
    )


@register(
    "merge_dv_describe_history",
    oracle="""
    WITH counts AS (
      SELECT
        (SELECT count(*) FROM orders WHERE o_orderkey % 50 = 3
           AND o_orderpriority IN ('1-URGENT','3-MEDIUM')) AS n_upd,
        (SELECT count(*) FROM orders WHERE o_orderkey % 50 = 19
           AND o_orderpriority = '3-MEDIUM') AS n_mov,
        (SELECT count(*) FROM orders WHERE o_orderkey % 50 = 11
           AND o_orderpriority = '5-LOW') AS n_ins,
        (SELECT count(*) FROM orders WHERE o_orderkey % 50 = 7
           AND o_orderpriority IN ('1-URGENT','3-MEDIUM')) AS n_del,
        (SELECT count(*) FROM orders WHERE o_orderkey % 50 = 13
           AND o_orderpriority = '4-NOT SPECIFIED') AS n_noop
    )
    SELECT 1 AS seq,
           CAST(n_upd + n_mov + n_ins + n_del + n_noop AS BIGINT)
             AS n_delete_keys,
           CAST(n_upd + n_mov + n_ins AS BIGINT) AS n_appended
    FROM counts
    UNION ALL
    SELECT 2, CAST(n_ins + n_upd AS BIGINT), CAST(n_upd AS BIGINT)
    FROM counts
    """,
)
def merge_dv_describe_history(spark, sf_dir):
    """DESCRIBE HISTORY for the MoR table — pure manifest metadata, no
    data scan: per sequence, how many delete keys were recorded and how
    many rows appended. The oracle recomputes both counters closed-form
    from the changeset definitions (seq 2's delete-key count = seq 1's
    insert count + the re-updated keys — a cross-sequence identity a
    stale manifest cannot satisfy). CoW relative:
    merge_describe_history."""
    root = mor_orders_fixture(spark, sf_dir)
    rows = [
        (s["seq"], s["n_delete_keys"], s["n_appended"])
        for s in mor_history(os.path.join(root, "orders"))
    ]
    return local_rows(spark,
        rows, "seq int, n_delete_keys bigint, n_appended bigint"
    )


def mor_purge_fixture(spark, sf_dir: str) -> str:
    """MoR table → seq 1 standard changeset → PURGE keys
    ``o_orderkey % 50 == 23`` (untouched by the changeset, so their
    images sit in base files — erasure must rewrite the base even when
    no sidecar mentions the key) → COMPACT. The build asserts
    unreachability at every sequence BEFORE compaction and that
    compaction leaves zero sidecars."""

    def build(root: str) -> None:
        import glob as _glob

        dst = os.path.join(root, "orders")
        orders = table(spark, sf_dir, "orders").select(*_ORDER_COLS)
        init_mor(
            spark, dst, orders,
            keys=["o_orderkey"], partition_col="o_orderpriority",
        )
        merge_into_mor(spark, dst, _changeset(orders))
        key_rows = orders.filter(F.col("o_orderkey") % 50 == 23).select(
            "o_orderkey"
        )
        prep = purge_keys_mor(spark, dst, key_rows)
        assert prep["data_rows_purged"] > 0
        for seq in (0, 1):
            leak = (
                read_mor(spark, dst, seq)
                .filter(F.col("o_orderkey") % 50 == 23)
                .count()
            )
            assert leak == 0, (seq, leak)
        crep = compact_mor(spark, dst)
        assert crep["compacted_seqs"] == 1
        # compaction unpublishes every sidecar immediately; the FILES
        # persist as a retention grace window for in-flight readers
        # (already scrubbed of purged keys above — no PII lingers) and
        # the next maintenance entry sweeps them
        assert mor_history(dst) == []
        compact_mor(spark, dst)  # no-op maintenance entry → sweep
        assert not _glob.glob(os.path.join(dst, ".mor", "delete", "*"))
        with open(os.path.join(root, "purge.json"), "w") as f:
            json.dump({"purge": prep, "compact": crep}, f)

    return session_fixture("mor_purge", sf_dir, "purge23_compact", build)


@register(
    "merge_dv_purge_compact",
    oracle="""
    WITH chg_upd AS (
      SELECT o_orderkey, floor(o_totalprice * 1.07 * 100 + 0.5) AS cents,
             o_orderpriority
      FROM orders
      WHERE o_orderkey % 50 = 3 AND o_orderpriority IN ('1-URGENT','3-MEDIUM')
    ), chg_mov AS (
      SELECT o_orderkey, floor(o_totalprice * 100 + 0.5) AS cents,
             '1-URGENT' AS o_orderpriority
      FROM orders
      WHERE o_orderkey % 50 = 19 AND o_orderpriority = '3-MEDIUM'
    ), chg_ins AS (
      SELECT o_orderkey + 10000000 AS o_orderkey,
             floor(o_totalprice * 100 + 0.5) AS cents,
             '1-URGENT' AS o_orderpriority
      FROM orders
      WHERE o_orderkey % 50 = 11 AND o_orderpriority = '5-LOW'
    ), chg_keys AS (
      SELECT o_orderkey FROM chg_upd
      UNION ALL SELECT o_orderkey FROM chg_mov
      UNION ALL SELECT o_orderkey FROM chg_ins
      UNION ALL SELECT o_orderkey FROM orders
        WHERE o_orderkey % 50 = 7
          AND o_orderpriority IN ('1-URGENT','3-MEDIUM')
    ), final AS (
      SELECT o_orderkey, floor(o_totalprice * 100 + 0.5) AS cents,
             o_orderpriority
      FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM chg_keys)
      UNION ALL SELECT * FROM chg_upd
      UNION ALL SELECT * FROM chg_mov
      UNION ALL SELECT * FROM chg_ins
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(cents AS BIGINT)) AS BIGINT) AS sum_cents
    FROM final WHERE o_orderkey % 50 <> 23
    GROUP BY 1
    """,
)
def merge_dv_purge_compact(spark, sf_dir):
    """GDPR erasure + OPTIMIZE on the MoR table: purge keys
    ``% 50 == 23`` (rewriting their bytes out of base, deltas, AND the
    delete sidecars — the key values are the PII), then compact to a
    fresh base generation. The fixture asserts unreachability at every
    pre-compaction sequence and that zero sidecars survive; the oracle
    is the merged closed form MINUS the purged keys — a purge that
    missed a component, or a compaction that resurrected one, shifts an
    aggregate. CoW relative: purge_keys (merge_purge_erasure)."""
    root = mor_purge_fixture(spark, sf_dir)
    return (
        read_mor(spark, os.path.join(root, "orders"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum(_cents()).alias("sum_cents"))
    )


@register(
    "stream_mor_apply",
    oracle="""
    WITH latest AS (
      SELECT user_id, event_type, value, event_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(max(event_id) AS BIGINT) AS max_event
    FROM latest WHERE event_type <> 'error' GROUP BY 1
    """,
)
def stream_mor_apply(spark, sf_dir):
    """STREAMING upsert sink via MERGE-ON-READ (foreachBatch +
    merge_into_mor): the same time-ordered two-batch CDC feed and the
    same global-latest-per-key oracle as stream_merge_apply, applied
    through the deletion-vector path instead of copy-on-write — batch 0
    bootstraps the MoR table (init_mor), every later batch lands as one
    delete sidecar + one delta append, O(batch) write amplification
    regardless of serving-table size. This is the shape a
    high-frequency CDC apply wants at 100 TB: per-micro-batch cost
    tracks the FEED, and compaction amortizes on its own schedule
    (stream_auto_maintenance is the CoW relative of that half).
    Identical oracle to the CoW query = the two physical strategies
    value-checked as one MERGE semantics, end-to-end from a stream.
    Reference analog: the reference's enriched topic feeding a serving
    table (docs/architecture.md:9-73) with at-least-once delivery —
    re-merging a replayed batch at a new sequence converges to the
    same state."""
    from ..operators.materialize import latest_by_key
    from ..streaming.pipeline import EVENTS_RAW
    from .streaming_q import drain_or_raise

    def build(root: str) -> None:
        feed_root = os.path.join(root, "feed")
        state_root = os.path.join(root, "state")
        ev = spark.read.schema(EVENTS_RAW).parquet(
            os.path.join(sf_dir, "events.parquet")
        )
        t0 = F.lit("2024-01-15 00:00:00").cast("timestamp_ntz")
        write_feed_batches(
            feed_root,
            (ev.filter(F.col("ts") < t0), ev.filter(F.col("ts") >= t0)),
        )

        stream = (
            spark.readStream.schema(EVENTS_RAW)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(feed_root)
        )

        def apply_batch(batch_df, batch_id):
            chg = latest_by_key(
                batch_df, ["user_id"], ["ts", "event_id"]
            ).select(
                "user_id",
                "value",
                "event_id",
                "event_type",
                (F.col("event_type") == "error").alias("is_delete"),
            )
            if not os.path.exists(
                os.path.join(state_root, ".mor", "manifest.json")
            ):
                # the manifest is init_mor's LAST write, so its absence
                # with a state dir present = a crashed bootstrap — a
                # micro-batch-0 retry must re-bootstrap from scratch,
                # not merge into partial state (the stream_merge_apply
                # _SUCCESS lesson, round-10)
                import shutil

                shutil.rmtree(state_root, ignore_errors=True)
                init_mor(
                    spark, state_root,
                    chg.filter(~F.col("is_delete")).drop("is_delete"),
                    keys=["user_id"], partition_col="event_type",
                )
            else:
                merge_into_mor(spark, state_root, chg)

        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        drain_or_raise(q, 300, "stream_mor_apply")
        assert [s["seq"] for s in mor_history(state_root)] == [1]

    root = session_fixture("stream_mor", sf_dir, "t0jan15_v1", build)
    served = read_mor(spark, os.path.join(root, "state"))
    return served.groupBy("event_type").agg(
        F.count("*").alias("n_users"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        ).alias("sum_cents"),
        F.max("event_id").alias("max_event"),
    )


def mor_auto_fixture(spark, sf_dir: str) -> str:
    """Three successive CDC applies on a MoR orders table with a
    policy check between: after two merges the overlay (depth 2) is
    within the depth-2 policy and auto_compact_mor must DECLINE; the
    third merge crosses it and the same call must compact. Both
    decisions and the observed counters land in report.json — the
    query value-checks the decision itself, not just the data."""

    def build(root: str) -> None:
        from ..plans.mor import auto_compact_mor

        dst = os.path.join(root, "orders")
        orders = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        )
        init_mor(
            spark, dst, orders,
            keys=["o_orderkey"], partition_col="o_orderpriority",
        )
        key, pri = F.col("o_orderkey"), F.col("o_orderpriority")
        m1 = (
            orders.filter((key % 50 == 3) & pri.isin(*_TOUCHED))
            .withColumn("o_totalprice", F.col("o_totalprice") * 1.07)
            .withColumn("is_delete", F.lit(False))
        )
        m2 = (
            orders.filter((key % 50 == 19) & (pri == "3-MEDIUM"))
            .withColumn("o_orderpriority", F.lit("1-URGENT"))
            .withColumn("is_delete", F.lit(False))
        )
        m3 = orders.filter(
            (key % 50 == 7) & pri.isin(*_TOUCHED)
        ).withColumn("is_delete", F.lit(True))
        merge_into_mor(spark, dst, m1)
        merge_into_mor(spark, dst, m2)
        policy = {"max_overlay_depth": 2, "max_sidecar_keys": 10**9}
        check1 = auto_compact_mor(spark, dst, **policy)
        assert not check1["triggered"], check1
        assert [s["seq"] for s in mor_history(dst)] == [1, 2]
        merge_into_mor(spark, dst, m3)
        check2 = auto_compact_mor(spark, dst, **policy)
        assert check2["triggered"], check2
        assert check2["compact"]["base_seq"] == 3
        assert mor_history(dst) == []
        with open(os.path.join(root, "report.json"), "w") as f:
            json.dump({"check1": check1, "check2": check2}, f)

    return session_fixture("mor_auto", sf_dir, "depth2_policy", build)


@register(
    "merge_dv_auto_compact",
    oracle="""
    WITH k1 AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM orders
      WHERE o_orderkey % 50 = 3
        AND o_orderpriority IN ('1-URGENT','3-MEDIUM')
    ), k2 AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM orders
      WHERE o_orderkey % 50 = 19 AND o_orderpriority = '3-MEDIUM'
    ), k3 AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM orders
      WHERE o_orderkey % 50 = 7
        AND o_orderpriority IN ('1-URGENT','3-MEDIUM')
    ), final AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 50 = 3
                       AND o_orderpriority IN ('1-URGENT','3-MEDIUM')
                  THEN floor(o_totalprice * 1.07 * 100 + 0.5)
                  ELSE floor(o_totalprice * 100 + 0.5) END AS cents,
             CASE WHEN o_orderkey % 50 = 19
                       AND o_orderpriority = '3-MEDIUM'
                  THEN '1-URGENT' ELSE o_orderpriority END
               AS o_orderpriority
      FROM orders
      WHERE NOT (o_orderkey % 50 = 7
                 AND o_orderpriority IN ('1-URGENT','3-MEDIUM'))
    )
    SELECT 'decision' AS metric, 'check1_depth' AS grp,
           CAST(2 AS BIGINT) AS n, CAST(0 AS BIGINT) AS v
    UNION ALL
    SELECT 'decision', 'check1_keys', k1.n + k2.n, 0 FROM k1, k2
    UNION ALL
    SELECT 'decision', 'check2_depth', 3, 1
    UNION ALL
    SELECT 'decision', 'check2_keys', k1.n + k2.n + k3.n, 1
    FROM k1, k2, k3
    UNION ALL
    SELECT 'state', o_orderpriority, CAST(count(*) AS BIGINT),
           CAST(sum(CAST(cents AS BIGINT)) AS BIGINT)
    FROM final GROUP BY 2
    """,
)
def merge_dv_auto_compact(spark, sf_dir):
    """POLICY-TRIGGERED compaction for the merge-on-read table — the
    MoR analog of the CoW family's stream_auto_maintenance: the read
    overlay grows one scan leg + one sidecar per merge, and
    ``auto_compact_mor`` compacts when depth (or total sidecar keys)
    crosses policy, deciding from MANIFEST METADATA ALONE (zero jobs —
    cheap enough for every micro-batch). The oracle predicts BOTH
    decisions: after two merges depth 2 is within the depth-2 policy
    (must decline, overlay intact), the third crosses it (must compact
    to base_seq 3, zero retained sequences) — and the observed sidecar
    key counts equal the changesets' closed-form key counts. The state
    rows value-check that the triggered compaction preserved the merged
    state exactly. At 100 TB this bounds the measured 1.7-2.1× overlay
    read tax under continuous CDC apply without a human in the loop.
    CoW relative: stream_auto_maintenance (fragmentation-triggered
    scoped OPTIMIZE)."""
    root = mor_auto_fixture(spark, sf_dir)
    with open(os.path.join(root, "report.json")) as f:
        rep = json.load(f)
    decisions = local_rows(spark,
        [
            ("decision", "check1_depth",
             rep["check1"]["overlay_depth"],
             int(rep["check1"]["triggered"])),
            ("decision", "check1_keys",
             rep["check1"]["sidecar_keys"],
             int(rep["check1"]["triggered"])),
            ("decision", "check2_depth",
             rep["check2"]["overlay_depth"],
             int(rep["check2"]["triggered"])),
            ("decision", "check2_keys",
             rep["check2"]["sidecar_keys"],
             int(rep["check2"]["triggered"])),
        ],
        "metric string, grp string, n bigint, v bigint",
    )
    cents = F.floor(
        F.col("o_totalprice") * 100 + F.lit(0.5)
    ).cast("long")
    state = (
        read_mor(spark, os.path.join(root, "orders"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum(cents).alias("v"))
        .select(
            F.lit("state").alias("metric"),
            F.col("o_orderpriority").alias("grp"), "n", "v",
        )
    )
    return decisions.unionByName(state)


def txn_mixed_fixture(spark, sf_dir: str) -> str:
    """One transaction spanning BOTH physical strategies: orders lands
    copy-on-write, events lands merge-on-read, and a saga applies one
    changeset to each. A FAILING transaction runs first (valid MoR leg,
    then a CoW changeset missing its key columns): its compensation
    must unpublish the MoR sequence — the build asserts zero retained
    sequences and byte-equal state before the succeeding transaction
    runs."""

    def build(root: str) -> None:
        from ..plans.txn import merge_transaction

        cow = os.path.join(root, "orders")
        mor_t = os.path.join(root, "events")
        orders = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        )
        orders.repartition(4).write.partitionBy("o_orderpriority").parquet(
            cow
        )
        ev = table(spark, sf_dir, "events")
        init_mor(
            spark, mor_t, ev, keys=["event_id"],
            partition_col="event_type",
        )

        def ev_chg():
            eid = F.col("event_id")
            upd = (
                ev.filter(eid % 30 == 2)
                .withColumn("value", F.col("value") * 1.2)
                .withColumn("is_delete", F.lit(False))
            )
            dele = ev.filter(eid % 30 == 7).withColumn(
                "is_delete", F.lit(True)
            )
            return upd.unionByName(dele)

        def o_chg():
            key = F.col("o_orderkey")
            upd = (
                orders.filter(key % 50 == 3)
                .withColumn("o_totalprice", F.col("o_totalprice") * 1.07)
                .withColumn("is_delete", F.lit(False))
            )
            dele = orders.filter(key % 50 == 7).withColumn(
                "is_delete", F.lit(True)
            )
            return upd.unionByName(dele)

        bogus = local_rows(spark,
            [(1.0, "1-URGENT", False)],
            "o_totalprice double, o_orderpriority string, "
            "is_delete boolean",
        )
        failed = None
        try:
            merge_transaction(
                spark, root,
                [
                    {"path": mor_t, "source": ev_chg()},
                    {"path": cow, "source": bogus,
                     "keys": ["o_orderkey"],
                     "partition_col": "o_orderpriority"},
                ],
            )
        except Exception as e:
            failed = repr(e)
        assert failed is not None, "bogus CoW leg must fail the txn"
        assert mor_history(mor_t) == [], (
            "compensation must unpublish the MoR sequence"
        )
        out = merge_transaction(
            spark, root,
            [
                {"path": mor_t, "source": ev_chg()},
                {"path": cow, "source": o_chg(),
                 "keys": ["o_orderkey"],
                 "partition_col": "o_orderpriority"},
            ],
        )
        assert out["n_legs"] == 2
        with open(os.path.join(root, "txn.json"), "w") as f:
            json.dump(
                {"failed_first": failed, "txn_seq": out["txn_seq"]}, f
            )

    return session_fixture("txn_mixed", sf_dir, "fail_then_ok_v1", build)


@register(
    "merge_txn_mixed_strategies",
    oracle="""
    WITH ev AS (
      SELECT event_type,
             CASE WHEN event_id % 30 = 2
                  THEN floor(value * 1.2 * 100 + 0.5)
                  ELSE floor(value * 100 + 0.5) END AS cents
      FROM events WHERE event_id % 30 <> 7
    ), o AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey % 50 = 3
                  THEN floor(o_totalprice * 1.07 * 100 + 0.5)
                  ELSE floor(o_totalprice * 100 + 0.5) END AS cents
      FROM orders WHERE o_orderkey % 50 <> 7
    )
    SELECT 'events_mor' AS tbl, event_type AS grp,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(cents AS BIGINT)) AS BIGINT) AS sum_cents
    FROM ev GROUP BY 2
    UNION ALL
    SELECT 'orders_cow', o_orderpriority, CAST(count(*) AS BIGINT),
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT)
    FROM orders GROUP BY 2
    UNION ALL
    SELECT 'orders_cow_post', o_orderpriority, CAST(count(*) AS BIGINT),
           CAST(sum(CAST(cents AS BIGINT)) AS BIGINT)
    FROM o GROUP BY 2
    UNION ALL
    SELECT 'events_mor_pre', event_type, CAST(count(*) AS BIGINT),
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
    FROM events GROUP BY 2
    """,
)
def merge_txn_mixed_strategies(spark, sf_dir):
    """HETEROGENEOUS multi-table transaction (plans/txn.py, round 15):
    one saga spans a copy-on-write leg (orders) and a merge-on-read leg
    (events) — each applied, compensated, and snapshot-read through its
    own strategy's primitives. The fixture runs a FAILING transaction
    first (its landed MoR sequence must be unpublished by
    ``rollback_last_mor`` — any residue applies the 1.2 update twice
    and shifts events_mor), then the succeeding one. Output legs:
    post-txn state of both tables (events via ``read_mor``, orders via
    the live read) plus the PRE-transaction boundary of both via
    ``read_transaction_snapshot(at='pre')`` (events rewound to the base
    sequence, orders time-traveled to version 0) — the oracle
    recomputes all four closed-form, so a mixed-strategy snapshot that
    mixes boundaries fails the hash. At 100 TB: the hot high-churn
    table runs MoR (O(feed) applies), its dimensions stay CoW, and one
    upstream transaction still lands all-or-nothing across both."""
    from ..plans.txn import read_transaction_snapshot
    from ..sources.tables import read_dir

    root = txn_mixed_fixture(spark, sf_dir)
    cow = os.path.join(root, "orders")
    mor_t = os.path.join(root, "events")
    with open(os.path.join(root, "txn.json")) as f:
        seq = json.load(f)["txn_seq"]
    ev_cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    o_cents = F.floor(
        F.col("o_totalprice") * 100 + F.lit(0.5)
    ).cast("long")

    def agg(df, tbl, grp, cents):
        return df.groupBy(F.col(grp).alias("grp")).agg(
            F.count("*").alias("n"), F.sum(cents).alias("sum_cents")
        ).select(F.lit(tbl).alias("tbl"), "grp", "n", "sum_cents")

    post_ev = agg(
        read_mor(spark, mor_t), "events_mor", "event_type", ev_cents
    )
    post_o = agg(
        read_dir(spark, cow), "orders_cow_post", "o_orderpriority", o_cents
    )
    pre = read_transaction_snapshot(spark, root, seq, at="pre")
    pre_ev = agg(pre[mor_t], "events_mor_pre", "event_type", ev_cents)
    pre_o = agg(pre[cow], "orders_cow", "o_orderpriority", o_cents)
    return post_ev.unionByName(post_o).unionByName(pre_ev).unionByName(
        pre_o
    )


@register(
    "stream_mor_auto_maintain",
    oracle="""
    WITH latest AS (
      SELECT user_id, event_type, value FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id
          ORDER BY event_id % 6 DESC, ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT 'decision' AS metric, 'b1' AS grp,
           CAST(1 AS BIGINT) AS n, CAST(0 AS BIGINT) AS v
    UNION ALL SELECT 'decision', 'b2', 2, 0
    UNION ALL SELECT 'decision', 'b3', 3, 1
    UNION ALL SELECT 'decision', 'b4', 1, 0
    UNION ALL SELECT 'decision', 'b5', 2, 0
    UNION ALL
    SELECT 'state', event_type, CAST(count(*) AS BIGINT),
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
    FROM latest WHERE event_type <> 'error' GROUP BY 2
    """,
)
def stream_mor_auto_maintain(spark, sf_dir):
    """CONTINUOUS CDC apply with the overlay bounded BY POLICY, end to
    end from a stream: six time-ordered micro-batches (event_id % 6
    slices) land on a merge-on-read serving table via foreachBatch —
    batch 0 bootstraps, every later batch is one O(batch) MERGE — and
    after each merge the SAME foreachBatch calls ``auto_compact_mor``
    (depth-2 policy, manifest-metadata decision, zero jobs when it
    declines). The oracle predicts the WHOLE decision sequence: depths
    1, 2 decline; depth 3 triggers the compaction (resetting the
    overlay); depths 1, 2 of the regrown overlay decline again — plus
    the final served state closed-form (per-user winner = max (batch,
    ts, event_id); 'error' deletes the key). A missed compaction, a
    spurious one, or a compaction that corrupted the overlay shifts a
    hardcoded decision row or a state aggregate. This is the unattended
    100 TB shape: apply cost O(feed) forever, read tax bounded by
    policy, no human in the maintenance loop. CoW relative:
    stream_auto_maintenance (fragmentation-triggered scoped OPTIMIZE)."""
    from ..operators.materialize import latest_by_key
    from ..plans.mor import auto_compact_mor
    from ..streaming.pipeline import EVENTS_RAW
    from .streaming_q import drain_or_raise

    def build(root: str) -> None:
        feed_root = os.path.join(root, "feed")
        state_root = os.path.join(root, "state")
        dec_path = os.path.join(root, "decisions.json")
        ev = spark.read.schema(EVENTS_RAW).parquet(
            os.path.join(sf_dir, "events.parquet")
        )
        write_feed_batches_by(
            feed_root, ev, F.col("event_id") % 6, 6
        )

        stream = (
            spark.readStream.schema(EVENTS_RAW)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(feed_root)
        )

        def apply_batch(batch_df, batch_id):
            chg = latest_by_key(
                batch_df, ["user_id"], ["ts", "event_id"]
            ).select(
                "user_id",
                "value",
                "event_id",
                "event_type",
                (F.col("event_type") == "error").alias("is_delete"),
            )
            if not os.path.exists(
                os.path.join(state_root, ".mor", "manifest.json")
            ):
                import shutil

                shutil.rmtree(state_root, ignore_errors=True)
                init_mor(
                    spark, state_root,
                    chg.filter(~F.col("is_delete")).drop("is_delete"),
                    keys=["user_id"], partition_col="event_type",
                )
                return
            merge_into_mor(spark, state_root, chg)
            rep = auto_compact_mor(
                spark, state_root, max_overlay_depth=2
            )
            # retry-idempotent decision log: keyed by batch id, atomic
            # rewrite (a retried batch overwrites its own entry)
            decisions = {}
            if os.path.exists(dec_path):
                with open(dec_path) as f:
                    decisions = json.load(f)
            decisions[f"b{batch_id}"] = {
                "overlay_depth": rep["overlay_depth"],
                "triggered": rep["triggered"],
            }
            tmp = dec_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(decisions, f)
            os.replace(tmp, dec_path)

        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        drain_or_raise(q, 300, "stream_mor_auto_maintain")
        with open(dec_path) as f:
            decisions = json.load(f)
        assert [decisions[f"b{i}"]["triggered"] for i in range(1, 6)] == [
            False, False, True, False, False
        ], decisions
        assert [s["seq"] for s in mor_history(state_root)] == [4, 5]

    root = session_fixture("stream_mor_auto", sf_dir, "slice6_depth2", build)
    with open(os.path.join(root, "decisions.json")) as f:
        decisions = json.load(f)
    dec_rows = local_rows(spark,
        [
            ("decision", k, d["overlay_depth"], int(d["triggered"]))
            for k, d in sorted(decisions.items())
        ],
        "metric string, grp string, n bigint, v bigint",
    )
    served = read_mor(spark, os.path.join(root, "state"))
    state = served.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        ).alias("v"),
    ).select(
        F.lit("state").alias("metric"),
        F.col("event_type").alias("grp"), "n", "v",
    )
    return dec_rows.unionByName(state)
