"""Layout-maintenance driver queries: table optimization as a user-facing
operator, not internal machinery.

The reference routes each table to its own topic/partition layout so
consumers read only what they ask for (reference docs/setup-guide.md:33-35,
topic-per-table routing). Generalized to an analytics table, the same idea
is multi-column data clustering: lay the table out so that predicates on
ANY clustered column touch a fraction of the files. ``plans/layout.py``
implements the mechanisms (compaction, range layout, Morton/Z-order);
this module registers the queries that exercise them end-to-end —
layout job, clustered readback, slab predicates — with full DuckDB
oracles over the ORIGINAL table (a layout pass must never change query
results, only query cost).

Scale note: the layout build is a real Spark job by design — that is the
operator (Delta/Iceberg ``OPTIMIZE ZORDER BY`` is the same shape). At
100 TB the build runs on a maintenance schedule and queries only probe
the clustered table; here the registered query performs build + probe in
one call so the driver exercises the full cycle against a fresh layout
every time (it is therefore sanctioned in the build-jobs gate's
allowlist, tests/test_scale_plans.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.rounding import rn
from ..functions.time import epoch_micros
from ..plans.layout import zorder_layout
from ..registry import register
from ..sources.tables import local_rows, read_dir, table
from .fixture_cache import session_fixture

# fixed event-type domain of the testdata generator (TESTDATA.md); unknown
# types cluster past the known range rather than colliding with it
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _etype_code():
    code = F.when(F.col("event_type") == EVENT_TYPES[0], F.lit(0))
    for i, t in enumerate(EVENT_TYPES[1:], start=1):
        code = code.when(F.col("event_type") == t, F.lit(i))
    return code.otherwise(F.lit(len(EVENT_TYPES)))


def zorder_events_layout(
    spark, sf_dir: str, files: int = 16, bits: int = 10
) -> str:
    """Write a Z-order-clustered copy of ``events``, interleaving the
    event-type code with the event-time micros — the 2-D locality layout
    whose files each own a small (type, time) hyper-rectangle, so both a
    type-slab and a time-slab predicate prune at the file/row-group level
    (plans/layout.zorder_layout has the Morton mechanics). Returns the
    layout directory; the clustering helper columns ``__etc``/``__tsu``
    are retained so per-file min/max bounds are directly inspectable.
    The layout is built once per (sf_dir, params) per session and reused
    (fixture_cache) — repeated invocations run the probe only."""

    def build(dst: str) -> None:
        ev = table(spark, sf_dir, "events")
        lay = ev.withColumn("__etc", _etype_code()).withColumn(
            "__tsu", epoch_micros(F.col("ts"))
        )
        zorder_layout(lay, dst, ["__etc", "__tsu"], files=files, bits=bits)

    return session_fixture(
        "zorder_events", sf_dir, f"f{files}_b{bits}_v1", build
    )


_SLAB_LO = "2024-01-10 00:00:00"
_SLAB_HI = "2024-01-13 00:00:00"


@register(
    "zorder_events_slabs",
    oracle=f"""
    SELECT 'type_slab' AS dim, strftime(ts, '%Y-%m-%d') AS k,
           CAST(count(*) AS BIGINT) AS n,
           floor((sum(value)) * 100 + 0.5) / 100 AS sum_value
    FROM events WHERE event_type = 'purchase' GROUP BY 2
    UNION ALL
    SELECT 'time_slab' AS dim, event_type AS k,
           CAST(count(*) AS BIGINT) AS n,
           floor((sum(value)) * 100 + 0.5) / 100 AS sum_value
    FROM events
    WHERE ts >= TIMESTAMP '{_SLAB_LO}' AND ts < TIMESTAMP '{_SLAB_HI}'
    GROUP BY 2
    """,
)
def zorder_events_slabs(spark, sf_dir):
    """Z-order layout cycle, value-checked end-to-end: cluster ``events``
    on (event_type, ts), then answer a slab query on EACH clustered
    dimension from the laid-out table — per-day purchase totals (type
    slab) and per-type totals over a 3-day window (time slab). The oracle
    runs on the ORIGINAL table: identical results prove the layout is
    content-preserving, and the per-file bounds test
    (tests/test_scale_plans.py::test_zorder_events_layout_prunes_both_dimensions)
    proves both predicates prune. Reference analog: topic-per-table
    layout routing (docs/setup-guide.md:33-35) generalized to
    multi-column locality."""
    zev = read_dir(spark, zorder_events_layout(spark, sf_dir))
    type_slab = (
        zev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("k"))
        .agg(F.count("*").alias("n"), rn(F.sum("value"), 2).alias("sum_value"))
        .select(F.lit("type_slab").alias("dim"), "k", "n", "sum_value")
    )
    time_slab = (
        zev.filter(
            (F.col("ts") >= F.lit(_SLAB_LO).cast("timestamp_ntz"))
            & (F.col("ts") < F.lit(_SLAB_HI).cast("timestamp_ntz"))
        )
        .groupBy(F.col("event_type").alias("k"))
        .agg(F.count("*").alias("n"), rn(F.sum("value"), 2).alias("sum_value"))
        .select(F.lit("time_slab").alias("dim"), "k", "n", "sum_value")
    )
    return type_slab.unionByName(time_slab)


@register(
    "table_maintenance_report",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents,
           min(ts) AS min_ts, max(ts) AS max_ts,
           TRUE AS compacted, TRUE AS stats_consistent
    FROM events
    """,
)
def table_maintenance_report(spark, sf_dir):
    """The user-facing OPTIMIZE verb end-to-end, value-checked: fragment
    ``events`` into 64 small files (a streaming sink's typical output),
    run plans/layout.optimize_table (compaction to the byte-derived file
    count + Z-order on (event_type code, ts micros) + footer-stats
    refresh), then report from the OPTIMIZED table:

    - content facts (row count, user count, value cents, ts range) whose
      oracle runs on the ORIGINAL table — maintenance must be
      value-preserving;
    - ``compacted``: the rewrite reduced the file count (64 fragments →
      byte-derived target; TRUE for any sf whose events table is under
      ~16 GB, i.e. every driver sf);
    - ``stats_consistent``: the metadata-only footer stats the report
      carries equal the min/max recomputed from the data — the refresh
      told the truth.

    Reference analog: the maintenance jobs a topic-compacted CDC landing
    zone needs once feeds become tables (docs/setup-guide.md:33-35 routes
    per-table topics; this is the table-side equivalent). The layout
    build runs at construction by design — sanctioned in the build-jobs
    gate like zorder_events_slabs — and is cached per session
    (fixture_cache; the OPTIMIZE report is persisted alongside the
    layout so reuse returns the identical DataFrame)."""
    import json
    import os

    from ..plans.layout import optimize_table

    def build(root: str) -> None:
        ev = (
            table(spark, sf_dir, "events")
            .withColumn("__etc", _etype_code())
            .withColumn("__tsu", epoch_micros(F.col("ts")))
        )
        frag = os.path.join(root, "frag")
        ev.repartition(64).write.mode("overwrite").parquet(frag)
        report = optimize_table(
            spark,
            frag,
            os.path.join(root, "opt", "events"),
            zorder_cols=["__etc", "__tsu"],
            target_mb=256,
        )
        with open(os.path.join(root, "report.json"), "w") as f:
            json.dump(report, f)

    root = session_fixture("maint_optimize", sf_dir, "frag64_v1", build)
    opt = os.path.join(root, "opt", "events")
    with open(os.path.join(root, "report.json")) as f:
        report = json.load(f)
    stats = report["stats"]
    out = read_dir(spark, opt)
    return out.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "sum_value_cents"
        ),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.lit(report["files_after"] < report["files_before"]).alias("compacted"),
        (
            (F.min("__tsu") == F.lit(stats["__tsu_min"]))
            & (F.max("__tsu") == F.lit(stats["__tsu_max"]))
            & (F.min("__etc") == F.lit(stats["__etc_min"]))
            & (F.max("__etc") == F.lit(stats["__etc_max"]))
        ).alias("stats_consistent"),
    )


@register(
    "bloom_point_lookup",
    oracle="""
    SELECT event_id, event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents, ts
    FROM events WHERE event_id = 777
    """,
)
def bloom_point_lookup(spark, sf_dir):
    """Secondary-index point lookup via NATIVE parquet bloom filters
    (plans/bloom.py): lay ``events`` out hash-scrambled on event_id (so
    row-group min/max stats are useless — every row group spans the whole
    key domain, the worst case a time- or Z-clustered table presents to a
    key lookup), with blooms on event_id; then fetch event 777 from the
    laid-out copy. The reader consults the blooms for the pushed equality
    filter and skips row groups without the key (measured 122x in
    tests/test_plans.py); results are EXACT regardless (bloom false
    positives add row-group reads, never rows). The bloom column must be
    HIGH-CARDINALITY: parquet-java skips blooms for fully
    dictionary-encoded chunks, where the reader's dictionary filtering
    already provides the equivalent row-group skip (the event_id/user_id
    contrast is pinned in test_optimize_table_builds_bloom_indexes).
    Oracle runs on the original table: the layout + sketch must be
    value-preserving. Build-at-construction is the fixture, sanctioned
    like the other layout queries and session-cached (fixture_cache)."""
    from ..plans.bloom import write_with_bloom

    def build(dst_dir: str) -> None:
        ev = table(spark, sf_dir, "events")
        scrambled = ev.repartition(4, F.col("event_id")).sortWithinPartitions(
            F.xxhash64(F.col("event_id"))
        )
        write_with_bloom(
            scrambled,
            dst_dir,
            ["event_id"],
            expected_ndv=30000,
            block_size_bytes=256 * 1024,
        )

    dst = session_fixture("bloom_events", sf_dir, "eid_ndv30k_v1", build)
    return (
        read_dir(spark, dst)
        .filter(F.col("event_id") == 777)
        .select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("value_cents"),
            "ts",
        )
    )


#: the fixed event-type dimension for the DPP demo: category is the
#: NON-partition attribute the filter lands on, so only runtime pruning
#: (not static partition elimination) can skip the fact partitions
EVENT_DIM = [
    ("signup", "conversion"),
    ("purchase", "conversion"),
    ("view", "browse"),
    ("click", "browse"),
    ("error", "ops"),
]


@register(
    "dpp_partitioned_join",
    oracle="""
    SELECT event_type, 'conversion' AS category,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM events WHERE event_type IN ('signup', 'purchase')
    GROUP BY 1
    """,
)
def dpp_partitioned_join(spark, sf_dir):
    """Dynamic partition pruning end-to-end: ``events`` written
    PARTITIONED BY event_type (the directory layout a 100 TB fact table
    ships with), joined to a category dimension filtered on a
    NON-partition attribute — so the partitions to scan are only known at
    runtime, after the dim side evaluates. Spark injects
    ``dynamicpruningexpression(event_type IN dynamicpruning#N)`` into the
    fact scan's PartitionFilters (asserted in
    tests/test_plans.py::test_dpp_prunes_fact_partitions): the fact scan
    reads 2 of 5 partition directories, never the whole table. This is
    the star-schema essential — static pruning covers literal predicates,
    DPP covers the join-derived ones. Oracle inlines the dim (it is a
    fixed 5-row mapping). Layout write at construction is the fixture,
    sanctioned like the other layout queries and session-cached
    (fixture_cache)."""
    import os

    def build(root_dir: str) -> None:
        ev = table(spark, sf_dir, "events")
        ev.write.partitionBy("event_type").mode("overwrite").parquet(
            os.path.join(root_dir, "events")
        )

    root = session_fixture("dpp_events", sf_dir, "ptype_v1", build)
    fact = read_dir(spark, os.path.join(root, "events"))
    dim = local_rows(spark, EVENT_DIM, "event_type string, category string")
    return (
        fact.join(dim, "event_type")
        .filter(F.col("category") == "conversion")
        .groupBy("event_type", "category")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "sum_value_cents"
            ),
        )
    )


_FRAG_TYPES = ("click", "purchase")  # the partitions the "stream" fragmented
_FRAG_THRESHOLD = 8


@register(
    "incremental_maintenance_report",
    oracle=f"""
    SELECT event_type,
           event_type IN {_FRAG_TYPES} AS rewritten,
           TRUE AS compacted,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM events GROUP BY event_type
    """,
)
def incremental_maintenance_report(spark, sf_dir):
    """Partition-scoped incremental OPTIMIZE end-to-end (the
    ``OPTIMIZE ... WHERE partition`` shape): ``events`` lands hive-
    partitioned by event_type with TWO partitions deliberately
    fragmented into 32 files each (the streaming-sink hot-partition
    pattern) and the rest healthy; ``plans/layout.optimize_partitions``
    rewrites ONLY the fragmented two — maintenance cost proportional to
    the fragmentation, not the table. Output per partition: the
    ``rewritten`` decision (oracle predicts it from the fixture keying),
    ``compacted``, and content
    facts (row count, value cents) whose oracle runs on the ORIGINAL
    table — the scoped rewrite must be value-preserving. ``compacted``
    is vacuously true for untouched partitions and means "the rewrite
    strictly reduced the file count" for rewritten ones — true whenever
    a partition's bytes fit under files_before x target_mb (32 x 256 MB
    = 8 GB/partition here, far past any driver SF; a deployment
    fragmenting bigger partitions raises the fixture constant).
    File-level no-touch identity for healthy partitions is pinned in
    tests/test_plans.py::test_optimize_partitions_rewrites_only_fragmented.
    Build-at-construction is the fixture, sanctioned + session-cached
    like the other layout queries."""
    import json
    import os

    from ..plans.layout import optimize_partitions

    def build(root: str) -> None:
        lay = os.path.join(root, "events")
        ev = table(spark, sf_dir, "events")
        for t in EVENT_TYPES:
            part = ev.filter(F.col("event_type") == t).drop("event_type")
            shape = part.repartition(32) if t in _FRAG_TYPES else part.coalesce(2)
            shape.write.mode("overwrite").parquet(
                os.path.join(lay, f"event_type={t}")
            )
        report = optimize_partitions(
            spark, lay, frag_threshold_files=_FRAG_THRESHOLD
        )
        with open(os.path.join(root, "report.json"), "w") as f:
            json.dump(report, f)

    root = session_fixture("incr_maint", sf_dir, "frag32_thr8_v1", build)
    with open(os.path.join(root, "report.json")) as f:
        report = json.load(f)
    rep_df = local_rows(spark,
        [
            (
                entry.split("=", 1)[1],
                r["rewritten"],
                (not r["rewritten"]) or r["files_after"] < r["files_before"],
            )
            for entry, r in report.items()
        ],
        "event_type string, rewritten boolean, compacted boolean",
    )
    agg = (
        read_dir(spark, os.path.join(root, "events"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "sum_value_cents"
            ),
        )
    )
    return agg.join(rep_df, "event_type").select(
        "event_type", "rewritten", "compacted", "n", "sum_value_cents"
    )


@register(
    "bucketed_join_revenue",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def bucketed_join_revenue(spark, sf_dir):
    """Sort-merge-BUCKET join as a user-facing capability: both fact
    tables pre-bucketed on the join key at write time (``bucketBy`` +
    ``sortBy`` into the session warehouse), then joined with ZERO
    exchanges — the physical plan carries SortMergeJoin with no Exchange
    on either side (plan-asserted in
    tests/test_scale_plans.py::test_bucketed_join_query_plan_has_no_exchange).
    This is the 100 TB answer for REPEATED fact-fact joins: pay the
    bucketed layout once at ingest, delete the dominant shuffle from
    every subsequent join on that key (SCALE.md "Joins"). The `merge`
    hint pins the join strategy so the assertion holds at any SF (at
    tiny SF the planner would otherwise broadcast). Per-row cents floor
    before the sum keeps the aggregate integer-exact across engines.
    Bucketed tables are catalog objects, so the fixture is a
    session_once CREATE (sanctioned in the build-jobs gate; tables land
    in the temp warehouse, mode=overwrite on rebuild)."""
    import os
    import re
    import shutil

    from .fixture_cache import session_once

    # abspath so the table name agrees with session_once's cache key (r7
    # ADVICE: a relative spelling of the same dir would skip the build
    # yet read a differently-named, nonexistent table)
    tag = re.sub(r"[^0-9a-zA-Z]", "_", os.path.abspath(sf_dir)).strip("_")
    li_t, o_t = f"bkt_lineitem_{tag}", f"bkt_orders_{tag}"

    def build() -> None:
        # the catalog is per-process but the warehouse dir persists: a
        # table absent from THIS session's catalog can still have a
        # leftover managed location from a previous process, which
        # saveAsTable refuses (LOCATION_ALREADY_EXISTS) — drop both
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        for name in (li_t, o_t):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            loc = os.path.join(warehouse.removeprefix("file:"), name.lower())
            if warehouse and os.path.isdir(loc):
                shutil.rmtree(loc, ignore_errors=True)
        table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(
            li_t, format="parquet", mode="overwrite"
        )
        table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
            o_t, format="parquet", mode="overwrite"
        )

    session_once("bucketed_join", sf_dir, "b8_v1", build)
    li, orders = spark.table(li_t), spark.table(o_t).hint("merge")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum(cents).alias("revenue_cents"))
    )
