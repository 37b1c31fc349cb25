"""Scale-machinery tests: salted joins, bucketed co-located joins,
partitioned sinks (the SCALE.md claims that have runnable local evidence)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from pulsar_cdc_experiment_spark.plans.skew import salted_join
from pulsar_cdc_experiment_spark.sources.tables import table


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = (
        li.join(orders, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(li, orders, "l_orderkey", salts=4)
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], ["k", "v"])
    right = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "w"])
    out = salted_join(left, right, "k", salts=3, how="left").collect()
    assert len(out) == 3
    assert {r["k"]: r["w"] for r in out} == {1: "x", 2: "y", 99: None}


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Pre-bucketing both sides on the join key deletes the join shuffle —
    the 100 TB answer for repeated fact-fact joins (SCALE.md)."""
    import uuid

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    suffix = uuid.uuid4().hex[:8]
    warehouse_li, warehouse_o = f"b_li_{suffix}", f"b_o_{suffix}"
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(
        warehouse_li, format="parquet", mode="overwrite"
    )
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
        warehouse_o, format="parquet", mode="overwrite"
    )
    a = spark.table(warehouse_li)
    b = spark.table(warehouse_o)
    joined = a.join(b, a.l_orderkey == b.o_orderkey).withColumn(
        "rev", F.col("l_quantity") * F.col("o_totalprice")
    )
    # disable broadcast so the planner must consider the bucketed layout
    # (at real fact-fact scale neither side broadcasts anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing co-located both sides
        # and it still computes the right thing
        assert joined.count() == table(spark, sf_dir, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partitioned_sink_routing(spark, sf_dir):
    """B6/A18: route-partitioned parquet output — one directory per route,
    the Spark face of topic-per-table."""
    ev = table(spark, sf_dir, "events")
    out = tempfile.mkdtemp(prefix="routed_")
    ev.write.partitionBy("event_type").parquet(out, mode="overwrite")
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    # partition pruning: reading one route scans only its directory
    one = back.filter(F.col("event_type") == "purchase")
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [isnotnull(event_type" in plan.replace("#", " #") or (
        "event_type" in plan.split("PartitionFilters:")[1].split("]")[0]
    )


def test_global_ntile_matches_window_ntile(spark, sf_dir):
    """operators/ranking.global_ntile is bit-identical to the naive
    ntile-over-global-ORDER-BY on real data, including the uneven-fill rule
    and n_total % n edge cases."""
    from pyspark.sql import Window

    from pulsar_cdc_experiment_spark.operators.ranking import global_ntile

    orders = table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    for n in (10, 7):
        w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
        naive = orders.select(
            "o_orderkey", F.ntile(n).over(w).alias("t")
        )
        ours = global_ntile(orders, "o_totalprice", ["o_orderkey"], n=n).select(
            "o_orderkey", F.col("__tile").alias("t")
        )
        assert naive.exceptAll(ours).count() == 0
        assert ours.exceptAll(naive).count() == 0
    # tiny-input edge: fewer rows than tiles -> tile == rank
    few = orders.limit(3)
    got = sorted(
        r["__tile"]
        for r in global_ntile(few, "o_totalprice", ["o_orderkey"], n=10).collect()
    )
    assert got == [1, 2, 3]


def test_global_rank_and_ntile_with_nulls(spark):
    """NULL order values must rank NULLS FIRST, exactly like SQL ORDER BY
    ASC (the round-3 advice: they used to fall into the LAST bucket)."""
    from pyspark.sql import Window

    from pulsar_cdc_experiment_spark.operators.ranking import (
        global_ntile,
        global_rank,
    )

    rows = [(float(i) if i % 5 else None, i) for i in range(200)]
    df = spark.createDataFrame(rows, ["v", "id"])
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())

    naive_rank = {r["id"]: r["r"] for r in df.select("id", F.row_number().over(w).alias("r")).collect()}
    ours_rank = {r["id"]: r["__rank"] for r in global_rank(df, "v", ["id"], buckets=8).collect()}
    assert ours_rank == naive_rank

    naive_tile = {r["id"]: r["t"] for r in df.select("id", F.ntile(7).over(w).alias("t")).collect()}
    ours_tile = {r["id"]: r["__tile"] for r in global_ntile(df, "v", ["id"], n=7, buckets=8).collect()}
    assert ours_tile == naive_tile


def _window_feeds_single_partition(plan: str) -> bool:
    """True if any Window node in a physical plan sits on an Exchange
    SinglePartition (the whole input sorted in ONE task)."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if line.lstrip(" +-:").startswith("Window"):
            for nxt in lines[i + 1 : i + 4]:
                if "Exchange" in nxt:
                    if "SinglePartition" in nxt:
                        return True
                    break
    return False


def test_no_registered_query_sorts_globally(spark, sf_dir):
    """Scale gate: NO registered batch query may funnel its full input
    through a single-partition Exchange into a Window (the global-sort
    scale-killer the round-1 verdict flagged). Scalar aggregates (1-row
    results) legitimately use SinglePartition exchanges and are not
    windows, so only Window-over-SinglePartition is flagged."""
    from pulsar_cdc_experiment_spark.registry import (
        QUERIES,
        load_all_query_modules,
    )

    load_all_query_modules()
    offenders = []
    for name, fn in sorted(QUERIES.items()):
        if name.startswith("stream_"):
            continue  # streaming plans are exercised in test_streaming.py
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        if _window_feeds_single_partition(plan):
            offenders.append(name)
    assert offenders == []


def test_global_ntile_empty_and_single_row(spark):
    from pyspark.sql import types as T

    from pulsar_cdc_experiment_spark.operators.ranking import global_ntile

    empty = spark.createDataFrame(
        [], T.StructType([T.StructField("v", T.DoubleType()), T.StructField("id", T.LongType())])
    )
    assert global_ntile(empty, "v", ["id"], n=10).count() == 0
    one = spark.createDataFrame([(5.0, 1)], ["v", "id"])
    assert [r["__tile"] for r in global_ntile(one, "v", ["id"], n=10).collect()] == [1]


def test_compaction_and_range_layout(spark, sf_dir):
    """Layout maintenance: a fragmented table compacts to the byte-derived
    file count with identical contents, and range layout produces disjoint
    sorted key ranges per file (the row-group pruning precondition)."""
    import glob
    import os

    from pulsar_cdc_experiment_spark.plans.layout import (
        compact_parquet,
        range_layout,
        target_file_count,
    )

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    frag = tempfile.mkdtemp(prefix="frag_")
    ev.repartition(64).write.mode("overwrite").parquet(frag)  # 64 tiny files
    assert len(glob.glob(os.path.join(frag, "part-*"))) == 64

    compacted = tempfile.mkdtemp(prefix="compacted_")
    n = compact_parquet(spark, frag, compacted, target_mb=256)
    files = glob.glob(os.path.join(compacted, "part-*"))
    assert len(files) == n  # tiny input -> 1 file
    back = spark.read.parquet(compacted)
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0

    laid = tempfile.mkdtemp(prefix="range_")
    range_layout(ev, laid, ["event_id"], files=4)
    parts = sorted(glob.glob(os.path.join(laid, "part-*")))
    assert len(parts) == 4
    # each file owns a disjoint, internally-sorted event_id range
    ranges = []
    for p in parts:
        ids = [r["event_id"] for r in spark.read.parquet(p).collect()]
        assert ids == sorted(ids)
        ranges.append((min(ids), max(ids)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2

    assert target_file_count(0) == 1
    assert target_file_count(300 * 1024 * 1024, 256) == 2


def test_ann_index_probe_is_partition_pruned(spark, sf_dir):
    """C42 scale path: a persisted write_ann_index layout (one directory
    per LSH bucket) makes the probe a PARTITION-PRUNED scan — the plan
    must carry non-empty PartitionFilters on __bucket, and the pruned
    probe must return exactly what the scan-everything lsh_topk returns
    for the same query/planes/radius."""
    from pulsar_cdc_experiment_spark.operators import similarity as S

    emb = table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    planes = S.hyperplanes(dim=len(qvec), bits=4, seed=42)

    idx = tempfile.mkdtemp(prefix="ann_idx_")
    S.write_ann_index(emb, idx, planes)

    probe = S.probe_ann_index(spark, idx, qvec, planes, k=10, multiprobe=1)
    plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "__bucket" in pf and "in (" in pf.lower(), pf
    # pruning must not change the answer
    expect = [
        (r["vec_id"], round(r["cos_sim"], 9))
        for r in S.lsh_topk(emb, qvec, planes, k=10, multiprobe=1).collect()
    ]
    got = [(r["vec_id"], round(r["cos_sim"], 9)) for r in probe.collect()]
    assert got == expect


def test_footer_stats_push_aggregates_to_parquet_metadata(spark, sf_dir):
    """plans/stats answers MIN/MAX/COUNT from parquet footers: the plan
    must show DSv2 BatchScan with non-empty PushedAggregation, and the
    values must equal a real scan's."""
    import os

    from pulsar_cdc_experiment_spark.plans import stats as ST

    path = os.path.join(sf_dir, "orders.parquet")

    with ST._dsv2_agg_pushdown(spark):
        df = spark.read.parquet(path)
        q = df.agg(F.min("o_orderkey").alias("o_orderkey_min"),
                   F.max("o_orderkey").alias("o_orderkey_max"))
        plan = q._sc._jvm.PythonSQLUtils.explainString(
            q._jdf.queryExecution(), "formatted"
        )
    assert "PushedAggregation: [MIN(o_orderkey), MAX(o_orderkey)]" in plan, plan

    got = ST.footer_min_max(spark, path, ["o_orderkey", "o_totalprice"]).collect()[0]
    full = table(spark, sf_dir, "orders").agg(
        F.min("o_orderkey"), F.max("o_orderkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).collect()[0]
    assert (got["o_orderkey_min"], got["o_orderkey_max"]) == (full[0], full[1])
    assert (got["o_totalprice_min"], got["o_totalprice_max"]) == (full[2], full[3])

    n = ST.footer_count(spark, path)
    assert n == table(spark, sf_dir, "orders").count()
