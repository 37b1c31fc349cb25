"""Physical-plan shape assertions — the scale contract, enforced.

These tests pin the plan properties SCALE.md claims: filter pushdown,
column pruning, dim broadcast, TakeOrderedAndProject for top-k, partial
aggregation, and absence of pathological double-evaluation. A regression
here is a performance bug even if results stay correct.
"""

from __future__ import annotations

import re

import __spark_entry__ as entry_mod


def plan_of(spark, name, sf_dir):
    df = entry_mod.queries()[name](spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = plan_of(spark, "filter_predicates", sf_dir)
    assert "PushedFilters: [" in plan
    # range predicates on l_shipdate reach the parquet reader
    assert re.search(r"PushedFilters:.*l_shipdate", plan)
    # projection pruned: l_extendedprice is not in this query's columns
    m = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert m and "l_extendedprice" not in m.group(1)


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = plan_of(spark, "join_revenue_by_nation", sf_dir)
    # customer/nation/region arrive via BroadcastExchange, not shuffle
    assert plan.count("BroadcastHashJoin") >= 3
    # the fact table is never exchanged for the join at this SF
    assert "SortMergeJoin" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(spark, "top_k", sf_dir)
    assert "TakeOrderedAndProject" in plan
    # no global Sort node — per-partition heaps only
    assert "Sort [" not in plan.split("TakeOrderedAndProject")[0]


def test_aggregate_is_partial_then_final(spark, sf_dir):
    plan = plan_of(spark, "pricing_summary", sf_dir)
    assert "partial_" in plan  # map-side combine before the shuffle
    # exactly ONE shuffle: the keyed aggregation itself (formatted explain
    # lists each node once in the tree and once in the details section)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_enrichment_is_shuffle_free(spark):
    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.operators.enrichment import enrich
    from pulsar_cdc_experiment_spark.sources.cdc import parse_envelopes

    from .fixtures_cdc import sample_json_lines

    raw = spark.createDataFrame([(s,) for s in sample_json_lines()], ["value"])
    out = enrich(parse_envelopes(raw).drop("_raw"))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan  # stateless map: no shuffle anywhere


def test_shingle_pipeline_not_double_evaluated(spark, sf_dir):
    """The InferFiltersFromGenerate exclusion holds: no scan-level Filter
    containing the inlined tokenizer (the 7x regression shape)."""
    plan = plan_of(spark, "dedup_minhash_lsh", sf_dir)
    for line in plan.splitlines():
        if "Filter" in line and "regexp_replace" in line and "transform" in line:
            raise AssertionError(f"re-inlined generator filter: {line[:200]}")


def test_e2e_parses_json_exactly_twice(spark):
    """Regression guard for NOTES.md failure mode 1: cdc_enrich_e2e's two
    JSON parses (input envelope, output parse-back) must stay materialized
    in their own projections. If Catalyst ever inlines them per reference
    (~30x and ~14x), the optimized plan would show dozens of from_json
    calls and the query would slow ~20x."""
    from pulsar_cdc_experiment_spark.registry import (
        QUERIES,
        load_all_query_modules,
    )

    load_all_query_modules()
    df = QUERIES["cdc_enrich_e2e"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("from_json") == 2


def test_bloom_filters_skip_row_groups(spark):
    """plans/bloom.py evidence: on a hash-scrambled layout (row-group
    min/max stats span the full key domain — stats pruning impossible), a
    point lookup against the bloom-indexed copy reads ~one row group
    while the bloom-less twin reads the whole file; and the footer carries
    blooms ONLY for the enabled column."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.plans.bloom import (
        bloom_columns,
        scan_output_rows,
        write_with_bloom,
    )

    n = 500_000
    df = (
        spark.range(n)
        .select(F.col("id").alias("user_id"), (F.col("id") % 7).alias("v"))
        .repartition(1)
        .sortWithinPartitions(F.xxhash64(F.col("user_id")))
    )
    base = tempfile.mkdtemp(prefix="bloom_skip_")
    with_bloom = os.path.join(base, "bloom")
    without = os.path.join(base, "plain")
    write_with_bloom(
        df, with_bloom, ["user_id"], expected_ndv=n, block_size_bytes=256 * 1024
    )
    df.write.option("parquet.block.size", 256 * 1024).mode("overwrite").parquet(
        without
    )

    cols = bloom_columns(spark, with_bloom)
    assert cols == {"user_id": True, "v": False}
    assert bloom_columns(spark, without) == {"user_id": False, "v": False}

    # round-6 ADVICE: an empty directory raises a descriptive error,
    # not IndexError
    empty = os.path.join(base, "empty")
    os.makedirs(empty)
    import pytest

    with pytest.raises(FileNotFoundError, match="no parquet data files"):
        bloom_columns(spark, empty)

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:

        def lookup_rows(path):
            d = spark.read.parquet(path).filter(F.col("user_id") == 123_457)
            assert d.count() == 1
            d.collect()
            return scan_output_rows(d)

        pruned, full = lookup_rows(with_bloom), lookup_rows(without)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert full == n  # stats could not prune the scrambled layout
    assert pruned < n / 10  # blooms skipped the row groups without the key


def test_dpp_prunes_fact_partitions(spark, sf_dir):
    """dpp_partitioned_join's plan carries the runtime pruning expression
    on the fact scan (the partitions to read come from the dim-side
    subquery, not a literal), and the scanned row count equals the two
    surviving partitions — not the table."""
    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.queries.layout_q import dpp_partitioned_join
    from pulsar_cdc_experiment_spark.sources.tables import table as t

    df = dpp_partitioned_join(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruningexpression" in plan.lower()
    assert "PartitionFilters" in plan
    got = {r["event_type"]: r["n"] for r in df.collect()}
    ev = t(spark, sf_dir, "events")
    want = {
        r["event_type"]: r["n"]
        for r in ev.filter(
            F.col("event_type").isin("signup", "purchase")
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_optimize_table_builds_bloom_indexes(spark, sf_dir):
    """OPTIMIZE with bloom_cols: the clustered rewrite carries bloom
    filters on the requested columns (one pass — the maintenance job that
    restores Z-order also rebuilds the point-lookup sketches), and the
    rewritten table is value-identical."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.functions.time import epoch_micros
    from pulsar_cdc_experiment_spark.plans.bloom import bloom_columns
    from pulsar_cdc_experiment_spark.plans.layout import optimize_table
    from pulsar_cdc_experiment_spark.sources.tables import table

    ev = (
        table(spark, sf_dir, "events")
        .withColumn("__tsu", epoch_micros(F.col("ts")))
    )
    src = tempfile.mkdtemp(prefix="opt_bloom_src_")
    dst = os.path.join(tempfile.mkdtemp(prefix="opt_bloom_dst_"), "t")
    ev.repartition(8).write.mode("overwrite").parquet(src)
    report = optimize_table(
        spark,
        src,
        dst,
        zorder_cols=["user_id", "__tsu"],
        bloom_cols=["event_id", "user_id"],
        bloom_ndv=4000,
    )
    assert report["bloom_cols"] == ["event_id", "user_id"]
    blooms = bloom_columns(spark, dst)
    # event_id is unique → chunks abandon dictionary encoding → bloom
    # written; user_id at test SF is low-cardinality → fully
    # dictionary-encoded → parquet-java SKIPS the bloom (the dictionary
    # itself gives the reader the equivalent row-group skip). Requesting
    # a bloom there is harmless; relying on one would be a bug.
    assert blooms["event_id"] is True
    assert blooms["user_id"] is False
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0


def test_nested_schema_pruning_on_envelopes(spark, sf_dir):
    """Selecting two leaves of the typed Debezium envelope must prune the
    parquet ReadSchema to those leaves — nested column pruning
    (spark.sql.optimizer.nestedSchemaPruning, on by default) is what
    keeps envelope analytics from reading every row image at 100 TB."""
    import tempfile

    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.queries.cdc import synthesize_envelopes
    from pulsar_cdc_experiment_spark.schemas import envelope_schema
    from pulsar_cdc_experiment_spark.sources.cdc import parse_envelopes

    raw = synthesize_envelopes(spark, sf_dir)
    typed = parse_envelopes(raw).drop("_raw", "value")
    d = tempfile.mkdtemp(prefix="nested_prune_")
    typed.write.mode("overwrite").parquet(d)

    df = spark.read.schema(typed.schema).parquet(d).select(
        F.col("source.table").alias("tbl"), F.col("after.id").alias("row_id")
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    # only the selected leaves survive into the scan schema
    assert "table" in rs and "id" in rs
    assert "email" not in rs and "lsn" not in rs and "snapshot" not in rs


def test_optimize_partitions_rewrites_only_fragmented(spark, sf_dir):
    """Partition-scoped incremental OPTIMIZE (plans/layout.py):
    fragmented partitions compact below the threshold with content
    preserved; healthy partitions are BYTE-UNTOUCHED (identical file
    names and sizes) — the property that makes maintenance cost
    proportional to fragmentation, not table size."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.plans.layout import optimize_partitions
    from pulsar_cdc_experiment_spark.sources.tables import table

    root = tempfile.mkdtemp(prefix="incr_opt_")
    ev = table(spark, sf_dir, "events")
    for t, shape in (("click", 24), ("view", 2)):
        part = ev.filter(F.col("event_type") == t).drop("event_type")
        (part.repartition(shape) if shape > 2 else part.coalesce(shape)).write.mode(
            "overwrite"
        ).parquet(os.path.join(root, f"event_type={t}"))

    def listing(p):
        return {
            f: os.path.getsize(os.path.join(root, p, f))
            for f in os.listdir(os.path.join(root, p))
            if f.startswith("part-")
        }

    before_healthy = listing("event_type=view")
    n_click = spark.read.parquet(os.path.join(root, "event_type=click")).count()

    report = optimize_partitions(spark, root, frag_threshold_files=8)

    assert report["event_type=click"]["rewritten"] is True
    assert report["event_type=click"]["files_before"] == 24
    assert report["event_type=click"]["files_after"] <= 8
    # coalesce(2) writes <=2 files depending on upstream partitions
    n_healthy = len(before_healthy)
    assert report["event_type=view"] == {
        "files_before": n_healthy, "files_after": n_healthy, "rewritten": False,
    }
    # healthy partition byte-untouched
    assert listing("event_type=view") == before_healthy
    # fragmented partition content preserved
    assert (
        spark.read.parquet(os.path.join(root, "event_type=click")).count()
        == n_click
    )
    # no staging/aside leftovers
    assert not [d for d in os.listdir(root) if d.startswith(".opt_")]


def test_optimize_partitions_recovers_from_crash_between_renames(spark, sf_dir):
    """Crash-window recovery: a leftover hidden aside dir whose live
    partition vanished (crash between old→aside and staged→live) is the
    only complete copy — the next run restores it before maintaining.
    Hidden naming also keeps BOTH crash windows invisible to partition
    discovery (no duplicated or bogus-valued partitions in reads)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.plans.layout import optimize_partitions
    from pulsar_cdc_experiment_spark.sources.tables import table

    root = tempfile.mkdtemp(prefix="incr_opt_crash_")
    ev = table(spark, sf_dir, "events")
    for t, parts in (("click", 12), ("view", 1)):
        sub = ev.filter(F.col("event_type") == t).drop("event_type")
        (sub.repartition(parts) if parts > 1 else sub.coalesce(1)).write.mode(
            "overwrite"
        ).parquet(os.path.join(root, f"event_type={t}"))
    n_click = spark.read.parquet(os.path.join(root, "event_type=click")).count()
    n_view = spark.read.parquet(os.path.join(root, "event_type=view")).count()
    # simulate the crash: click's live dir moved aside, staged/live missing
    os.rename(
        os.path.join(root, "event_type=click"),
        os.path.join(root, ".opt_old_event_type=click"),
    )
    # reads see that partition as absent — NOT half-written, duplicated,
    # or resurfacing under a bogus partition value
    assert spark.read.parquet(root).count() == n_view

    report = optimize_partitions(spark, root, frag_threshold_files=8)
    assert report["event_type=click"]["rewritten"] is True  # restored, compacted
    assert spark.read.parquet(root).count() == n_click + n_view
    assert not [d for d in os.listdir(root) if d.startswith(".opt_")]
