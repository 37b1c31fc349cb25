"""Parity spotlight: pytest-native oracle checks for queries the driver's
correctness sample has NEVER drawn (round-5 verdict task 4).

Across five rounds the driver sampled the same 50 names twice (86 distinct
ever); ~55 registered queries' green status rested solely on
tools/parity.py — a builder-authored tool. This module re-verifies the
most intricate of those queries with an INDEPENDENT comparator written
from scratch (value-by-value multiset equality on canonicalized rows, not
the parity tool's hash), so their correctness no longer depends on a
single audit path. Chosen set: the stateful/streaming joins, the
portable-hash dedup + ANN/IVF pipelines, the composed corpus-prep
pipelines, SCD2/multi-table CDC folds, and the gnarlier scalar suites
(XML XPath, variant JSON, arrow-native UDF).
"""

from __future__ import annotations

import datetime
import decimal
import math

import pytest

from pulsar_cdc_experiment_spark.registry import (
    ORACLES,
    QUERIES,
    load_all_query_modules,
)

load_all_query_modules()

# The intricate tier: stateful/streaming joins, portable-hash pipelines,
# composed corpus prep, CDC folds, gnarly scalar suites.
SPOTLIGHT = [
    "cdc_drift_rescue",
    "cdc_multi_table_state",
    "cdc_scd2_history",
    "corpus_decontaminate",
    "corpus_pack_bins",
    "corpus_sample_quality_weighted",
    "dedup_minhash_portable",
    "dedup_simhash_portable",
    "embed_ann_portable",
    "embed_ivf_portable",
    "json_variant_probe",
    "llm_prep_pipeline",
    "merge_upsert_composite",
    "merge_rollback_lifecycle",
    # round-14: the merge-on-read family and the saga/as-of additions,
    # independently re-verified from birth
    "merge_upsert_dv",
    "merge_dv_time_travel",
    "merge_dv_purge_compact",
    "merge_txn_snapshot_inflight",
    "asof_join_rejoin",
    "stream_mor_apply",
    # round-15: the policy-triggered MoR compaction, the predicate/
    # nullable-avg MV rewrites, and the feed-maintained-MV capstone
    "merge_dv_auto_compact",
    "mv_predicate_rewrite",
    "mv_nullable_avg_serving",
    "mv_mor_feed_capstone",
    # round-15: C10/C32 accuracy-band siblings back on the hard signal
    "approx_distinct_bounds",
    "approx_quantiles_bounds",
    "stream_late_drop_counts",
    # round-15: heterogeneous (CoW + MoR) multi-table transaction, and
    # the streaming apply with policy-bounded overlay
    "merge_txn_mixed_strategies",
    "stream_mor_auto_maintain",
    # round-15: GDPR erasure reaching the summary layer; incremental
    # IVF index append (frozen-quantizer assignment, O(new vectors))
    "mv_gdpr_scrub",
    "embed_ivf_append_portable",
    # round-16: the join-bearing MV family (rollup rewrite, OR-of-
    # conjuncts routing, fact+dim simultaneous maintenance, the MoR
    # sequence-clock catch-up) and the streaming MV maintainer —
    # independently re-verified from birth
    "mv_join_rollup_rewrite",
    "mv_disjunctive_rewrite",
    "mv_join_maintain",
    "mv_join_mor_feed",
    "stream_mv_maintain",
    "stream_join_mv_maintain",
    "mv_rollup_hierarchy_rewrite",
    "mv_grouping_cube_rewrite",
    "mv_grouping_sets_rewrite",
    # round-17: join-MV grouping constructs (pinned-manifest hierarchy/
    # cube serves), the mid-stream auto-compaction x MV catch-up
    # capstone, and the workload advisor — independently re-verified
    # from birth
    "mv_join_rollup_hierarchy_rewrite",
    "mv_join_cube_rewrite",
    "stream_mv_auto_compact",
    "mv_advisor_workload",
    "mv_approx_distinct_rewrite",
    "mv_having_rewrite",
    "mv_time_hierarchy_rewrite",
    "mv_live_serve",
    # round-18: the live grouping-construct serves (plain + star-join),
    # the staleness-policy router, the join-aware advisor capstone, and
    # the consistent multi-MV snapshot read — independently re-verified
    # from birth
    "mv_live_hierarchy_serve",
    "mv_policy_serve",
    "mv_join_live_serve",
    "mv_join_live_hierarchy_serve",
    "mv_join_advisor_workload",
    "mv_snapshot_read",
    "mv_join_policy_serve",
    # round-19: derived group keys over the join family — the fresh
    # date-grain star hierarchy and its lambda sibling
    "mv_join_time_hierarchy_rewrite",
    "mv_join_time_hierarchy_live",
    # round-19: workload-rate policy routing (rate-flipped decision)
    "mv_policy_fleet_serve",
    # round-19: maintained top-k MVs (ranked serving + live compose)
    "mv_topk_rewrite",
    "mv_topk_live",
    "multimodal_decode_real",
    "stream_dedup_against_corpus",
    "stream_ivm_join",
    "stream_ivm_minmax",
    "stream_stream_join",
    "stream_stream_left_outer",
    "stream_stream_full_outer",
    "text_pii_redact",
    "udf_map_in_arrow",
    "xml_functions",
]

# The breadth tier: EVERY remaining oracle-backed query the driver has
# never sampled (as of round 5's artifacts), so no registered query's
# correctness rests on tools/parity.py alone any more.
BREADTH = [
    "agg_bitwise",
    "analyze_table_stats",
    "agg_collect",
    "agg_regression",
    "agg_statistics",
    "agg_string_concat",
    "array_hof_functions",
    "asof_join_tolerance",
    "bloom_point_lookup",
    "merge_dv_change_feed",
    "merge_dv_describe_history",
    "mv_rollup_rewrite",
    "mv_incremental_serving",
    "bucketed_join_revenue",
    "cdc_dlq_routing",
    "cdc_incremental_agg",
    "cdc_merge_apply",
    "cdc_snapshot_diff",
    "cdc_snapshot_patch",
    "cdc_table_filter",
    "conditional_nulls",
    "content_digests",
    "corpus_chunk_tokens",
    "corpus_dedup_segments",
    "corpus_sample_token_budget",
    "corpus_split_leakage_safe",
    "entity_resolution_customers",
    "cube_orders",
    "customer_order_distribution",
    "date_functions2",
    "date_functions3",
    "disjunctive_filter_revenue",
    "dominant_part_supplier",
    "dpp_partitioned_join",
    "dq_events_expectations",
    "embed_quantize_int8",
    "frequent_tokens_sketch",
    "funnel_conversion",
    "graph_pagerank",
    "graph_pagerank_converged",
    "hierarchy_root_depth",
    "grouping_sets_revenue",
    "ingest_csv_events",
    "ingest_jsonl_events",
    "ingest_orc_events",
    "ingest_to_serving_pipeline",
    "incremental_maintenance_report",
    "interval_mixed_widths",
    "interval_overlap_windows",
    "interval_shipping_pressure",
    "ivm_join_delta",
    "ivm_minmax_delta",
    "join_lateral_topn",
    "json_typed_parse",
    "recursive_cte_hierarchy",
    "local_supplier_revenue",
    "math_bitwise_trig",
    "corpus_mixture_temperature",
    "merge_change_feed",
    "merge_change_feed_replay",
    "merge_describe_history",
    "merge_time_travel_read",
    "merge_purge_erasure",
    "merge_txn_multi_table",
    "merge_txn_snapshot_read",
    "merge_upsert_partitioned",
    "min_cost_supplier_region",
    "multimodal_resize",
    "multimodal_serving_pipeline",
    "nation_market_share",
    "nation_value_share",
    "part_supplier_counts",
    "promo_revenue_share",
    "safe_casts",
    "set_intersect_except",
    "set_union",
    "sole_late_supplier",
    "stream_auto_maintenance",
    "stream_cdc_incremental_agg",
    "stream_dq_expectations",
    "stream_ingest_jsonl",
    "stream_merge_apply",
    "stream_state_time_travel",
    "stream_state_vacuum",
    "stream_cdc_hetero_schemas",
    "stream_cdc_multi_table_state",
    "string_functions2",
    "string_regexp",
    "table_maintenance_report",
    "time_grain_rollup",
    "top_k",
    "top_revenue_supplier",
    "udtf_table_arg_gaps",
    "unpivot_metrics",
    "url_functions",
    "volume_shipping",
    "window_lag_lead",
    "window_nth_value",
    "window_percent_dist",
    "window_range_frame",
    "window_rank",
    "window_session_dynamic_gap",
    "window_running_frame",
    "zorder_events_slabs",
]


def _canon(v):
    """Canonical comparable form: exact for ints/strings/bools, repr for
    floats (bit-exact incl. NaN/-0.0 — the parity bar), ISO for temporals,
    recursive for arrays/maps/structs."""
    if v is None or isinstance(v, (int, str, bool)):
        return v
    if isinstance(v, float):
        return repr(v)  # bit-exact; 'nan' == 'nan' unlike float NaN
    if isinstance(v, decimal.Decimal):
        # integral decimals (HUGEINT-ish) compare as ints, else as floats
        return int(v) if v == v.to_integral_value() else repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if hasattr(v, "asDict"):  # pyspark Row (struct column)
        return tuple(sorted((k, _canon(x)) for k, x in v.asDict().items()))
    return repr(v)


def _spark_rows(df):
    from collections import Counter

    cols = sorted(df.columns)
    return (
        Counter(tuple(_canon(row[c]) for c in cols) for row in df.collect()),
        cols,
    )


def _duck_rows(con, sql):
    from collections import Counter

    rel = con.sql(sql)
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = Counter(tuple(_canon(r[i]) for i in order) for r in rel.fetchall())
    return rows, sorted(cols)


@pytest.mark.parametrize("name", SPOTLIGHT + BREADTH)
def test_spotlight_matches_oracle(spark, duck, sf_dir, name):
    assert name in QUERIES, f"{name} fell out of the registry"
    assert name in ORACLES, f"{name} lost its oracle"
    got, got_cols = _spark_rows(QUERIES[name](spark, sf_dir))
    want, want_cols = _duck_rows(duck, ORACLES[name])
    assert got_cols == want_cols, (got_cols, want_cols)
    assert sum(got.values()) == sum(want.values()), (
        sum(got.values()),
        sum(want.values()),
    )
    if got != want:
        diff_a = list((got - want).elements())[:3]
        diff_b = list((want - got).elements())[:3]
        pytest.fail(f"{name}: spark-only={diff_a} oracle-only={diff_b}")


def test_spotlight_queries_were_never_driver_sampled():
    """Keep the spotlight honest: if the driver starts sampling one of
    these, it has independent coverage and a NEW never-sampled query
    should take its slot (informational — glob the committed
    CORRECTNESS artifacts)."""
    import glob
    import json
    import os

    sampled: set[str] = set()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r0*.json")):
        sampled |= set(json.load(open(p)).keys())
    covered = set(SPOTLIGHT) | set(BREADTH)
    still_unsampled = [n for n in covered if n not in sampled]
    # all 56 were unsampled as of round 5; tolerate driver rotation
    assert len(still_unsampled) >= 30, sorted(sampled & covered)

    # the converse guarantee: every oracle-backed registered query is now
    # verified by the driver sample, by this module, or both — nothing
    # rests on tools/parity.py alone
    uncovered = [
        n for n in ORACLES if n not in sampled and n not in covered
    ]
    assert uncovered == [], uncovered
