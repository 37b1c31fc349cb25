"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``pulsar_cdc_experiment_spark``; this module only
adapts the engine's query registry to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    from pulsar_cdc_experiment_spark import registry

    registry.load_all_query_modules()
    return registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: CDC-fed star-join revenue.

    Exercises the vertical slice: parquet scan → broadcast star join →
    hash aggregate (SURVEY.md §7 minimum end-to-end slice).
    """
    reg = _registry()
    return reg.QUERIES["join_revenue_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 — the
    VALUE-CHECKED surface only.

    Round-14 policy (round-13 verdict #1): the driver's correctness
    sample is the repo's only hard external signal, so it should never
    contain a non-bug ``err`` row. The handful of by-design rows-only
    queries (ANN recall, approximate aggregates, watermark-dependent
    streaming — engine-specific results no ANSI-SQL oracle can
    reproduce) are therefore NOT exposed here; they remain registered
    first-class queries, exercised by ``tools/parity.py`` (full
    registry, recorded per-round in PARITY_r{N}.json) and by dedicated
    pytest assertions, and every one has an oracle-backed sibling that
    IS exposed: ``_portable`` twins for the hash-dependent similarity
    queries, and (round 15) in-query accuracy-band / invariant twins
    for the approximate aggregates and the watermark late-drop
    (``approx_distinct_bounds``, ``approx_quantiles_bounds``,
    ``stream_late_drop_counts``) — so every SURVEY §2 operator is on
    this hard signal. See ``registry.rows_only_queries()`` for the
    list and per-name rationale."""
    reg = _registry()
    return {n: fn for n, fn in reg.QUERIES.items() if n in reg.ORACLES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query — covers every key that
    ``queries()`` exposes (the rows-only tier is parity/pytest-only)."""
    return dict(_registry().ORACLES)
