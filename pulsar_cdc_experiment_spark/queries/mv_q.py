"""Materialized-view aggregate-navigation driver queries (plans/mv.py).

The oracle recomputes every leg DIRECTLY from the raw table — so a
rewrite that rolled up wrong (avg-of-avgs, double-counted partials),
served a stale MV, or mis-routed a non-subsumable request fails the
value hash. The ``served_from`` column VALUE-CHECKS the routing
decision itself: its value is derived from what ``answer_aggregate``
actually chose, and the oracle hardcodes what it MUST choose.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..plans.mv import answer_aggregate, create_mv
from ..registry import register
from ..sources.tables import table
from .fixture_cache import session_fixture


def _cents():
    return F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
        "long"
    ).alias("cents")


def mv_lineitem_fixture(spark, sf_dir: str) -> str:
    """A summary MV over lineitem at (l_returnflag, l_linestatus)
    granularity with sum/count/min/max partials over integer cents."""

    def build(root: str) -> None:
        src = table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_linestatus", "l_linenumber", _cents()
        )
        create_mv(
            spark, root,
            name="li_flag_status",
            source_path=os.path.join(sf_dir, "lineitem.parquet"),
            source=src,
            group_cols=["l_returnflag", "l_linestatus"],
            measures={
                "sum_cents": ("sum", "cents"),
                "n": ("count", None),
                "min_cents": ("min", "cents"),
                "max_cents": ("max", "cents"),
            },
        )

    return session_fixture("mv_lineitem", sf_dir, "flag_status_v1", build)


@register(
    "mv_rollup_rewrite",
    oracle="""
    SELECT 'mv' AS served_from, l_returnflag AS grp,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(min(floor(l_extendedprice * 100 + 0.5)) AS BIGINT)
             AS min_cents,
           CAST(max(floor(l_extendedprice * 100 + 0.5)) AS BIGINT)
             AS max_cents
    FROM lineitem GROUP BY 2
    UNION ALL
    SELECT 'base', l_linenumber, CAST(count(*) AS BIGINT),
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT),
           CAST(min(floor(l_extendedprice * 100 + 0.5)) AS BIGINT),
           CAST(max(floor(l_extendedprice * 100 + 0.5)) AS BIGINT)
    FROM lineitem GROUP BY 2
    """,
)
def mv_rollup_rewrite(spark, sf_dir):
    """Aggregate navigation (plans/mv.py): leg 1 groups by l_returnflag
    — a ROLLUP of the registered (l_returnflag, l_linestatus) MV, so the
    planner must serve it from the MV's partials (sum of sums, sum of
    counts, min/max of partials — never re-reading the fact); leg 2
    groups by l_linenumber, which no MV subsumes, and must fall back to
    the base. The ``served_from`` column carries the planner's ACTUAL
    routing (the oracle hardcodes the required one), and the values are
    recomputed straight from the raw table on the oracle side — a wrong
    rollup derivation or a stale/mis-routed plan shifts a value. At
    100 TB leg 1 reads a KB-scale summary instead of the fact; OSS
    Spark has no MV rewrite, this is the engine's aggregate-navigation
    layer (the Kimball / Calcite materialized-view-matching idea)."""
    root = mv_lineitem_fixture(spark, sf_dir)
    src = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_linenumber", _cents()
    )
    src_path = os.path.join(sf_dir, "lineitem.parquet")
    aggs = {
        "n": ("count", None),
        "sum_cents": ("sum", "cents"),
        "min_cents": ("min", "cents"),
        "max_cents": ("max", "cents"),
    }
    leg1, used1 = answer_aggregate(
        spark, root, src, src_path,
        group_cols=["l_returnflag"], aggs=aggs,
    )
    leg2, used2 = answer_aggregate(
        spark, root, src, src_path,
        group_cols=["l_linenumber"], aggs=aggs,
    )
    return leg1.select(
        F.lit("mv" if used1 == "li_flag_status" else "base").alias(
            "served_from"
        ),
        F.col("l_returnflag").alias("grp"),
        "n", "sum_cents", "min_cents", "max_cents",
    ).unionByName(
        leg2.select(
            F.lit("base" if used2 is None else "mv").alias("served_from"),
            F.col("l_linenumber").alias("grp"),
            "n", "sum_cents", "min_cents", "max_cents",
        )
    )
