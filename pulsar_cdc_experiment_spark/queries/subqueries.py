"""Subquery-shaped relational queries: scalar, correlated-EXISTS, and
correlated-scalar-per-group (the TPC-H Q22/Q4/Q17 patterns).

These close out the SQL surface a reference user would expect from an
analytics engine: DuckDB expresses them as subqueries; the Spark plans are
the decorrelated joins Catalyst itself would produce — written directly so
the plan shape is explicit and broadcast hints land where the table sizes
warrant them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.rounding import rn
from ..registry import register
from ..sources.tables import table


@register(
    "dormant_high_balance",
    oracle="""
    SELECT c_custkey, c_name,
           floor((c_acctbal) * 100 + 0.5) / 100 AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= DATE '2000-06-01')
    """,
)
def dormant_high_balance(spark, sf_dir):
    """Q22 pattern: scalar subquery (global avg of positive balances) +
    anti join (no recent orders). The scalar is a 1-row broadcast cross
    join — no driver round-trip, works identically at 100 TB."""
    cust = table(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("__avg_bal"))
    )
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", rn(F.col("c_acctbal"), 2).alias("acctbal"))
    )


@register(
    "late_shipment_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def late_shipment_priority(spark, sf_dir):
    """Q4 pattern: correlated EXISTS with an inequality on both tables'
    columns — decorrelated to a left-semi join with a composite condition
    (equi key + range), which Spark executes as sort-merge-semi with the
    range as a post-join filter."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > F.date_add(orders.o_orderdate, 60)
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey AS pk, avg(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_small,
           floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS small_revenue
    FROM lineitem
    JOIN part_avg ON l_partkey = pk
    JOIN part ON l_partkey = p_partkey
    WHERE l_quantity < 0.5 * avg_qty
    GROUP BY p_brand
    """,
)
def small_quantity_revenue(spark, sf_dir):
    """Q17 pattern: correlated scalar-per-group subquery (per-part average
    quantity) decorrelated into an aggregate-then-join. Both joins key on
    l_partkey, so the per-part aggregate reuses the same hash partitioning
    as the part join — one logical shuffle family, no row explosion."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(part_avg, li.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_small"),
            rn(F.sum("l_extendedprice"), 2).alias("small_revenue"),
        )
    )
