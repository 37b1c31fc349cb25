"""Scalar-subquery relational queries (the TPC-H Q22 pattern).

Correlated EXISTS (Q4) and correlated-scalar-per-group (Q17) live in
queries/relational_ext.py; this module adds the remaining subquery shape —
an uncorrelated SCALAR subquery feeding a filter — decorrelated the way
Catalyst does it: a 1-row aggregate broadcast-cross-joined into the outer
plan, so there is no driver round-trip and the shape survives 100 TB.
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
