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


# ---------------------------------------------------------------------------
# Round 12: the remaining TPC-H correlated-subquery shapes (Q2, Q11, Q15,
# Q16, Q20, Q21), adapted to this star schema (no partsupp table — lineitem
# doubles as the part×supplier fact; no commit/receipt dates — "late" is
# ship > order + 60d, matching the Q4 analog). Every query is written the
# way Catalyst DECORRELATES the classical correlated form: per-key
# aggregates joined back, 1-row scalar aggregates broadcast-cross-joined,
# EXISTS/NOT EXISTS folded into conditional aggregates — shapes that
# shuffle once on the natural key and survive 100 TB. The oracles keep the
# correlated SQL where DuckDB accepts it, documenting the equivalence.
# ---------------------------------------------------------------------------


@register(
    "min_cost_supplier_region",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    ), cand AS (
      SELECT p_partkey, p_name, s_name, n_name, unit_cost, s_suppkey
      FROM cost
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
      JOIN part     ON l_partkey = p_partkey
                   AND p_size >= 40 AND p_type = 'STANDARD'
    )
    SELECT p_partkey, p_name, s_name, n_name,
           floor((unit_cost) * 100 + 0.5) / 100 AS unit_cost
    FROM cand
    QUALIFY row_number()
      OVER (PARTITION BY p_partkey ORDER BY unit_cost, s_suppkey) = 1
    """,
)
def min_cost_supplier_region(spark, sf_dir):
    """TPC-H Q2 shape: for each qualifying part, the EUROPE supplier with
    the minimum unit cost — the classical correlated MIN subquery
    (``cost = (SELECT min(..) WHERE same part)``), decorrelated into a
    per-(part, supplier) aggregate + row_number() pick. ``min`` (not avg)
    keeps the cost bit-identical across engines regardless of aggregation
    order; the suppkey tiebreak makes the argmin deterministic under
    exact cost ties. nation/region are fixed-cardinality dims →
    broadcast; the part×supplier aggregate shuffles once on its own key.
    Reference analog: per-entity latest/extremum selection over the CDC
    state the reference materializes (SURVEY §2 C27)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_size") >= 40) & (F.col("p_type") == "STANDARD")
    )
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    from pyspark.sql import Window

    eur = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    cand = cost.join(eur, cost.l_suppkey == eur.s_suppkey).join(
        part, cost.l_partkey == part.p_partkey
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("unit_cost").asc(), F.col("s_suppkey").asc()
    )
    return (
        cand.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            rn(F.col("unit_cost"), 2).alias("unit_cost"),
        )
    )


@register(
    "nation_value_share",
    oracle="""
    WITH nv AS (
      SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
      GROUP BY 1
    )
    SELECT l_partkey, floor((val) * 100 + 0.5) / 100 AS part_value
    FROM nv
    WHERE val > 0.001 * (SELECT sum(val) FROM nv)
    """,
)
def nation_value_share(spark, sf_dir):
    """TPC-H Q11 shape: per-part value shipped by one nation's suppliers,
    kept only where it exceeds a FRACTION OF THE NATION-WIDE TOTAL — the
    uncorrelated scalar-subquery-in-HAVING pattern. The total is a 1-row
    re-aggregate of the already-shuffled per-part values,
    broadcast-cross-joined (no driver round-trip, no second scan of the
    fact). One key shuffle total."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nv = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val")
        )
    )
    total = nv.agg(F.sum("val").alias("__total"))
    return (
        nv.crossJoin(F.broadcast(total))
        .filter(F.col("val") > 0.001 * F.col("__total"))
        .select("l_partkey", rn(F.col("val"), 2).alias("part_value"))
    )


@register(
    "top_revenue_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name,
           floor((total_rev) * 100 + 0.5) / 100 AS total_rev
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def top_revenue_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals the
    global maximum — scalar MAX subquery over a derived aggregate.
    Decorrelated as a 1-row max broadcast-cross-joined back into the
    per-supplier aggregate (NOT a global window: an unpartitioned window
    would funnel every supplier row through one task). The equality is
    exact within an engine because max returns one of the sum values
    bit-for-bit."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("__mx"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", rn(F.col("total_rev"), 2).alias("total_rev"))
    )


@register(
    "part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type <> 'PROMO' AND p_size <= 25
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def part_supplier_counts(spark, sf_dir):
    """TPC-H Q16 shape: distinct supplier count per part attribute group,
    with a NOT IN supplier exclusion (negative balance standing in for
    the spec's complaint filter) — NOT IN over a non-nullable key is a
    left-anti join, which Spark executes as a broadcast anti join here
    because the exclusion list is a filtered dim. Group count is bounded
    by the brand × type × size attribute domain, not by data volume."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & (F.col("p_size") <= 25)
    )
    excl = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(excl, li.l_suppkey == excl.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "dominant_part_supplier",
    oracle="""
    WITH q AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      JOIN part ON l_partkey = p_partkey AND p_name LIKE 'small%'
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM q
      WHERE qty > 0.5 * (SELECT sum(qty) FROM q q2
                         WHERE q2.l_partkey = q.l_partkey)
    )
    """,
)
def dominant_part_supplier(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who shipped MORE THAN HALF of a small
    part's 1997 volume — a correlated aggregate threshold inside a nested
    IN. The oracle keeps the correlated form; the Spark plan is its
    decorrelation: per-(part, supplier) quantities, a per-part window
    total over those aggregates (O(parts×suppliers) rows, already
    reduced), threshold filter, then a semi join into supplier.
    Quantities are small integers stored as doubles, so the window sum is
    exact — the 0.5× comparison cannot flip across engines."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    q = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    tot = F.sum("qty").over(Window.partitionBy("l_partkey"))
    dom = q.withColumn("__tot", tot).filter(F.col("qty") > 0.5 * F.col("__tot"))
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    return (
        supp.join(dom, supp.s_suppkey == dom.l_suppkey, "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


@register(
    "sole_late_supplier",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE
               WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
               THEN l_suppkey END) AS n_late,
             min(CASE
               WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
               THEN l_suppkey END) AS late_supp
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
      GROUP BY 1
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM per_order JOIN supplier ON late_supp = s_suppkey
    WHERE n_supp >= 2 AND n_late = 1
    GROUP BY 1
    """,
)
def sole_late_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    finished multi-supplier order — classically one EXISTS (another
    supplier on the order) plus one NOT EXISTS (another LATE supplier).
    Both folded into conditional aggregates over a single per-order pass:
    distinct-supplier count, distinct-late-supplier count, and the blamed
    suppkey via min-over-a-CASE (exact, since n_late = 1 pins it). One
    shuffle on orderkey, one on suppkey — no self-joins of the fact
    against itself. 'Late' is ship > order + 60d, the same derived
    lateness the Q4 analog uses (schema has no commit/receipt dates)."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.date_add(
        F.col("o_orderdate").cast("date"), 60
    ).cast("timestamp")
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.min(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
    )
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(supp, F.col("late_supp") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
