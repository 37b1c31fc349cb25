"""Extended relational shapes: subqueries, pivot, having, percentiles.

TPC-H-derived query shapes (Q4/Q10/Q17/Q18 analogs adapted to the test
star schema's columns) plus pivot and distribution analytics — the depth
dimension of SURVEY.md §2 Tier C.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.rounding import rn
from ..registry import register
from ..sources.tables import table


@register(
    "late_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def late_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS subquery → left-semi join with a non-equi
    residual condition (ship > order date + 60d)."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(orders.o_orderdate.cast("date"), 60).cast("timestamp")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_late_orders"))


@register(
    "small_qty_revenue",
    oracle="""
    SELECT floor((sum(l_extendedprice) / 7.0) * 100 + 0.5) / 100 AS avg_yearly
    FROM lineitem l
    JOIN (SELECT l_partkey AS pk, 0.5 * avg(l_quantity) AS half_avg_qty
          FROM lineitem GROUP BY l_partkey) t ON l.l_partkey = t.pk
    WHERE l.l_quantity < t.half_avg_qty
    """,
)
def small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery decorrelated into a
    per-key aggregate join (what Catalyst does to the correlated form)."""
    li = table(spark, sf_dir, "lineitem")
    half_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(half_avg, li.l_partkey == half_avg.pk)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(rn(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "returned_revenue_by_customer",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def returned_revenue_by_customer(spark, sf_dir):
    """TPC-H Q10 shape: lost-revenue ranking of customers with returns."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            rn(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "large_volume_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate,
           floor((t.total_qty) * 100 + 0.5) / 100 AS total_qty
    FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) t
    JOIN orders ON o_orderkey = t.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def large_volume_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING on an aggregate, joined back to dimensions."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            rn(F.col("total_qty"), 2).alias("total_qty"),
        )
    )


@register(
    "pivot_status_by_flag",
    oracle="""
    SELECT l_returnflag,
           floor((sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)) * 100 + 0.5) / 100 AS F,
           floor((sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)) * 100 + 0.5) / 100 AS O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status_by_flag(spark, sf_dir):
    """Pivot: linestatus columns per returnflag row (conditional-agg oracle
    is the exact relational semantics of pivot)."""
    li = table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
    )
    return out.select("l_returnflag", rn(F.col("F"), 2).alias("F"), rn(F.col("O"), 2).alias("O"))


@register(
    "order_value_deciles",
    oracle="""
    SELECT decile, CAST(count(*) AS BIGINT) AS n_orders,
           floor((min(o_totalprice)) * 100 + 0.5) / 100 AS min_price,
           floor((max(o_totalprice)) * 100 + 0.5) / 100 AS max_price
    FROM (SELECT o_totalprice,
                 CAST(ntile(10) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS INTEGER) AS decile
          FROM orders)
    GROUP BY decile
    """,
)
def order_value_deciles(spark, sf_dir):
    """C12 (ntile): order-value decile boundaries.

    NOT a bare ``Window.orderBy`` + ntile — that funnels every order through
    one task. ``global_ntile`` reproduces NTILE's exact assignment with a
    bucketed two-phase rank (operators/ranking.py): approx boundaries →
    balanced partitioned window → offset fix-up. Bit-identical output, no
    single-partition exchange (asserted in test_scale_plans.py).
    """
    from ..operators.ranking import global_ntile

    orders = table(spark, sf_dir, "orders")
    tiled = global_ntile(
        orders.select("o_totalprice", "o_orderkey"),
        "o_totalprice",
        ["o_orderkey"],
        n=10,
    )
    return (
        tiled.select("o_totalprice", F.col("__tile").alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_orders"),
            rn(F.min("o_totalprice"), 2).alias("min_price"),
            rn(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@register(
    "price_percentiles",
    oracle="""
    SELECT o_orderpriority,
           floor((median(o_totalprice)) * 10000 + 0.5) / 10000 AS median_price,
           floor((quantile_cont(o_totalprice, 0.9)) * 10000 + 0.5) / 10000 AS p90_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def price_percentiles(spark, sf_dir):
    """Exact continuous percentiles (median/p90) — both engines use the
    same linear-interpolation definition over sorted values."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        rn(F.median("o_totalprice"), 4).alias("median_price"),
        rn(F.percentile("o_totalprice", 0.9), 4).alias("p90_price"),
    )


@register(
    "promo_revenue_share",
    oracle="""
    SELECT floor((100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
                  / sum(l_extendedprice * (1 - l_discount))) * 10000 + 0.5) / 10000 AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional-aggregate ratio (promo revenue share)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            rn(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_share_pct")
        )
    )


@register(
    "disjunctive_filter_revenue",
    oracle="""
    SELECT floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_type = 'PROMO' AND l_discount >= 0.05)
    """,
)
def disjunctive_filter_revenue(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs predicates spanning both join sides —
    the optimizer must keep the join predicate and evaluate the residual."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(part, part.p_partkey == li.l_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | ((F.col("p_type") == "PROMO") & (F.col("l_discount") >= 0.05))
    )
    return j.filter(cond).agg(
        rn(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "volume_shipping",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name IN ('NATION_1', 'NATION_2') AND sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name <> sn.n_name
    GROUP BY cn.n_name, sn.n_name, year(l_shipdate)
    """,
)
def volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: the same dimension joined twice under different
    roles (customer nation vs supplier nation) with a cross-role predicate."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    nations = ("NATION_1", "NATION_2")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(
            F.col("cust_nation").isin(*nations)
            & F.col("supp_nation").isin(*nations)
            & (F.col("cust_nation") != F.col("supp_nation"))
        )
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            rn(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("volume")
        )
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS orders_90d,
           floor((sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100 AS spend_90d
    FROM orders
    """,
)
def window_range_frame(spark, sf_dir):
    """C14 (RANGE frame): trailing-90-day rolling count/spend per customer —
    value-based frames (all peers with equal order-date share a frame),
    unlike the ROWS frames in window_running_frame."""
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        # parquet ms timestamps arrive as TIMESTAMP_NTZ: cast to (UTC)
        # TIMESTAMP first, then to epoch seconds for the numeric RANGE frame
        .orderBy(F.unix_seconds(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-90 * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).alias("orders_90d"),
        rn(F.sum("o_totalprice").over(w), 2).alias("spend_90d"),
    )


@register(
    "unpivot_metrics",
    oracle="""
    SELECT metric, floor((sum(val)) * 100 + 0.5) / 100 AS total,
           floor((avg(val)) * 1000000 + 0.5) / 1000000 AS mean
    FROM (
      SELECT l_quantity AS qty, l_discount AS disc, l_tax AS tax FROM lineitem
    ) UNPIVOT (val FOR metric IN (qty, disc, tax))
    GROUP BY metric
    """,
)
def unpivot_metrics(spark, sf_dir):
    """Unpivot/melt (the inverse of pivot): wide metric columns → long
    (metric, value) rows, then per-metric aggregates."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("qty"),
        F.col("l_discount").alias("disc"),
        F.col("l_tax").alias("tax"),
    )
    long = li.unpivot([], ["qty", "disc", "tax"], "metric", "val")
    return long.groupBy("metric").agg(
        rn(F.sum("val"), 2).alias("total"),
        rn(F.avg("val"), 6).alias("mean"),
    )


@register(
    "customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
      FROM customer LEFT JOIN orders
        ON o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
    FROM per_cust GROUP BY n_orders
    """,
)
def customer_order_distribution(spark, sf_dir):
    """Q13 pattern: two-level aggregation — per-customer order counts via a
    filtered LEFT join (count(col) skips nulls, so no-order customers are
    the 0 bucket), then the distribution of those counts. Second aggregate
    is tiny; the only real shuffle is the first group-by."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@register(
    "time_grain_rollup",
    oracle="""
    SELECT CAST(year(l_shipdate) AS INTEGER) AS y,
           CAST(month(l_shipdate) AS INTEGER) AS m,
           CAST(grouping(year(l_shipdate)) AS INTEGER) AS g_y,
           CAST(grouping(month(l_shipdate)) AS INTEGER) AS g_m,
           CAST(count(*) AS BIGINT) AS n_items,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue
    FROM lineitem
    GROUP BY ROLLUP (year(l_shipdate), month(l_shipdate))
    """,
)
def time_grain_rollup(spark, sf_dir):
    """Hypertable-style time-hierarchy rollup: revenue at month, year, and
    grand-total grains in ONE pass (ROLLUP computes all grains from the
    same partial aggregates — at 100 TB this halves the cost of
    maintaining per-grain tables separately)."""
    li = table(spark, sf_dir, "lineitem")
    y = F.year("l_shipdate").alias("y")
    m = F.month("l_shipdate").alias("m")
    return (
        li.select(y, m, (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        .rollup("y", "m")
        .agg(
            F.grouping("y").cast("int").alias("g_y"),
            F.grouping("m").cast("int").alias("g_m"),
            F.count("*").alias("n_items"),
            rn(F.sum("rev"), 2).alias("revenue"),
        )
        .select("y", "m", "g_y", "g_m", "n_items", "revenue")
    )


@register(
    "local_supplier_revenue",
    oracle="""
    SELECT n_name,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def local_supplier_revenue(spark, sf_dir):
    """TPC-H Q5 analog (local supplier volume): revenue per nation from
    orders where the customer and the line's supplier share a nation, for
    one region and one order-year — the canonical 6-table star join.
    Plan shape at 100 TB: lineitem⋈orders⋈customer are the fact joins
    (sort-merge on their keys); supplier/nation/region are
    fixed-cardinality dims AQE broadcasts from measured size (no pinned
    hints); the s_nationkey = c_nationkey equality rides the supplier
    join as a residual condition. Filters on region name and order date
    push below every join."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
    )
    return j.groupBy("n_name").agg(
        rn(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@register(
    "nation_market_share",
    oracle="""
    WITH market AS (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN part     ON l_partkey = p_partkey
      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           floor((sum(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END)
                  / sum(volume)) * 1000000 + 0.5) / 1000000 AS mkt_share
    FROM market GROUP BY o_year
    """,
)
def nation_market_share(spark, sf_dir):
    """TPC-H Q8 analog (national market share): NATION_7's share of the
    EUROPE market's revenue in ECONOMY parts, per order year — the
    8-table join with a conditional-aggregate ratio. The share divides
    two sums of the SAME scan (one pass, no self-join); nation joins
    twice under different roles (customer's nation gates the market,
    supplier's nation feeds the share), which the planner handles as two
    independent broadcast dims."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cn = table(spark, sf_dir, "nation").alias("cn")
    sn = table(spark, sf_dir, "nation").alias("sn")
    r = table(spark, sf_dir, "region")
    p = table(spark, sf_dir, "part")
    m = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cn, c.c_nationkey == F.col("cn.n_nationkey"))
        .join(r, F.col("cn.n_regionkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(sn, s.s_nationkey == F.col("sn.n_nationkey"))
        .join(p, li.l_partkey == p.p_partkey)
        .filter((F.col("r_name") == "EUROPE") & (F.col("p_type") == "ECONOMY"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            F.col("sn.n_name").alias("supp_nation"),
        )
    )
    share = F.sum(
        F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(0.0)
    ) / F.sum("volume")
    return m.groupBy("o_year").agg(rn(share, 6).alias("mkt_share"))


@register("hll_partial_merge")  # rows-only BY DESIGN: estimates are
# Datasketches-HLL-specific values no SQL oracle reproduces; the
# correctness claim is the MERGE IDENTITY, asserted in-plan (consistent
# column) and cross-checked against exact counts in tests/test_registry.py
def hll_partial_merge(spark, sf_dir):
    """Mergeable-sketch cardinality (the pre-aggregation pattern exact
    count-distinct cannot give): per-day HLL sketches of user_id, then a
    lossless sketch UNION across days, estimated once — compared in the
    same plan against the direct whole-table sketch. At 100 TB this is
    why sketches beat exact distinct for dashboards: daily partials are
    tiny (lgK=12 → ~4 KB), any date-range cardinality is a union of
    partials (no rescan), and the union is associative so partials roll
    up along whatever hierarchy the layout has. ``consistent`` is TRUE by
    the HLL union identity (same lgK, same implementation); the absolute
    accuracy vs exact count is pinned in tests (±5% at lgK=12)."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count("*").alias("n_days"),
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias(
            "direct_est"
        )
    )
    return merged.crossJoin(direct).select(
        "n_days",
        "est",
        "direct_est",
        (F.col("est") == F.col("direct_est")).alias("consistent"),
    )


@register(
    "interval_shipping_pressure",
    oracle="""
    SELECT o.o_orderkey,
           CAST(count(*) AS BIGINT) AS n_in_window,
           CAST(sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_cents
    FROM orders o
    JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
    WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 300000
    GROUP BY o.o_orderkey
    """,
)
def interval_shipping_pressure(spark, sf_dir):
    """Pure interval-containment join — NO equi key — solved at scale by
    bin bucketing (operators/intervals.interval_join_binned): how much
    shipping volume (any order's lineitems) moved during each urgent
    high-value order's first week. The predicate
    ``l_shipdate ∈ [o_orderdate, o_orderdate+7d)`` has nothing to hash
    on, so Spark's native plan is BroadcastNestedLoopJoin —
    O(|points|·|intervals|) and a non-starter when the interval side is
    data-proportional. Bucketing points into 7-day bins and exploding
    each interval into its ≤2 touched bins turns it into ONE equi-join
    shuffle + exact post-filter; the plan is asserted BNLJ-free
    (tests/test_scale_plans.py) and the operator is proven
    pair-for-pair identical to the naive theta join
    (tests/test_relational_ext... test in test_scale_plans). Oracle: the
    plain range-predicate join in SQL. Integer-cents quantity keeps the
    aggregate hash-exact."""
    from ..operators.intervals import MICROS_PER_DAY, interval_join_binned

    li = table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_quantity"
    )
    iv = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 300000)
        )
        .select(
            "o_orderkey",
            "o_orderdate",
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("__o_end"),
        )
    )
    joined = interval_join_binned(
        li, iv, "l_shipdate", "o_orderdate", "__o_end", 7 * MICROS_PER_DAY
    )
    return joined.groupBy("o_orderkey").agg(
        F.count("*").alias("n_in_window"),
        F.sum(F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")).alias(
            "sum_qty_cents"
        ),
    )


@register(
    "interval_mixed_widths",
    oracle="""
    SELECT o.o_orderkey,
           CAST(CASE WHEN o.o_orderpriority = '5-LOW' THEN 30 ELSE 2 END AS BIGINT) AS window_days,
           CAST(count(*) AS BIGINT) AS n_in_window,
           CAST(sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_cents
    FROM orders o
    JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate
         + (CASE WHEN o.o_orderpriority = '5-LOW' THEN 30 ELSE 2 END) * INTERVAL 1 DAY
    WHERE o.o_totalprice > 400000 AND l.l_quantity > 45
    GROUP BY o.o_orderkey, o.o_orderpriority
    """,
)
def interval_mixed_widths(spark, sf_dir):
    """Keyless containment join with MIXED interval widths (round-8
    generalization of operators/intervals.interval_join_binned): each
    high-value order watches bulk shipments (quantity > 45) for a
    priority-dependent window — 2 days normally, 30 days for the rare
    low-priority long tail (~20% of intervals). Under the round-7
    operator the 30-day class would force bin_micros = 30 days for the
    WHOLE join, putting every point's candidate set at a month of
    traffic — measured 4.9x the true matches; with ``max_bins`` the bin
    tracks the TYPICAL width (2 days) and only the long intervals
    explode (≤16 bins each) — candidate pairs stay 1.15x matches,
    stable across sf0.001/sf0.01 (measured in tests/test_scale_plans.py
    ::test_interval_mixed_widths_candidate_ratio). Plan remains ONE
    equi-join shuffle, BNLJ-free (same assertion), and the operator
    stays pair-for-pair identical to the naive theta join. Oracle: the
    plain range-predicate join with a CASE window length.

    Reference analog: cdc_enrichment_function.py:60-66 routes by event
    time; heterogeneous maintenance/promo/incident windows are the
    interval dimension a real deployment joins against."""
    from ..operators.intervals import MICROS_PER_DAY, interval_join_binned

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45).select(
        "l_shipdate", "l_quantity"
    )
    window_days = (
        F.when(F.col("o_orderpriority") == "5-LOW", 30)
        .otherwise(2)
        .cast("long")
    )
    iv = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(
            "o_orderkey",
            "o_orderdate",
            window_days.alias("window_days"),
            (
                F.col("o_orderdate")
                + F.make_dt_interval(days=window_days)
            ).alias("__o_end"),
        )
    )
    joined = interval_join_binned(
        li,
        iv,
        "l_shipdate",
        "o_orderdate",
        "__o_end",
        2 * MICROS_PER_DAY,
        max_bins=16,
    )
    return joined.groupBy("o_orderkey", "window_days").agg(
        F.count("*").alias("n_in_window"),
        F.sum(F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")).alias(
            "sum_qty_cents"
        ),
    )


@register(
    "interval_overlap_windows",
    oracle="""
    WITH a AS (
      SELECT o_orderkey AS a_key, o_orderdate AS a_start,
             o_orderdate + INTERVAL 7 DAY AS a_end
      FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 350000
    ), b AS (
      SELECT o_orderkey AS b_key, o_orderdate AS b_start,
             o_orderdate + INTERVAL 14 DAY AS b_end
      FROM orders
      WHERE o_orderpriority = '2-HIGH' AND o_totalprice > 350000
    )
    SELECT a.a_key,
           CAST(count(*) AS BIGINT) AS n_overlaps,
           CAST(sum(epoch_us(least(a.a_end, b.b_end))
                    - epoch_us(greatest(a.a_start, b.b_start))) AS BIGINT)
             AS sum_overlap_micros
    FROM a JOIN b
      ON a.a_start < b.b_end AND b.b_start < a.a_end
    GROUP BY a.a_key
    """,
)
def interval_overlap_windows(spark, sf_dir):
    """Interval×interval OVERLAP join — NO equi key on either side
    (round 8, operators/intervals.interval_overlap_join_binned): for
    each urgent high-value order's 7-day window, every high-priority
    order whose 14-day window overlaps it, aggregated to overlap count
    and total overlap duration (exact integer micros). The naive plan
    is again BroadcastNestedLoopJoin; binning both interval sides and
    keeping each pair's FIRST shared bin makes it ONE equi-join shuffle
    with in-plan exactly-once dedup — no distinct pass (plan- and
    pair-for-pair-asserted in tests/test_scale_plans.py::
    test_interval_overlap_join_matches_theta). This is the uptime/
    conflict/co-occurrence join shape (incident windows × deploy
    windows, promo periods × maintenance) at 100 TB.

    Reference analog: cdc_enrichment_function.py:60-66 routes by event
    time; overlapping operational windows are the two-sided version."""
    from ..functions.time import epoch_micros
    from ..operators.intervals import (
        MICROS_PER_DAY,
        interval_overlap_join_binned,
    )

    orders = table(spark, sf_dir, "orders")
    a = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 350000)
    ).select(
        F.col("o_orderkey").alias("a_key"),
        F.col("o_orderdate").alias("a_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("a_end"),
    )
    b = orders.filter(
        (F.col("o_orderpriority") == "2-HIGH")
        & (F.col("o_totalprice") > 350000)
    ).select(
        F.col("o_orderkey").alias("b_key"),
        F.col("o_orderdate").alias("b_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 14 DAYS")).alias("b_end"),
    )
    joined = interval_overlap_join_binned(
        a, b, "a_start", "a_end", "b_start", "b_end",
        7 * MICROS_PER_DAY, max_bins=3,
    )
    overlap_us = epoch_micros(
        F.least(F.col("a_end"), F.col("b_end"))
    ) - epoch_micros(F.greatest(F.col("a_start"), F.col("b_start")))
    return joined.groupBy("a_key").agg(
        F.count("*").alias("n_overlaps"),
        F.sum(overlap_us).alias("sum_overlap_micros"),
    )


@register(
    "entity_resolution_customers",
    oracle="""
    WITH RECURSIVE dirty AS (
      SELECT c_custkey AS rec_id, c_name AS name, c_nationkey AS nat,
             c_acctbal AS bal
      FROM customer
      UNION ALL
      SELECT c_custkey + 1000000, replace(c_name, 'Customer#', 'Customer #'),
             c_nationkey, c_acctbal
      FROM customer WHERE c_custkey % 37 = 5
      UNION ALL
      SELECT c_custkey + 2000000, replace(c_name, 'Customer#', 'Custmer#'),
             c_nationkey, c_acctbal * 0.5
      FROM customer WHERE c_custkey % 53 = 11
    ), blocked AS (
      SELECT *, nat || '|' || substr(name, length(name) - 5, 6) AS blk
      FROM dirty
    ), pairs AS (
      SELECT a.rec_id AS ia, b.rec_id AS ib
      FROM blocked a JOIN blocked b
        ON a.blk = b.blk AND a.rec_id < b.rec_id
      WHERE levenshtein(a.name, b.name) <= 2
    ), edges AS (
      SELECT ia AS u, ib AS v FROM pairs UNION SELECT ib, ia FROM pairs
    ), reach AS (
      SELECT rec_id AS id, rec_id AS r FROM dirty
      UNION
      SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v
    ), comp AS (
      SELECT id, CAST(min(r) AS BIGINT) AS component FROM reach GROUP BY id
    )
    SELECT component, CAST(count(*) AS BIGINT) AS n_records,
           min(name) AS canonical_name,
           CAST(max(floor(bal * 100 + 0.5)) AS BIGINT) AS best_cents
    FROM dirty JOIN comp ON dirty.rec_id = comp.id
    GROUP BY component
    HAVING count(*) >= 2
    """,
)
def entity_resolution_customers(spark, sf_dir):
    """Entity resolution / record linkage: blocking → pairwise edit
    distance → connected components → survivorship — the classic ER
    pipeline over a deterministically dirtied customer registry (two
    perturbation families: an inserted space and a dropped letter, one
    of them also halving the balance so survivorship has something to
    decide). Blocking key = (nation, last-6 name chars): candidate
    pairs are generated ONLY within blocks — the O(n²) all-pairs trap
    never appears, and at 100 TB the block join is one shuffle whose
    fan-in is bounded by block size (same discipline as the LSH band
    join, operators/dedup.py). Clustering is iterative min-label
    propagation (operators/components.py, sanctioned convergence
    counts); the oracle recomputes the same fixpoint with a recursive
    CTE. Output: multi-record clusters with canonical name (min) and
    best balance (max) — the survivorship rule made explicit."""
    from ..operators.components import dedup_survivors

    cust = table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("rec_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_acctbal").alias("bal"),
    )
    dup1 = (
        cust.filter(F.col("c_custkey") % 37 == 5)
        .select(
            (F.col("c_custkey") + 1000000).alias("rec_id"),
            F.regexp_replace("c_name", "Customer#", "Customer #").alias(
                "name"
            ),
            F.col("c_nationkey").alias("nat"),
            F.col("c_acctbal").alias("bal"),
        )
    )
    dup2 = (
        cust.filter(F.col("c_custkey") % 53 == 11)
        .select(
            (F.col("c_custkey") + 2000000).alias("rec_id"),
            F.regexp_replace("c_name", "Customer#", "Custmer#").alias(
                "name"
            ),
            F.col("c_nationkey").alias("nat"),
            (F.col("c_acctbal") * 0.5).alias("bal"),
        )
    )
    dirty = base.unionByName(dup1).unionByName(dup2)
    blocked = dirty.withColumn(
        "blk",
        F.concat(
            F.col("nat").cast("string"),
            F.lit("|"),
            F.substring(F.col("name"), -6, 6),
        ),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.rec_id") < F.col("b.rec_id")),
        )
        .filter(F.levenshtein(F.col("a.name"), F.col("b.name")) <= 2)
        .select(
            F.col("a.rec_id").alias("id_a"), F.col("b.rec_id").alias("id_b")
        )
    )
    comp = dedup_survivors(dirty, pairs, "rec_id")
    return (
        dirty.join(comp.select("rec_id", "component"), "rec_id")
        .groupBy("component")
        .agg(
            F.count("*").alias("n_records"),
            F.min("name").alias("canonical_name"),
            F.max(
                F.floor(F.col("bal") * 100 + F.lit(0.5)).cast("long")
            ).alias("best_cents"),
        )
        .filter(F.col("n_records") >= 2)
    )


@register(
    "analyze_table_stats",
    oracle="""
    SELECT 'l_quantity' AS col,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(l_quantity) AS BIGINT) AS n_nonnull,
           CAST(count(DISTINCT l_quantity) AS BIGINT) AS ndv,
           CAST(floor(min(l_quantity) * 100 + 0.5) AS BIGINT) AS min_cents,
           CAST(floor(max(l_quantity) * 100 + 0.5) AS BIGINT) AS max_cents
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', CAST(count(*) AS BIGINT),
           CAST(count(l_discount) AS BIGINT),
           CAST(count(DISTINCT l_discount) AS BIGINT),
           CAST(floor(min(l_discount) * 100 + 0.5) AS BIGINT),
           CAST(floor(max(l_discount) * 100 + 0.5) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', CAST(count(*) AS BIGINT),
           CAST(count(l_tax) AS BIGINT),
           CAST(count(DISTINCT l_tax) AS BIGINT),
           CAST(floor(min(l_tax) * 100 + 0.5) AS BIGINT),
           CAST(floor(max(l_tax) * 100 + 0.5) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', CAST(count(*) AS BIGINT),
           CAST(count(l_extendedprice) AS BIGINT),
           CAST(count(DISTINCT l_extendedprice) AS BIGINT),
           CAST(floor(min(l_extendedprice) * 100 + 0.5) AS BIGINT),
           CAST(floor(max(l_extendedprice) * 100 + 0.5) AS BIGINT)
    FROM lineitem
    """,
)
def analyze_table_stats(spark, sf_dir):
    """ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS — the CBO
    stats-collection verb, computed in ONE scan of the fact table for
    all requested columns (per-column aggregates fan out map-side; a
    per-column loop would re-scan the 100 TB table once per column).
    Exact NDV via count(DISTINCT) is the correctness baseline the
    oracle can check; the scale path swaps each to
    approx_count_distinct (HLL, one pass, mergeable — see
    approx_distinct / hll_partial_merge) without changing the plan
    shape. Spark's multi-distinct rewrite (expand + two-level agg)
    keeps this a single scan even with 4 distinct aggregates; output is
    unpivoted to one row per column so downstream optimizers can join
    stats by column name."""
    li = table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_discount", "l_tax", "l_extendedprice"]
    stats = li.agg(
        *[
            a
            for c in cols
            for a in [
                F.count("*").alias(f"__n_{c}"),
                F.count(c).alias(f"__nn_{c}"),
                F.countDistinct(c).alias(f"__ndv_{c}"),
                F.floor(F.min(c) * 100 + F.lit(0.5))
                .cast("long")
                .alias(f"__mn_{c}"),
                F.floor(F.max(c) * 100 + F.lit(0.5))
                .cast("long")
                .alias(f"__mx_{c}"),
            ]
        ]
    )
    # unpivot the single stats row to one row per column (stack keeps
    # this driver-free: the 1×(5·k) aggregate row explodes JVM-side)
    parts = ", ".join(
        f"'{c}', __n_{c}, __nn_{c}, __ndv_{c}, __mn_{c}, __mx_{c}"
        for c in cols
    )
    return stats.selectExpr(
        f"stack({len(cols)}, {parts}) AS "
        "(col, n_rows, n_nonnull, ndv, min_cents, max_cents)"
    )


@register(
    "join_lateral_topn",
    oracle="""
    SELECT n.n_name, t.c_custkey, t.cents
    FROM nation n, LATERAL (
      SELECT c_custkey,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey ASC
      LIMIT 2
    ) t
    """,
)
def join_lateral_topn(spark, sf_dir):
    """LATERAL correlated subquery (Spark 3.2+ SQL surface): top-2
    customers by balance PER NATION via a correlated ordered-limit —
    DuckDB runs the identical LATERAL text as the oracle. Catalyst
    decorrelates this into the same window/top-k shape a hand-written
    ``row_number() <= 2`` produces (no per-row re-execution — the
    lateral is a rewrite target, not a nested loop), so the declarative
    form costs one partitioned sort like ``order_value_deciles``.
    Registered alongside the window formulation family to pin that the
    decorrelation agrees row-for-row at the dense-tie boundary
    (deterministic c_custkey tiebreak). Reference analog: none —
    SURVEY §2 tier C (C6/C12 composition)."""
    nation = table(spark, sf_dir, "nation")
    customer = table(spark, sf_dir, "customer")
    nation.createOrReplaceTempView("__lat_nation")
    customer.createOrReplaceTempView("__lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.cents
        FROM __lat_nation n, LATERAL (
          SELECT c_custkey,
                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
          FROM __lat_customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey ASC
          LIMIT 2
        ) t
        """
    )
