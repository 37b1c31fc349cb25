"""Relational-core driver queries (SURVEY.md §2 Tier C: C1-C18, C22).

Thin, declarative DataFrame plans — Catalyst gets predicate pushdown, column
pruning, and join selection; AQE re-plans shuffles at runtime. Scale notes
per query: dims (region/nation/customer/supplier/part) are broadcast against
the lineitem/orders facts, so the only shuffles left are the keyed
aggregations themselves.

DuckDB oracle conventions (FIXTURES.md §5): identical aliases both sides,
floats rounded identically, integer sums CAST AS BIGINT (DuckDB widens to
HUGEINT), NULLS LAST made explicit where order feeds a limit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.rounding import rn
from ..registry import register
from ..sources.tables import table


@register(
    "scan_aggregate",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
           floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_price,
           floor((min(l_discount)) * 100 + 0.5) / 100 AS min_disc,
           floor((max(l_tax)) * 100 + 0.5) / 100 AS max_tax
    FROM lineitem
    """,
)
def scan_aggregate(spark, sf_dir):
    """C1: full parquet scan + ungrouped aggregate (column-pruned to 5 cols)."""
    return table(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"),
        rn(F.sum("l_quantity"), 2).alias("sum_qty"),
        rn(F.sum("l_extendedprice"), 2).alias("sum_price"),
        rn(F.min("l_discount"), 2).alias("min_disc"),
        rn(F.max("l_tax"), 2).alias("max_tax"),
    )


@register(
    "project_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS revenue,
           floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.5) / 100 AS charge,
           CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem
    """,
)
def project_arithmetic(spark, sf_dir):
    """C2: per-row projection/arithmetic — stays in whole-stage codegen."""
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rn(rev, 2).alias("revenue"),
        rn(rev * (1 + F.col("l_tax")), 2).alias("charge"),
        F.col("l_quantity").cast("long").alias("qty_int"),
    )


@register(
    "filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
      AND l_returnflag IN ('A', 'R')
    """,
)
def filter_predicates(spark, sf_dir):
    """C3: conjunctive range + BETWEEN + IN predicates, pushed to the scan."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
        & (F.col("l_returnflag").isin("A", "R"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@register(
    "join_revenue_by_nation",
    oracle="""
    SELECT r_name, n_name, floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_revenue_by_nation(spark, sf_dir):
    """C4 (flagship): star join lineitem→orders→customer→nation→region.

    Scale shape: nation/region/customer broadcast (dim side), so the fact
    table never shuffles for the joins — the single shuffle is the final
    group-by, which AQE coalesces. orders↔lineitem stays a shuffle-free
    broadcast at test SF and becomes a sort-merge join on l_orderkey at
    100 TB, which AQE picks automatically.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            rn(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           floor((coalesce(sum(o_totalprice), 0.0)) * 100 + 0.5) / 100 AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_left_outer(spark, sf_dir):
    """C5: left outer join preserving customers with zero orders."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            rn(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT coalesce(n.n_nationkey, s.s_nationkey) AS nationkey,
           n_name,
           CAST(count(s_suppkey) AS BIGINT) AS n_suppliers
    FROM nation n FULL OUTER JOIN supplier s ON n.n_nationkey = s.s_nationkey
    GROUP BY coalesce(n.n_nationkey, s.s_nationkey), n_name
    """,
)
def join_full_outer(spark, sf_dir):
    """C5: full outer join — nations without suppliers and vice versa."""
    nation = table(spark, sf_dir, "nation")
    supp = table(spark, sf_dir, "supplier")
    return (
        nation.join(supp, nation.n_nationkey == supp.s_nationkey, "full")
        .groupBy(
            F.coalesce("n_nationkey", "s_nationkey").alias("nationkey"), F.col("n_name")
        )
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers_with_orders
    FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def join_semi(spark, sf_dir):
    """C6: left-semi join (EXISTS)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers_with_orders"))
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
)
def join_anti(spark, sf_dir):
    """C6: left-anti join (NOT EXISTS) — customers with no URGENT orders.

    The restricted right side keeps the anti set NON-EMPTY at every test SF
    (every customer has some order in this data, so anti against all orders
    is trivially 0 rows — no evidence the join works; round-1 verdict)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_theta",
    oracle="""
    SELECT n_name, r_name
    FROM nation JOIN region ON n_regionkey <> r_regionkey
    """,
)
def join_theta(spark, sf_dir):
    """C7: pure non-equi (theta) join — nested-loop over broadcast side."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return nation.join(
        F.broadcast(region), nation.n_regionkey != region.r_regionkey
    ).select("n_name", "r_name")


@register(
    "join_range",
    oracle="""
    SELECT p_partkey, CAST(count(*) AS BIGINT) AS n_close_lines,
           floor((avg(l_quantity)) * 100 + 0.5) / 100 AS avg_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
                  AND l_quantity BETWEEN p_size - 5 AND p_size + 5
    GROUP BY p_partkey
    """,
)
def join_range(spark, sf_dir):
    """C7: equi + range band join (quantity within ±5 of part size)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    return (
        li.join(
            part,
            (li.l_partkey == part.p_partkey)
            & (li.l_quantity.between(part.p_size - 5, part.p_size + 5)),
        )
        .groupBy("p_partkey")
        .agg(
            F.count("*").alias("n_close_lines"),
            rn(F.avg("l_quantity"), 2).alias("avg_qty"),
        )
    )


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
           floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base_price,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS sum_disc_price,
           floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100 + 0.5) / 100 AS sum_charge,
           floor((avg(l_quantity)) * 100 + 0.5) / 100 AS avg_qty,
           floor((avg(l_extendedprice)) * 100 + 0.5) / 100 AS avg_price,
           floor((avg(l_discount)) * 10000 + 0.5) / 10000 AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """C8 (TPC-H Q1 shape): the canonical hash-aggregate benchmark query.

    Map-side partial aggregation means the shuffle carries only
    |groups| x |partitions| rows — the scan dominates, as it should.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rn(F.sum("l_quantity"), 2).alias("sum_qty"),
            rn(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            rn(F.sum(disc_price), 2).alias("sum_disc_price"),
            rn(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            rn(F.avg("l_quantity"), 2).alias("avg_qty"),
            rn(F.avg("l_extendedprice"), 2).alias("avg_price"),
            rn(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "forecast_revenue",
    oracle="""
    SELECT floor((sum(l_extendedprice * l_discount)) * 100 + 0.5) / 100 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def forecast_revenue(spark, sf_dir):
    """C3+C8 (TPC-H Q6 shape): selective filter + scalar aggregate."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            rn(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue")
        )
    )


@register(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey, floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def shipping_priority(spark, sf_dir):
    """C4+C16 (TPC-H Q3 shape): join + agg + global top-k.

    TakeOrderedAndProject keeps the top-k merge on partial heaps — no full
    sort of the aggregate output at scale.
    """
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            rn(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "distinct_counts",
    oracle="""
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(count(DISTINCT (l_partkey, l_suppkey)) AS BIGINT) AS n_part_supp_pairs
    FROM lineitem
    """,
)
def distinct_counts(spark, sf_dir):
    """C9: distinct + count-distinct (single and composite key)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_partkey", "l_suppkey").alias("n_part_supp_pairs"),
    )


@register("approx_distinct")  # rows-only: approximate, engine-specific sketch
def approx_distinct(spark, sf_dir):
    """C10: HyperLogLog++ approximate count-distinct (rows-only check).

    At 100 TB this replaces exact count-distinct wherever a ~2% error is
    acceptable: no shuffle of the distinct keys, just sketch merge.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
    )


@register(
    "approx_distinct_bounds",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           true AS parts_within_band,
           true AS orders_within_band
    FROM lineitem GROUP BY 1
    """,
)
def approx_distinct_bounds(spark, sf_dir):
    """C10 on the driver's HARD signal: the HLL++ sketch value is
    engine-specific, but its ACCURACY CONTRACT is not — this query
    computes approx and exact count-distinct side by side and emits
    `|approx − exact| / exact ≤ 0.05` as boolean columns the DuckDB
    oracle hardcodes ``true`` (rsd=0.02, so the 5% band is > 2 standard
    deviations). A broken sketch, a wrong merge, or a band violation
    flips a boolean and fails the value hash; the exact counts anchor
    the rest of the row. Companion to the rows-only ``approx_distinct``
    (which shows the sketch itself); at 100 TB the sketch replaces the
    distinct-key shuffle wherever ~2% error is acceptable."""
    li = table(spark, sf_dir, "lineitem")

    def band(approx, exact):
        return (
            F.abs(approx.cast("double") - F.col(exact))
            / F.col(exact) <= 0.05
        )

    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("__ap"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("__ao"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        band(F.col("__ap"), "exact_parts").alias("parts_within_band"),
        band(F.col("__ao"), "exact_orders").alias("orders_within_band"),
    )


@register(
    "rollup_revenue",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_price,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(grouping(l_returnflag) + 2 * grouping(l_linestatus) AS INTEGER) AS gid
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark, sf_dir):
    """C11: rollup with grouping-id disambiguation."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            rn(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count("*").alias("n_rows"),
            (F.grouping("l_returnflag") + F.grouping("l_linestatus") * 2)
            .cast("int")
            .alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_price",
            "n_rows",
            "gid",
        )
    )


@register(
    "join_null_safe",
    oracle="""
    WITH c AS (
      SELECT nullif(c_nationkey % 5, 0) AS bucket, CAST(count(*) AS BIGINT) AS n_cust
      FROM customer GROUP BY 1
    ), s AS (
      SELECT nullif(s_nationkey % 5, 0) AS bucket, CAST(count(*) AS BIGINT) AS n_supp
      FROM supplier GROUP BY 1
    )
    SELECT c.bucket AS bucket, n_cust, n_supp
    FROM c JOIN s ON c.bucket IS NOT DISTINCT FROM s.bucket
    """,
)
def join_null_safe(spark, sf_dir):
    """C4 (null-safe variant): <=> equality where NULL keys match each
    other (IS NOT DISTINCT FROM) — required when the join key is derived
    and NULL is a legitimate bucket, e.g. folding CDC rows whose optional
    dimension is absent. Still hash-joinable (NULL is one partition), so
    the plan cost is identical to a plain equi-join."""
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    c = cust.groupBy(
        F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("bucket")
    ).agg(F.count("*").alias("n_cust"))
    s = supp.groupBy(
        F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("sbucket")
    ).agg(F.count("*").alias("n_supp"))
    return (
        c.join(s, c.bucket.eqNullSafe(s.sbucket))
        .select("bucket", "n_cust", "n_supp")
    )


@register(
    "union_by_name_evolved",
    oracle="""
    (SELECT o_orderkey, o_totalprice FROM orders WHERE year(o_orderdate) < 1997)
    UNION ALL BY NAME
    (SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE year(o_orderdate) >= 1997)
    """,
)
def union_by_name_evolved(spark, sf_dir):
    """C17 (schema evolution): unionByName with allowMissingColumns — the
    union that survives a source adding a column mid-stream (exactly what a
    long-lived CDC feed does; Debezium auto-tracks DDL, reference
    debezium-postgres-connector.yaml:40). Absent columns read as NULL, by
    NAME not position — positional union silently mis-aligns evolved
    schemas."""
    o = table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    historic = o.filter(yr < 1997).select("o_orderkey", "o_totalprice")
    evolved = o.filter(yr >= 1997).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    return historic.unionByName(evolved, allowMissingColumns=True)


@register(
    "cross_join_calendar",
    oracle="""
    SELECT n_name, r_name, CAST(n_nationkey * 100 + r_regionkey AS BIGINT) AS pair_code
    FROM nation CROSS JOIN region
    """,
)
def cross_join_calendar(spark, sf_dir):
    """C4-adjacent (cartesian): explicit crossJoin → BroadcastNestedLoopJoin.
    Only sane when one side is tiny (dims here, bucket/shard templates at
    scale); the optimizer cannot save an unbounded cartesian, so the engine
    surface makes it a deliberate, named choice."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return nation.crossJoin(F.broadcast(region)).select(
        "n_name",
        "r_name",
        (F.col("n_nationkey") * 100 + F.col("r_regionkey"))
        .cast("long")
        .alias("pair_code"),
    )


@register(
    "explode_positional",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS token
    FROM t CROSS JOIN unnest(generate_series(1, len(toks))) AS u(i)
    """,
)
def explode_positional(spark, sf_dir):
    """C23 (generator): posexplode — array → rows WITH ordinal position
    (the primitive under sequence labeling / token-window extraction).
    Generators multiply row counts, so at scale the explode runs AFTER
    per-document filters, never before. DuckDB mirrors via indexing with
    an unnested generate_series (0-based pos in both)."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    return t.select("doc_id", F.posexplode("toks").alias("pos", "token"))


@register(
    "histogram_width_bucket",
    oracle="""
    SELECT CAST(CASE WHEN l_extendedprice < 0 THEN 0
                     WHEN l_extendedprice >= 100000 THEN 11
                     ELSE floor(l_extendedprice / 10000) + 1 END AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           floor((avg(l_extendedprice)) * 100 + 0.5) / 100 AS avg_price,
           floor((avg(CASE WHEN l_tax = 0 THEN NULL ELSE l_discount / l_tax END)) * 1000000 + 0.5) / 1000000 AS avg_disc_tax_ratio
    FROM lineitem
    GROUP BY 1
    """,
)
def histogram_width_bucket(spark, sf_dir):
    """C21-adjacent (binning): width_bucket histogram — the single-pass,
    shuffle-one-row-per-bucket way to build distributions at 100 TB (vs
    sorting for exact percentiles). Plus try_divide: NULL on zero divisor
    instead of error/inf — ANSI-safe arithmetic for dirty data. DuckDB has
    no width_bucket; the oracle spells out the same bucket arithmetic."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.withColumn(
            "bucket",
            F.width_bucket(
                "l_extendedprice", F.lit(0.0), F.lit(100000.0), F.lit(10)
            ).cast("long"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            rn(F.avg("l_extendedprice"), 2).alias("avg_price"),
            rn(F.avg(F.try_divide("l_discount", "l_tax")), 6).alias(
                "avg_disc_tax_ratio"
            ),
        )
    )


@register(
    "agg_boolean",
    oracle="""
    SELECT l_returnflag,
           CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
           bool_and(l_extendedprice > 0) AS all_positive,
           bool_or(l_discount > 0.09) AS any_deep_discount,
           CAST(count_if(l_tax = 0) AS BIGINT) AS n_tax_free
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_boolean(spark, sf_dir):
    """C8 (boolean aggregates): count_if/bool_and/bool_or — predicate
    aggregation without a CASE detour; map-side combinable to one bit/count
    per group, so the shuffle payload is constant regardless of row count."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
        F.bool_and(F.col("l_extendedprice") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.count_if(F.col("l_tax") == 0).alias("n_tax_free"),
    )


@register(
    "agg_argmax",
    oracle="""
    SELECT l_returnflag,
           CAST(arg_max(l_orderkey, l_extendedprice + l_orderkey * 1e-9 + l_linenumber * 1e-10) AS BIGINT) AS top_orderkey,
           CAST(arg_min(l_orderkey, l_extendedprice + l_orderkey * 1e-9 + l_linenumber * 1e-10) AS BIGINT) AS bottom_orderkey,
           arg_max(l_linestatus, l_extendedprice + l_orderkey * 1e-9 + l_linenumber * 1e-10) AS top_status
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_argmax(spark, sf_dir):
    """C8 (argmax aggregates): max_by/min_by — "which row holds the
    extreme" without a window + filter (one shuffle of a single candidate
    per group instead of ranking every row). The ordering value folds the
    unique (orderkey, linenumber) into sub-quantum decimals of the price
    (price quantum 0.01 >> 6e-3 max perturbation >> double ulp), so every
    group has a unique maximum and both engines agree deterministically."""
    li = table(spark, sf_dir, "lineitem")
    v = (
        F.col("l_extendedprice")
        + F.col("l_orderkey") * 1e-9
        + F.col("l_linenumber") * 1e-10
    )
    return li.groupBy("l_returnflag").agg(
        F.max_by("l_orderkey", v).cast("long").alias("top_orderkey"),
        F.min_by("l_orderkey", v).cast("long").alias("bottom_orderkey"),
        F.max_by("l_linestatus", v).alias("top_status"),
    )


@register(
    "agg_statistics",
    oracle="""
    SELECT l_returnflag,
           floor((stddev_samp(l_extendedprice)) * 10000 + 0.5) / 10000 AS price_sd,
           floor((var_pop(l_quantity)) * 10000 + 0.5) / 10000 AS qty_var,
           floor((corr(l_quantity, l_extendedprice)) * 1000000 + 0.5) / 1000000 AS qty_price_corr,
           floor((covar_samp(l_discount, l_tax)) * 1000000 + 0.5) / 1000000 AS disc_tax_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_statistics(spark, sf_dir):
    """C8 (statistical aggregates): stddev/variance/correlation/covariance —
    all single-pass mergeable moments (Welford-style partial aggregation:
    map-side combine then one shuffle of (n, mean, M2) per group, identical
    cost profile to sum/avg at 100 TB). Definitions are identical across
    engines for the samp/pop variants chosen; skewness/kurtosis deliberately
    excluded (Spark uses population g1/g2, DuckDB bias-corrected G1/G2)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        rn(F.stddev_samp("l_extendedprice"), 4).alias("price_sd"),
        rn(F.var_pop("l_quantity"), 4).alias("qty_var"),
        rn(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        rn(F.covar_samp("l_discount", "l_tax"), 6).alias("disc_tax_covar"),
    )


@register(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
           floor((regr_slope(l_extendedprice, l_quantity)) * 1000000 + 0.5) / 1000000 AS slope,
           floor((regr_intercept(l_extendedprice, l_quantity)) * 10000 + 0.5) / 10000 AS intercept,
           floor((regr_r2(l_extendedprice, l_quantity)) * 1000000 + 0.5) / 1000000 AS r2,
           floor((regr_avgx(l_extendedprice, l_quantity)) * 1000000 + 0.5) / 1000000 AS avg_x,
           floor((regr_avgy(l_extendedprice, l_quantity)) * 10000 + 0.5) / 10000 AS avg_y
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_regression(spark, sf_dir):
    """C8 (regression aggregates): least-squares slope/intercept/R² per
    group — single-pass mergeable moments like corr/covar (partial (n,
    Σx, Σy, Σxx, Σxy) per map partition, one shuffle of 5 doubles per
    group). SQL-standard regr_* semantics on both engines; y-then-x
    argument order matters and is mirrored exactly."""
    li = table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n_pairs"),
        rn(F.regr_slope(y, x), 6).alias("slope"),
        rn(F.regr_intercept(y, x), 4).alias("intercept"),
        rn(F.regr_r2(y, x), 6).alias("r2"),
        rn(F.regr_avgx(y, x), 6).alias("avg_x"),
        rn(F.regr_avgy(y, x), 4).alias("avg_y"),
    )


@register(
    "agg_bitwise",
    oracle="""
    SELECT l_returnflag,
           CAST(bit_and(l_linenumber) AS BIGINT) AS ln_and,
           CAST(bit_or(l_linenumber) AS BIGINT) AS ln_or,
           CAST(bit_xor(CAST(l_orderkey AS BIGINT)) AS BIGINT) AS key_xor
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitwise(spark, sf_dir):
    """C8 (bitwise aggregates): AND/OR/XOR folds — exact, commutative,
    mergeable (the XOR fold doubles as a cheap order-insensitive set
    checksum for reconciliation jobs)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").cast("long").alias("ln_and"),
        F.bit_or("l_linenumber").cast("long").alias("ln_or"),
        F.bit_xor(F.col("l_orderkey").cast("long")).alias("key_xor"),
    )


@register(
    "agg_collect",
    oracle="""
    SELECT s_nationkey,
           array_to_string(list_sort(list(s_name)), ',') AS names_csv,
           CAST(len(list_distinct(list(s_suppkey % 10))) AS INTEGER) AS n_key_buckets,
           floor((list_sort(list(s_acctbal))[1]) * 100 + 0.5) / 100 AS min_bal_via_list
    FROM supplier
    GROUP BY s_nationkey
    """,
)
def agg_collect(spark, sf_dir):
    """C8 (collection aggregates): collect_list/collect_set — the aggregate
    that builds per-group arrays (the primitive under per-entity feature
    assembly in training pipelines). Sorted before serialization so both
    engines hash identically; scale note: per-group arrays must be bounded
    (group cardinality, not data size) or they become the skew hazard."""
    s = table(spark, sf_dir, "supplier")
    return s.groupBy("s_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("names_csv"),
        F.size(F.collect_set(F.col("s_suppkey") % 10)).alias("n_key_buckets"),
        rn(F.array_sort(F.collect_list("s_acctbal")).getItem(0), 2).alias(
            "min_bal_via_list"
        ),
    )


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_price,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(grouping(l_returnflag) + 2 * grouping(l_linestatus) AS INTEGER) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_revenue(spark, sf_dir):
    """C11 (explicit sets): arbitrary GROUPING SETS — per-flag, per-linestatus,
    and grand total in ONE pass over lineitem (one shuffle via Expand, vs
    three scans + a union if written naively). Spark 4 DataFrame API."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
        )
        .agg(
            rn(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count("*").alias("n_rows"),
            (F.grouping("l_returnflag") + F.grouping("l_linestatus") * 2)
            .cast("int")
            .alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_price",
            "n_rows",
            "gid",
        )
    )


@register(
    "cube_orders",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
           coalesce(o_orderpriority, 'ALL') AS orderpriority,
           floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS sum_price,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(grouping(o_orderstatus) + 2 * grouping(o_orderpriority) AS INTEGER) AS gid
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders(spark, sf_dir):
    """C11: cube over two dimensions."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            rn(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.count("*").alias("n_orders"),
            (F.grouping("o_orderstatus") + F.grouping("o_orderpriority") * 2)
            .cast("int")
            .alias("gid"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "sum_price",
            "n_orders",
            "gid",
        )
    )


@register(
    "window_rank",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn, rnk, drnk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(row_number() OVER w AS BIGINT) AS rn,
             CAST(rank() OVER w AS BIGINT) AS rnk,
             CAST(dense_rank() OVER w AS BIGINT) AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
    ) WHERE rn <= 3
    """,
)
def window_rank(spark, sf_dir):
    """C12: ranking window functions, deterministic tie-break, top-3/group."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_percent_dist",
    oracle="""
    SELECT c_custkey, c_nationkey,
           floor((percent_rank() OVER w) * 1000000 + 0.5) / 1000000 AS pct_rank,
           floor((cume_dist() OVER w) * 1000000 + 0.5) / 1000000 AS cume_d
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def window_percent_dist(spark, sf_dir):
    """C12 (distribution pack): percent_rank + cume_dist per nation; the
    c_custkey tie-break makes every rank distinct, so both fractions are
    deterministic and hash-comparable after 6-decimal rounding."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        rn(F.percent_rank().over(w), 6).alias("pct_rank"),
        rn(F.cume_dist().over(w), 6).alias("cume_d"),
    )


@register(
    "window_nth_value",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           floor((nth_value(o_totalprice, 3) OVER w) * 100 + 0.5) / 100 AS third_highest,
           floor((last_value(o_totalprice) OVER w) * 100 + 0.5) / 100 AS lowest
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_nth_value(spark, sf_dir):
    """C13 (nth/last pack): nth_value + last_value over the FULL partition
    frame (default frames differ between engines for last_value — unbounded
    both ways makes the frame explicit and identical)."""
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        rn(F.nth_value("o_totalprice", 3).over(w), 2).alias("third_highest"),
        rn(F.last("o_totalprice").over(w), 2).alias("lowest"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           floor((first_value(o_totalprice) OVER w) * 100 + 0.5) / 100 AS first_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def window_lag_lead(spark, sf_dir):
    """C13: analytic window functions over per-customer order history."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        rn(F.first("o_totalprice").over(w), 2).alias("first_price"),
    )


@register(
    "window_running_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           floor((sum(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100 AS running_qty,
           floor((avg(l_extendedprice) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100 AS moving_avg_price
    FROM lineitem
    """,
)
def window_running_frame(spark, sf_dir):
    """C14: framed window aggregates (running sum, 3-row moving average)."""
    li = table(spark, sf_dir, "lineitem")
    order = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    w = Window.partitionBy("l_suppkey").orderBy(*order)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        rn(
            F.sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_qty"),
        rn(F.avg("l_extendedprice").over(w.rowsBetween(-2, 0)), 2).alias(
            "moving_avg_price"
        ),
    )


@register(
    "top_k",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 10
    """,
)
def top_k(spark, sf_dir):
    """C15/C16: multi-key global sort + limit → TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(10)
    )


@register(
    "set_union",
    oracle="""
    SELECT custkey, CAST(count(*) AS BIGINT) AS appearances FROM (
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
      UNION ALL
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 50000
    ) GROUP BY custkey
    """,
)
def set_union(spark, sf_dir):
    """C17: union-all of two key sets + multiplicity count."""
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    big = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 50000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return cust.unionAll(big).groupBy("custkey").agg(F.count("*").alias("appearances"))


@register(
    "set_intersect_except",
    oracle="""
    SELECT 'both' AS which, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'A'
      INTERSECT
      SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    )
    UNION ALL
    SELECT 'only_a' AS which, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'A'
      EXCEPT
      SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    )
    """,
)
def set_intersect_except(spark, sf_dir):
    """C18: intersect / except of part-key sets."""
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey").distinct()
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey").distinct()
    both = a.intersect(r).agg(F.count("*").alias("n")).select(
        F.lit("both").alias("which"), "n"
    )
    only_a = a.exceptAll(r).agg(F.count("*").alias("n")).select(
        F.lit("only_a").alias("which"), "n"
    )
    return both.unionAll(only_a)


@register(
    "conditional_nulls",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_band,
           floor((coalesce(nullif(c_acctbal, 0.0), -1.0)) * 100 + 0.5) / 100 AS bal_or_sentinel,
           floor((greatest(c_acctbal, 0.0)) * 100 + 0.5) / 100 AS bal_floor0,
           floor((least(c_acctbal, 9000.0)) * 100 + 0.5) / 100 AS bal_cap9k
    FROM customer
    """,
)
def conditional_nulls(spark, sf_dir):
    """C22: CASE/coalesce/nullif/greatest/least."""
    cust = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return cust.select(
        "c_custkey",
        F.when(bal < 0, "debt").when(bal < 5000, "mid").otherwise("high").alias("bal_band"),
        rn(F.coalesce(F.nullif(bal, F.lit(0.0)), F.lit(-1.0)), 2).alias("bal_or_sentinel"),
        rn(F.greatest(bal, F.lit(0.0)), 2).alias("bal_floor0"),
        rn(F.least(bal, F.lit(9000.0)), 2).alias("bal_cap9k"),
    )


@register(
    "agg_string_concat",
    oracle="""
    SELECT c_mktsegment,
           string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations,
           CAST(count(DISTINCT n_name) AS BIGINT) AS n_nations
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY c_mktsegment
    """,
)
def agg_string_concat(spark, sf_dir):
    """C8 depth: ordered string aggregation (LISTAGG/string_agg) — built
    deterministically as sort_array(collect_set) -> concat_ws, so the
    result is independent of partitioning/merge order (a bare
    collect_list would not be)."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_mktsegment")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("n_name"))).alias("nations"),
            F.countDistinct("n_name").alias("n_nations"),
        )
    )
