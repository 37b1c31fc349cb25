"""Graph-analytics driver queries: iterative PageRank under a full oracle.

The part↔supplier bipartite graph is derived from ``lineitem`` (an edge
per distinct part–supplier pairing, both directions, so every vertex has
out-edges and the walk is well-defined). PageRank runs
:func:`operators.graph.pagerank_fixed_point` — a statically unrolled,
bigint fixed-point plan — and the oracle replays the IDENTICAL unrolled
computation as chained CTEs, iteration for iteration. Integer arithmetic
is what makes that a *hash* oracle rather than a tolerance check: bigint
sums are associative, so Spark's shuffle order and DuckDB's scan order
reach the same bits.

This closes the one workload shape the registry lacked: a multi-round
self-referential dataflow (output of iteration k is an input of k+1),
the template for label propagation, BFS layers, and embedding-style
power iteration at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.graph import RANK_SCALE, pagerank_fixed_point
from ..registry import register
from ..sources.tables import table

_ITERS = 3
_DAMPING = 85
_TELEPORT = RANK_SCALE * (100 - _DAMPING) // 100


def _oracle() -> str:
    prev = "r0"
    steps = []
    for i in range(1, _ITERS + 1):
        steps.append(
            f"""r{i} AS (
      SELECT e.dst AS node,
             CAST({_TELEPORT} + sum((r.rank * {_DAMPING}) // (100 * d.outdeg)) AS BIGINT) AS rank
      FROM edges e
      JOIN {prev} r ON e.src = r.node
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    )"""
        )
        prev = f"r{i}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH edges AS (
      SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
      UNION ALL
      SELECT DISTINCT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst FROM lineitem
    ), deg AS (
      SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src
    ), r0 AS (
      SELECT src AS node, CAST({RANK_SCALE} AS BIGINT) AS rank FROM deg
    ),
    {chain}
    SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
           CAST(node // 2 AS BIGINT) AS node_key,
           rank AS rank_scaled
    FROM {prev}
    """


@register("graph_pagerank", oracle=_oracle())
def graph_pagerank(spark, sf_dir):
    """Fixed-point PageRank (3 unrolled iterations, damping 0.85)
    over the part↔supplier graph; ranks in 1e9 units. The bipartite
    encoding (part → even node id, supplier → odd) keeps one vertex
    namespace; symmetric edges guarantee no dangling mass. One lazy plan:
    construction runs zero jobs, each iteration is a src-join plus a
    dst-aggregate with map-side partial sums."""
    from pyspark.sql import functions as F

    li = table(spark, sf_dir, "lineitem")
    part_sup = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).distinct()
    sup_part = li.select(
        (F.col("l_suppkey") * 2 + 1).alias("src"),
        (F.col("l_partkey") * 2).alias("dst"),
    ).distinct()
    edges = part_sup.unionByName(sup_part)
    ranks = pagerank_fixed_point(edges, iters=_ITERS, damping_pct=_DAMPING)
    return ranks.select(
        F.when(F.col("node") % 2 == 0, F.lit("part"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node div 2").alias("node_key"),
        F.col("rank").alias("rank_scaled"),
    )


_DOUBLING_ROUNDS = 4  # covers depth up to 2^4 = 16; actual tree depth ≤ 4


@register(
    "hierarchy_root_depth",
    oracle="""
    WITH RECURSIVE walk(node, cur, d) AS (
      SELECT p_partkey, p_partkey, 0 FROM part
      UNION ALL
      SELECT node, cur // 10, d + 1 FROM walk WHERE cur >= 10
    )
    SELECT node AS p_partkey, CAST(cur AS BIGINT) AS root_key,
           CAST(d AS BIGINT) AS depth
    FROM walk WHERE cur < 10
    """,
)
def hierarchy_root_depth(spark, sf_dir):
    """Hierarchical traversal — the recursive-CTE shape — solved
    distributively by POINTER DOUBLING: each part's parent is
    ``p_partkey div 10`` (roots: keys < 10), and every node must report
    its root ancestor and depth. A naive loop climbs one level per join
    (depth rounds); pointer doubling squares the jump each round
    (ancestor-of-ancestor, distance added), reaching any depth ≤ 2^k in
    k rounds — 4 unrolled rounds here cover depth 16, and the whole
    computation stays ONE lazy plan (zero jobs at construction, unlike
    convergence loops). The oracle is DuckDB's native WITH RECURSIVE
    climb; integer keys and depths make it hash-exact. This is the
    O(log d) formulation a 100 TB org-chart/BOM rollup needs — d
    sequential self-joins die on latency, log2(d) don't."""
    from pyspark.storagelevel import StorageLevel

    part = table(spark, sf_dir, "part")
    state = part.select(
        F.col("p_partkey").alias("node"),
        # first hop: parent (or self for roots, at distance 0)
        F.when(F.col("p_partkey") >= 10, F.expr("p_partkey div 10"))
        .otherwise(F.col("p_partkey"))
        .alias("anc"),
        F.when(F.col("p_partkey") >= 10, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("dist"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    from ..operators.graph import pointer_double

    jump = pointer_double(state, _DOUBLING_ROUNDS)
    return jump.select(
        F.col("node").alias("p_partkey"),
        F.col("anc").alias("root_key"),
        F.col("dist").alias("depth"),
    )
