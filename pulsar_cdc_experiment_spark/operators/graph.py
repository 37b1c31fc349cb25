"""Distributed iterative graph computation: fixed-point PageRank.

Iterative algorithms are the one workload the registry's other operators
don't exercise: a dataflow that feeds its own output back through a join,
re-shuffled every iteration. This module implements PageRank as a statically
unrolled DataFrame plan — the canonical distributed formulation
(contributions flow along edges, ranks re-aggregate by destination),
expressed so Catalyst sees ONE lazy plan with no driver-side actions.

**Fixed-point arithmetic, deliberately.** Floating-point PageRank is not
reproducible across engines (summation order changes low-order bits), so
ranks are scaled integers: every operation is bigint multiply / integer
divide / bigint sum — associative and engine-exact, which is what lets a
DuckDB oracle reproduce the result bit-for-bit (queries/graph_q.py builds
the identical unrolled computation as chained CTEs). The floor-division
quantization leaks a sub-ulp of rank mass per step; that is part of the
operator's defined semantics, identically on both engines.

Scale notes (100 TB graph): each iteration is two shuffles — ranks join
edges on ``src`` (edges and degrees share that key, so co-partitioning
makes the join local after the first iteration; AQE reuses the exchange),
then a groupBy on ``dst`` with map-side partial sums. State per iteration
is one (node, rank) row per vertex — no driver-side collection, no
per-node state bigger than a bigint. Two iteration policies:
:func:`pagerank_fixed_point` unrolls a KNOWN round count into one lazy
plan; :func:`pagerank_until_converged` loops with a one-scalar residual
check per round — the same sanctioned carve-out as label propagation
(operators/components.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rank scale: 1.0 of probability mass == 10^9 units. Headroom: with N
#: vertices total mass is N*10^9; the per-step product rank*damping_pct
#: stays under 2^63 for graphs beyond 10^8 vertices.
RANK_SCALE = 10**9


def out_degrees(edges: DataFrame) -> DataFrame:
    """(src, outdeg) — one row per vertex with outgoing edges."""
    return edges.groupBy("src").agg(F.count("*").alias("outdeg"))


def _vertices_and_dangling(edges_deg: DataFrame, teleport: int):
    """Shared by both PageRank variants: the vertex universe (distinct
    src) and the persisted dangling-IN set — vertices with no inbound
    edges, whose rank is constant at ``teleport`` and is unioned back
    into every iteration's aggregate (round-6 ADVICE: the dst-groupBy
    would otherwise silently drop them)."""
    from pyspark.storagelevel import StorageLevel

    vertices = (
        edges_deg.select("src").distinct().select(F.col("src").alias("node"))
    )
    dangling = (
        vertices.join(
            edges_deg.select(F.col("dst").alias("node")).distinct(),
            "node",
            "left_anti",
        )
        .select("node", F.lit(teleport).cast("long").alias("rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return vertices, dangling


def pagerank_fixed_point(
    edges: DataFrame, iters: int = 3, damping_pct: int = 85
) -> DataFrame:
    """PageRank over ``edges(src, dst)`` with bigint fixed-point ranks.

    The vertex universe is the distinct ``src`` set (every vertex must
    have out-edges — dangling-OUT vertices would leak rank mass; callers
    with genuinely directed graphs add the reversed self-handling edges
    first). Vertices that never appear as a ``dst`` (dangling-IN, e.g.
    src-only nodes of a directed graph) are NOT dropped (round-6 ADVICE
    — previously the groupBy('dst') silently removed them along with
    their teleport mass): their rank is CONSTANT at teleport (no inbound
    contributions ever), so the dangling set is computed ONCE with an
    anti-join outside the loop; their constant per-edge contributions
    join the aggregate input from round 2 on, and their rank rows are
    unioned onto the final vector (round 20 — keeping the loop's ranks
    a pure groupBy output preserves its hash partitioning for the next
    round's join). Returns ``(node, rank)`` with ``rank`` in
    :data:`RANK_SCALE` units, as one unrolled lazy plan: ``iters`` ×
    (join on src → integer contribution → re-aggregate on dst → union
    dangling).
    """
    from pyspark.storagelevel import StorageLevel

    deg = out_degrees(edges)
    teleport = RANK_SCALE * (100 - damping_pct) // 100
    # persist the degree-annotated edge structure: it is read by EVERY
    # iteration, and an unrolled lazy plan would otherwise re-derive it
    # (re-scanning the edge source) once per round — the classic
    # iterative-dataflow mistake at 100 TB. persist() is lazy, so query
    # construction still runs zero jobs; the first action materializes
    # the structure once and iterations 2..n read the cache. Cache
    # lifetime: the entry lives until session end — CacheManager dedupes
    # identical plans (repeated calls reuse ONE entry) and LRU-evicts
    # under memory pressure, so repeated invocation is bounded, not
    # accumulating.
    edges_deg = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    vertices, dangling = _vertices_and_dangling(edges_deg, teleport)
    ranks = vertices.select("node", F.lit(RANK_SCALE).cast("long").alias("rank"))
    # Round-20 (guide §2.4 — share one exchange): dangling-IN vertices'
    # rank is CONSTANT at teleport from round 2 on (they receive no
    # contributions), so their per-edge contributions are ONE fixed
    # table, computed lazily once and unioned into each round's
    # AGGREGATE input instead of unioning the dangling rank rows into
    # the JOIN input. The loop's ranks then stay a pure groupBy("dst")
    # output whose hash partitioning the next round's src-join reuses
    # (the union previously discarded it): one Exchange per iteration
    # instead of two. Identical bigint math — the same contribution
    # rows reach the same per-dst sums, just unioned one operator later.
    dang_contrib = (
        edges_deg.join(
            dangling.select(F.col("node").alias("src")), "src"
        )
        .select(
            "dst",
            F.expr(
                f"{teleport}L * {damping_pct} div (100 * outdeg)"
            ).alias("contrib"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    for i in range(iters):
        # per-iteration aliases: ranks shares lineage with edges_deg from
        # the previous round, and unaliased column refs in a self-join on
        # shared lineage are ambiguous to the analyzer
        e, r = edges_deg.alias(f"e{i}"), ranks.alias(f"r{i}")
        contrib = e.join(r, F.col(f"e{i}.src") == F.col(f"r{i}.node")).select(
            F.col(f"e{i}.dst").alias("dst"),
            # bigint `div` (not `/`): rank*85 exceeds 2^53, a double
            # division here would silently lose integer resolution
            F.expr(f"rank * {damping_pct} div (100 * outdeg)").alias("contrib"),
        )
        if i > 0:
            # round 1's join input is the FULL initial rank vector
            # (every vertex at RANK_SCALE, dangling included) — the
            # constant-teleport contribution table applies from round 2
            contrib = contrib.unionByName(dang_contrib)
        ranks = (
            contrib.groupBy("dst")
            .agg((F.lit(teleport).cast("long") + F.sum("contrib")).alias("rank"))
            .select(F.col("dst").alias("node"), "rank")
        )
    # ranks covers every vertex with inbound edges; the dangling set's
    # constant-teleport rows complete the vector (same rows the union
    # previously added every round)
    if iters == 0:
        return ranks
    return ranks.unionByName(dangling)


def pagerank_until_converged(
    edges: DataFrame,
    eps_per_node: int = 1000,
    max_iters: int = 20,
    damping_pct: int = 85,
) -> tuple[DataFrame, int]:
    """PageRank iterated until the total rank movement falls below
    ``eps_per_node × |V|`` fixed-point units (or ``max_iters``).

    The unrolled variant (:func:`pagerank_fixed_point`) is one lazy plan —
    right when the round count is known. Convergence needs a per-round
    decision, which means one bounded driver-side action per round — the
    same sanctioned shape as label propagation's convergence count
    (operators/components.py; tests/test_scale_plans.py allowlist).

    Round-19 optimization (guide §1.2 step 1 + §3.3 plan truncation):
    each round's ranks are ``localCheckpoint(eager=True)``-materialized,
    which BOTH stores the round's output and TRUNCATES the lineage — the
    pre-optimization persist() kept the full unrolled logical plan alive,
    so every round's analysis/planning walked k rounds of lineage (the
    final plan was 21,829 formatted lines; the per-round driver gaps grew
    with k). The residual sum(|rank_k − rank_{k-1}|) now RIDES the
    checkpoint materialization as an ``Observation`` on a plan that
    carries the previous rank through the fold (prev-ranks LEFT JOIN
    contributions — the exact shape the DuckDB oracle's CTEs use), so a
    round costs ONE action instead of two (materialize + separate
    residual join), and the dangling-vertex union/anti-join machinery
    disappears: a vertex with no inbound contribution folds to teleport
    via ``coalesce(csum, 0)``. Same integer trajectory, same stopping
    round, bit-identical output.

    Trade recorded: localCheckpoint blocks are executor-local and
    non-replicated — on a cluster an executor loss mid-loop fails the
    query (restart the loop); the previous persist() could not recompute
    affordably either (full-lineage recompute was quadratic), so nothing
    real is lost, and old rounds' blocks are reclaimed by the
    ContextCleaner as references drop.

    Returns ``(ranks, rounds_run)``. Deterministic: integer arithmetic
    makes both the trajectory and the stopping round reproducible.
    """
    from pyspark.sql import Observation
    from pyspark.storagelevel import StorageLevel

    deg = out_degrees(edges)
    teleport = RANK_SCALE * (100 - damping_pct) // 100
    edges_deg = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    vertices = (
        edges_deg.select("src").distinct().select(F.col("src").alias("node"))
    )
    obs0 = Observation()
    ranks = (
        vertices.select("node", F.lit(RANK_SCALE).cast("long").alias("rank"))
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_nodes = int(obs0.get["n"])
    rounds = 0
    for i in range(max_iters):
        e, r = edges_deg.alias(f"ce{i}"), ranks.alias(f"cr{i}")
        contrib = e.join(r, F.col(f"ce{i}.src") == F.col(f"cr{i}.node")).select(
            F.col(f"ce{i}.dst").alias("dst"),
            F.expr(f"rank * {damping_pct} div (100 * outdeg)").alias("contrib"),
        )
        csum = contrib.groupBy("dst").agg(F.sum("contrib").alias("csum"))
        obs = Observation()
        nxt = (
            ranks.select("node", F.col("rank").alias("__prev"))
            .join(csum, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.lit(teleport).cast("long")
                    + F.coalesce(F.col("csum"), F.lit(0).cast("long"))
                ).alias("rank"),
                "__prev",
            )
            .observe(
                obs,
                F.sum(F.abs(F.col("rank") - F.col("__prev"))).alias("resid"),
            )
            .drop("__prev")
            .localCheckpoint(eager=True)
        )
        residual = int(obs.get["resid"])
        ranks = nxt
        rounds = i + 1
        if residual <= eps_per_node * n_nodes:
            break
    return ranks, rounds


def pointer_double(state: DataFrame, rounds: int) -> DataFrame:
    """Pointer doubling over a ``(node, anc, dist)`` jump table: each
    round composes the table with itself (ancestor-of-ancestor, distances
    added), so after k rounds every node maps to its 2^k-ancestor — or
    its root, if roots self-loop at distance 0 (the fixed point). The
    O(log depth) traversal for trees/forests as ONE unrolled lazy plan;
    see queries/graph_q.hierarchy_root_depth for the recursive-CTE-shaped
    use."""
    jump = state
    for i in range(rounds):
        a, b = jump.alias(f"pd_a{i}"), jump.alias(f"pd_b{i}")
        jump = a.join(
            b, F.col(f"pd_a{i}.anc") == F.col(f"pd_b{i}.node")
        ).select(
            F.col(f"pd_a{i}.node").alias("node"),
            F.col(f"pd_b{i}.anc").alias("anc"),
            (F.col(f"pd_a{i}.dist") + F.col(f"pd_b{i}.dist")).alias("dist"),
        )
    return jump
