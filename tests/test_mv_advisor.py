"""plans/mv_advisor.py — workload-driven MV advisor: the covering and
minimality properties (every request served by some advised spec; the
advised set is an antichain), measure folding through derivability, the
one-job size estimation, and end-to-end: creating the advised set makes
answer_aggregate serve every workload request from an MV."""

from __future__ import annotations

import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pulsar_cdc_experiment_spark.plans.mv import (
    _measures_servable,
    answer_aggregate,
)
from pulsar_cdc_experiment_spark.plans.mv_advisor import (
    advise_mvs,
    create_advised_mvs,
    estimate_mv_sizes,
)

_COLS = ["a", "b", "c", "d"]
_MCOLS = ["x", "y"]


@st.composite
def _request(draw):
    group = draw(
        st.lists(st.sampled_from(_COLS), min_size=1, max_size=3,
                 unique=True)
    )
    where = draw(
        st.lists(st.sampled_from(_COLS), min_size=0, max_size=2,
                 unique=True)
    )
    fns = draw(
        st.lists(
            st.sampled_from(["sum", "count", "min", "max", "avg"]),
            min_size=1, max_size=3, unique=True,
        )
    )
    col = draw(st.sampled_from(_MCOLS))
    aggs = {f"{fn}0": (fn, col) for fn in fns}
    if draw(st.booleans()):
        aggs["n"] = ("count", None)
    return {"group_cols": group, "where_cols": where, "aggs": aggs}


@settings(
    max_examples=60, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_request(), min_size=1, max_size=8))
def test_advise_covers_every_request_and_is_antichain(reqs):
    advised = advise_mvs(reqs)
    # antichain: no advised spec subsumed by another
    sets = [frozenset(a["group_cols"]) for a in advised]
    for i, s in enumerate(sets):
        for j, t in enumerate(sets):
            if i != j:
                assert not s <= t, (s, t)
    # covering: every request served by some advised spec — columns
    # subsume AND the rewriter's own derivability check passes (the
    # advised spec is judged by the same code that will serve it)
    for idx, r in enumerate(reqs):
        need = set(r["group_cols"]) | set(r.get("where_cols", []))
        serving = [
            a for a in advised
            if idx in a["covers"]
        ]
        assert serving, f"request {idx} uncovered"
        for a in serving:
            assert need <= set(a["group_cols"])
            man = {"measures": {
                out: {"fn": fn, "col": col,
                      **({} if col is None else {"partial": f"p_{fn}_{col}"})}
                for out, (fn, col) in a["measures"].items()
            }}
            assert _measures_servable(man, r["aggs"]), (a, r)


def test_advise_folds_avg_and_dedups_measures():
    advised = advise_mvs([
        {"group_cols": ["a"], "aggs": {"s": ("sum", "x")}},
        {"group_cols": ["a", "b"], "where_cols": [],
         "aggs": {"av": ("avg", "x"), "c": ("count", "x")}},
    ])
    # one MV: (a) ⊂ (a, b); avg subsumes sum+count of x
    assert len(advised) == 1
    a = advised[0]
    assert a["group_cols"] == ["a", "b"]
    assert a["covers"] == [0, 1]
    assert a["measures"] == {"avg_x": ("avg", "x"), "n": ("count", None)}


def test_advised_set_serves_workload_end_to_end(spark):
    """Create the advised MVs and every workload request routes to one
    through answer_aggregate — with values matching the direct
    computation; one estimation job annotates plausible sizes."""
    base = tempfile.mkdtemp(prefix="mvadv_")
    try:
        src_path = os.path.join(base, "fact")
        spark.createDataFrame(
            [
                (i, ["a", "b", "c"][i % 3], ["x", "y"][i % 2], i % 7,
                 float(i % 100))
                for i in range(500)
            ],
            "id bigint, g1 string, g2 string, g3 bigint, v double",
        ).write.parquet(src_path)
        src = spark.read.parquet(src_path)
        workload = [
            {"group_cols": ["g1"], "aggs": {"sv": ("sum", "v")}},
            {"group_cols": ["g2"], "where_cols": ["g1"],
             "aggs": {"av": ("avg", "v"), "n": ("count", None)}},
            {"group_cols": ["g3"], "aggs": {"mx": ("max", "v")}},
        ]
        advised = advise_mvs(workload)
        # two maximal sets: {g1, g2} (covers 0 and 1) and {g3}
        assert [a["group_cols"] for a in advised] == [
            ["g1", "g2"], ["g3"]
        ]
        assert [a["covers"] for a in advised] == [[0, 1], [2]]
        advised = estimate_mv_sizes(spark, src, advised)
        assert advised[0]["n_groups_est"] >= 4  # ~6 groups, HLL ±
        assert advised[1]["n_groups_est"] >= 5  # ~7 groups
        mv_root = os.path.join(base, "mvs")
        create_advised_mvs(
            spark, mv_root, source_path=src_path, source=src,
            advised=advised,
        )
        # request 0: rollup of advised_0
        df, used = answer_aggregate(
            spark, mv_root, src, src_path,
            group_cols=["g1"], aggs=workload[0]["aggs"],
        )
        assert used == "advised_0"
        want = {
            (r["g1"],): r["sv"]
            for r in src.groupBy("g1").agg(
                F.sum("v").alias("sv")
            ).collect()
        }
        assert {(r["g1"],): r["sv"] for r in df.collect()} == want
        # request 1: predicate on g1, grouped by g2 — same advised MV
        df, used = answer_aggregate(
            spark, mv_root, src, src_path,
            group_cols=["g2"], aggs=workload[1]["aggs"],
            where=[("g1", "=", "a")],
        )
        assert used == "advised_0"
        want = {
            (r["g2"],): (r["av"], r["n"])
            for r in src.filter(F.col("g1") == "a").groupBy("g2").agg(
                F.avg("v").alias("av"), F.count("*").alias("n")
            ).collect()
        }
        assert {
            (r["g2"],): (r["av"], r["n"]) for r in df.collect()
        } == want
        # request 2: the separate g3 spec
        df, used = answer_aggregate(
            spark, mv_root, src, src_path,
            group_cols=["g3"], aggs=workload[2]["aggs"],
        )
        assert used == "advised_1"
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_incremental_advice_excludes_already_covered():
    """advise_mvs(existing=...) returns exactly the GAP: requests an
    existing MV already serves (columns + derivable measures, judged
    by the rewriter's rules) are excluded; covers indices still point
    into the ORIGINAL request list; fully-covered workloads advise
    nothing."""
    reqs = [
        {"group_cols": ["a"], "aggs": {"s": ("sum", "x")}},
        {"group_cols": ["c"], "aggs": {"m": ("max", "x")}},
        {"group_cols": ["a", "b"], "aggs": {"av": ("avg", "x")}},
    ]
    existing = [
        # create-vocabulary measures; covers reqs 0 and 2 (avg partial
        # pair serves sum; (a) and (a,b) both subsumed)
        {"group_cols": ["a", "b"], "measures": {"avg_x": ("avg", "x")}},
    ]
    advised = advise_mvs(reqs, existing=existing)
    assert len(advised) == 1
    assert advised[0]["group_cols"] == ["c"]
    assert advised[0]["covers"] == [1]
    assert advised[0]["measures"]["max_x"] == ("max", "x")
    # manifest-form measures work too; full coverage advises nothing
    existing_man = [
        {"group_cols": ["a", "b"],
         "measures": {"avg_x": {"fn": "avg", "col": "x",
                                "partial": "__sum_x"}}},
        {"group_cols": ["c"],
         "measures": {"m": {"fn": "max", "col": "x",
                            "partial": "__max_x"}}},
    ]
    assert advise_mvs(reqs, existing=existing_man) == []
    # an existing MV with the right columns but WRONG measures does
    # not cover: min is not derivable from an avg pair
    assert advise_mvs(
        [{"group_cols": ["a"], "aggs": {"mn": ("min", "x")}}],
        existing=[{"group_cols": ["a"],
                   "measures": {"avg_x": ("avg", "x")}}],
    )


def test_advisor_accepts_approx_distinct():
    """Round-18 ADVICE (low): the advisor's measure vocabulary must
    match the rewriter's — a workload carrying the round-17
    approx_distinct HLL measure is advisable, its lineage is
    exact-match only (no derivability folding: an HLL partial serves
    approx_distinct of its own column at any coarser grain and
    nothing else), and an existing MV storing the partial covers."""
    reqs = [
        {"group_cols": ["a"],
         "aggs": {"u": ("approx_distinct", "x"), "n": ("count", None)}},
        {"group_cols": ["a", "b"],
         "aggs": {"u": ("approx_distinct", "x")}},
    ]
    advised = advise_mvs(reqs)
    assert len(advised) == 1
    assert advised[0]["group_cols"] == ["a", "b"]
    assert advised[0]["covers"] == [0, 1]
    assert advised[0]["measures"]["approx_distinct_x"] == (
        "approx_distinct", "x"
    )
    # exact-lineage only: a sum/avg of x does NOT serve it, and it
    # serves no sum
    assert advise_mvs(
        reqs[:1],
        existing=[{"group_cols": ["a"],
                   "measures": {"avg_x": ("avg", "x")}}],
    )
    assert advise_mvs(
        [{"group_cols": ["a"], "aggs": {"s": ("sum", "x")}}],
        existing=[{"group_cols": ["a"],
                   "measures": {"u": ("approx_distinct", "x")}}],
    )
    # ... while the matching partial covers exactly
    assert advise_mvs(
        reqs[:1],
        existing=[{"group_cols": ["a"],
                   "measures": {"u": ("approx_distinct", "x")}}],
    ) == []


@st.composite
def _star_request(draw):
    """A request optionally carrying one of two fixed topologies."""
    r = draw(_request())
    topo = draw(st.sampled_from([None, "t1", "t2"]))
    if topo == "t1":
        r["topology"] = {"fact_path": "/f1",
                         "dims": [("/d1", ["k1"])]}
    elif topo == "t2":
        r["topology"] = {"fact_path": "/f1",
                         "dims": [("/d1", ["k1"]), ("/d2", ["k2"])]}
    return r


@settings(
    max_examples=60, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_star_request(), min_size=1, max_size=8))
def test_join_aware_advise_covers_and_antichain_per_topology(reqs):
    """Round-18 advise_mvs_workload: every request covered by a spec
    of ITS OWN topology (the rewriter never serves across topologies),
    advised column sets form an antichain WITHIN each topology, and
    measure derivability is judged by the rewriter's own check."""
    from pulsar_cdc_experiment_spark.plans.mv_advisor import (
        advise_mvs_workload,
    )

    advised = advise_mvs_workload(reqs)

    def key_of_req(r):
        t = r.get("topology")
        return (
            None if t is None
            else (t["fact_path"],
                  tuple((p, tuple(on)) for p, on in t["dims"]))
        )

    def key_of_spec(a):
        if a.get("kind") != "join":
            return None
        return (a["fact_path"],
                tuple((p, tuple(on)) for p, on in a["dims"]))

    # antichain within each topology
    by_key: dict = {}
    for a in advised:
        by_key.setdefault(key_of_spec(a), []).append(
            frozenset(a["group_cols"])
        )
    for sets in by_key.values():
        for i, s in enumerate(sets):
            for j, t in enumerate(sets):
                if i != j:
                    assert not s <= t, (s, t)
    # cover: same-topology subsumption + rewriter-judged measures
    for idx, r in enumerate(reqs):
        need = set(r["group_cols"]) | set(r.get("where_cols", []))
        serving = [a for a in advised if idx in a["covers"]]
        assert serving, f"request {idx} uncovered"
        for a in serving:
            assert key_of_spec(a) == key_of_req(r), (a, r)
            assert need <= set(a["group_cols"])
            man = {"measures": {
                out: {"fn": fn, "col": col,
                      **({} if col is None
                         else {"partial": f"p_{fn}_{col}"})}
                for out, (fn, col) in a["measures"].items()
            }}
            assert _measures_servable(man, r["aggs"]), (a, r)
    # every request index appears in covers (possibly under several
    # maximal sets — the lattice allows overlap, as in advise_mvs)
    assert {i for a in advised for i in a["covers"]} == set(
        range(len(reqs))
    )


def test_join_aware_advise_end_to_end_rewriter_judged(spark):
    """The advised join MV is judged by answer_join_aggregate ITSELF:
    create the advised set, then every star request in the workload
    must route to an advised join MV and match the direct star join;
    the plain request routes to the single-table spec, never the join
    MV. Incremental advising with an existing join-MV manifest
    returns exactly the gap."""
    from pulsar_cdc_experiment_spark.plans.mv import (
        answer_join_aggregate,
    )
    from pulsar_cdc_experiment_spark.plans.mv_advisor import (
        advise_mvs_workload,
        create_advised_join_mvs,
    )

    base = tempfile.mkdtemp(prefix="mvj_adv_")
    try:
        fact_path = os.path.join(base, "fact")
        dim_path = os.path.join(base, "dim")
        mv_root = os.path.join(base, "mvs")
        spark.createDataFrame(
            [(i, i % 20, ["u", "v"][i % 2], i * 7 % 300)
             for i in range(400)],
            "id bigint, fk bigint, pri string, cents bigint",
        ).write.parquet(fact_path)
        spark.createDataFrame(
            [(k, ["a", "b", "c"][k % 3]) for k in range(20)],
            "fk bigint, seg string",
        ).write.parquet(dim_path)
        fact = spark.read.parquet(fact_path).select(
            "fk", "pri", "cents"
        )
        dim = spark.read.parquet(dim_path)
        topo = {"fact_path": fact_path, "dims": [(dim_path, ["fk"])]}
        workload = [
            {"topology": topo, "group_cols": ["seg"],
             "aggs": {"n": ("count", None), "s": ("sum", "cents")}},
            {"topology": topo, "group_cols": ["pri"],
             "where_cols": ["seg"],
             "aggs": {"av": ("avg", "cents")}},
        ]
        advised = advise_mvs_workload(workload)
        assert len(advised) == 1 and advised[0]["kind"] == "join"
        assert advised[0]["covers"] == [0, 1]
        create_advised_join_mvs(
            spark, mv_root, fact=fact,
            dims=[(dim, dim_path, ["fk"])], advised=advised,
        )
        dims = [(dim, dim_path, ["fk"])]
        for req in workload:
            df, used = answer_join_aggregate(
                spark, mv_root, fact, fact_path, dims,
                group_cols=req["group_cols"], aggs=req["aggs"],
                where=[("seg", "=", "a")]
                if req.get("where_cols") else None,
            )
            assert used == "advised_join_0", req
            base_df = fact.join(dim, ["fk"])
            if req.get("where_cols"):
                base_df = base_df.filter(F.col("seg") == "a")
            exprs = []
            for out, (fn, col) in req["aggs"].items():
                exprs.append(
                    F.count("*").alias(out) if fn == "count"
                    and col is None
                    else getattr(F, fn)(col).alias(out)
                )
            want = {
                tuple(r[c] for c in req["group_cols"]):
                tuple(r[o] for o in req["aggs"])
                for r in base_df.groupBy(*req["group_cols"])
                .agg(*exprs).collect()
            }
            got = {
                tuple(r[c] for c in req["group_cols"]):
                tuple(r[o] for o in req["aggs"])
                for r in df.collect()
            }
            assert got == want, req
        # incremental: the manifest of the created join MV covers the
        # whole star workload; only a NEW topology request remains
        import json as _json

        with open(os.path.join(
            mv_root, "advised_join_0", "mv.json"
        )) as f:
            man = _json.load(f)
        topo2 = {"fact_path": fact_path,
                 "dims": [(dim_path, ["fk"]), (dim_path, ["fk"])]}
        gap = advise_mvs_workload(
            workload + [{"topology": topo2, "group_cols": ["seg"],
                         "aggs": {"n": ("count", None)}}],
            existing=[man],
        )
        assert len(gap) == 1 and gap[0]["covers"] == [2]
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_workload_request_rate_bridges_advisor_to_router():
    """Round-19: workload_request_rate sums the counts of exactly the
    requests an MV spec serves — same subsumption/derivability/topology
    rules as the rewriter — so the staleness-policy router can weigh
    request frequency."""
    from pulsar_cdc_experiment_spark.plans.mv_advisor import (
        workload_request_rate,
    )

    topo = {
        "fact_path": "/t/orders",
        "dims": [("/t/cust", ["o_custkey"])],
    }
    requests = [
        # served: columns subsumed, sum derivable from the avg pair
        {"group_cols": ["g"], "aggs": {"s": ("sum", "cents")},
         "count": 40},
        # served: coarser (grand total), count(*) always stored
        {"group_cols": [], "aggs": {"n": ("count", None)}, "count": 7},
        # NOT served: needs a column the spec lacks
        {"group_cols": ["other"], "aggs": {"n": ("count", None)},
         "count": 100},
        # NOT served: measure not derivable (max not stored)
        {"group_cols": ["g"], "aggs": {"mx": ("max", "cents")},
         "count": 100},
        # NOT served: different topology (join request, plain spec)
        {"group_cols": ["g"], "aggs": {"n": ("count", None)},
         "count": 100, "topology": topo},
        # default count = 1
        {"group_cols": ["g"], "where_cols": ["g"],
         "aggs": {"a": ("avg", "cents")}},
    ]
    plain_spec = {
        "group_cols": ["g"],
        "measures": {"avg_cents": ("avg", "cents")},
    }
    assert workload_request_rate(requests, plain_spec) == 48

    # a join spec serves only its-topology requests
    join_spec = {
        "group_cols": ["g"],
        "measures": {"n": ("count", None)},
        "topology": topo,
    }
    assert workload_request_rate(requests, join_spec) == 100

    # the ADVISED-SPEC form (advise_mvs_workload's own output:
    # kind/fact_path/dims, no 'topology' key) must key by its real
    # topology too — round-19 review finding: it fell into the plain
    # bucket and counted the wrong requests
    advised_form = {
        "kind": "join",
        "group_cols": ["g"],
        "measures": {"n": ("count", None)},
        "fact_path": topo["fact_path"],
        "dims": [(p, list(on)) for p, on in topo["dims"]],
    }
    assert workload_request_rate(requests, advised_form) == 100
