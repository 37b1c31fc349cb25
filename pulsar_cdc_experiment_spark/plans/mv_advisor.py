"""Workload-driven materialized-view advisor.

Given a WORKLOAD — the list of aggregate requests a dashboard fleet
actually issues (group columns, measures, predicate columns) — emit a
MINIMAL covering set of MV specs such that every request is served by
some advised MV through the aggregate-navigation rewrite
(``plans.mv.answer_aggregate``), plus a size estimate per advised MV so
an operator can judge the storage/refresh bill before creating them.

This is the classic physical-design problem (the
materialized-view-selection literature, e.g. the SQL Server "index
tuning wizard" line of work and Harinarayan/Rajaraman/Ullman's
"Implementing Data Cubes Efficiently") reduced to the subsumption
lattice this engine's rewriter actually uses:

- a request needs the column set ``group_cols ∪ where_cols`` (the
  rewrite serves a predicate only on MV group columns) and its measures
  derivable from the MV's stored partials;
- an MV whose group columns are a SUPERSET of a request's needed
  columns serves it (coarser requests are rollups of finer MVs), so the
  MAXIMAL needed-column sets of the workload form a covering antichain
  — minimal by construction: dropping any chosen MV leaves the
  requests that defined its column set unserved (no other chosen set
  contains them, else the set would not be maximal);
- each advised MV stores the measure UNION of every request it covers,
  folded through derivability (storing an ``avg`` partial pair also
  serves ``sum`` and ``count`` of the same column; ``count(*)`` is
  always stored).

Cost estimation: one Spark job computes ``approx_count_distinct`` of
the group tuple for EVERY advised spec simultaneously (HLL++ partials,
no shuffle of data rows — the same statistic ``n_groups`` the manifest
maintains exactly after creation). At 100 TB this one pass replaces
creating candidate MVs to measure them.

Reference analog: the reference's downstream consumers re-run the same
per-table/per-op rollups (docs/architecture.md:9-73) — exactly the
repeated-workload shape an advisor compresses into a summary set.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: measure functions the rewriter can derive (mirrors plans.mv).
#: ``approx_distinct`` is exact-lineage-only: an HLL partial serves
#: approx_distinct of ITS column at any coarser grain (sketches union)
#: but derives nothing else — so it passes through _fold_measures
#: untouched, no derivability folding needed.
_FNS = ("sum", "count", "min", "max", "avg", "approx_distinct")


def _norm_request(req: dict, idx: int) -> tuple[frozenset, set]:
    """(needed column set, needed measure lineage) for one request.
    Measures normalize through derivability: ``count(*)`` needs nothing
    stored beyond the always-present ``__cnt``; ``avg`` subsumes the
    ``sum`` and ``count`` of its column."""
    group_cols = list(req.get("group_cols", []))
    where_cols = list(req.get("where_cols", []))
    aggs = dict(req.get("aggs", {}))
    if not aggs:
        raise ValueError(f"request #{idx} has no measures")
    need: set = set()
    for out, (fn, col) in aggs.items():
        if fn not in _FNS:
            raise ValueError(
                f"request #{idx} measure {out}: fn must be one of "
                f"{_FNS}, got {fn}"
            )
        if fn == "count" and col is None:
            continue  # __cnt is always stored
        need.add((fn, col))
    return frozenset(group_cols) | frozenset(where_cols), need


def _fold_measures(lineages: set) -> dict:
    """Measure spec ``{name: (fn, col)}`` storing the requested lineage
    folded through derivability: an ``avg`` partial pair serves
    ``sum``/``count``/``avg`` of its column, so requesting any two of
    them stores only the avg pair."""
    by_col: dict = {}
    for fn, col in lineages:
        by_col.setdefault(col, set()).add(fn)
    out: dict = {}
    for col in sorted(by_col):
        fns = by_col[col]
        if "avg" in fns or ({"sum", "count"} <= fns):
            fns = (fns - {"avg", "sum", "count"}) | {"avg"}
        for fn in sorted(fns):
            out[f"{fn}_{col}"] = (fn, col)
    return out


def advise_mvs(
    requests: Sequence[dict], existing: Sequence[dict] | None = None
) -> list[dict]:
    """Pure planning: fold a workload into a minimal covering MV set.

    ``requests``: each ``{"group_cols": [...], "aggs": {out: (fn,
    col)}, "where_cols": [...]}`` — the exact vocabulary
    ``answer_aggregate`` takes. Returns advised specs ``[{"group_cols",
    "measures", "covers"}]`` (``covers`` = request indices served),
    deterministic order. Guarantees (property-tested):

    - every request index appears in some advised spec's ``covers``,
      and that spec subsumes it (columns ⊇ needed, measures derivable);
    - no advised spec's column set is a subset of another's (an
      antichain — a subsumed MV would be pure waste, its requests are
      served by the superset).

    ``existing`` (incremental advising): already-materialized specs —
    MV manifests, or plain ``{"group_cols", "measures"}`` dicts with
    ``measures`` in either the create vocabulary ``{out: (fn, col)}``
    or the manifest's lineage form. Requests an existing spec already
    serves (columns subsumed AND measures derivable, judged by the
    SAME rules the rewriter applies) are excluded before folding, so
    the advice is exactly the gap: what to ADD to the current summary
    layer for full workload coverage — re-running the advisor after a
    workload shift never re-advises what already exists."""
    normed = [_norm_request(r, i) for i, r in enumerate(requests)]
    if existing:
        from .mv import _measures_servable

        ex = []
        for e in existing:
            meas = e.get("measures", {})
            man = {
                "measures": {
                    out: (
                        m if isinstance(m, dict)
                        else {"fn": m[0], "col": m[1]}
                    )
                    for out, m in meas.items()
                }
            }
            ex.append((set(e["group_cols"]), man))
        covered = [
            i for i, r in enumerate(requests)
            if any(
                normed[i][0] <= cols
                and _measures_servable(man, dict(r.get("aggs", {})))
                for cols, man in ex
            )
        ]
        keep = [i for i in range(len(requests)) if i not in covered]
        if not keep:
            return []
        sub = advise_mvs([requests[i] for i in keep])
        for a in sub:
            a["covers"] = [keep[i] for i in a["covers"]]
        return sub
    col_sets = sorted(
        {cols for cols, _ in normed},
        key=lambda s: (-len(s), sorted(s)),
    )
    maximal: list[frozenset] = []
    for s in col_sets:  # descending size: supersets come first
        if not any(s < m for m in maximal):
            maximal.append(s)
    advised = []
    for m in sorted(maximal, key=lambda s: sorted(s)):
        covers = [
            i for i, (cols, _) in enumerate(normed) if cols <= m
        ]
        lineage: set = set()
        for i in covers:
            lineage |= normed[i][1]
        measures = _fold_measures(lineage)
        measures["n"] = ("count", None)  # __cnt rides along anyway
        advised.append(
            {
                "group_cols": sorted(m),
                "measures": measures,
                "covers": covers,
            }
        )
    return advised


def estimate_mv_sizes(
    spark: SparkSession, source: DataFrame, advised: Sequence[dict]
) -> list[dict]:
    """Annotate advised specs with ``n_groups_est`` — ONE aggregation
    job computing ``approx_count_distinct`` of each spec's group tuple
    simultaneously (HLL++ map-side partials; no data-row shuffle, no
    candidate MV is ever created to be measured). The estimate is the
    same statistic the MV manifest maintains exactly (``n_groups``)
    once a spec is created, so the cost-based candidate choice keeps
    working on the advisor's output."""
    advised = [dict(a) for a in advised]
    if not advised:
        return advised
    exprs = [
        F.approx_count_distinct(
            F.struct(*a["group_cols"])
        ).alias(f"__e{i}")
        for i, a in enumerate(advised)
    ]
    row = source.agg(*exprs).collect()[0]
    for i, a in enumerate(advised):
        a["n_groups_est"] = int(row[f"__e{i}"])
    return advised


def create_advised_mvs(
    spark: SparkSession,
    mv_root: str,
    *,
    source_path: str,
    source: DataFrame,
    advised: Sequence[dict],
    prefix: str = "advised",
) -> list[dict]:
    """Materialize an advised set (names ``{prefix}_{i}`` in advised
    order) — the execution half, one ``create_mv`` per spec."""
    from .mv import create_mv

    out = []
    for i, a in enumerate(advised):
        out.append(
            create_mv(
                spark, mv_root,
                name=f"{prefix}_{i}",
                source_path=source_path,
                source=source,
                group_cols=a["group_cols"],
                measures=a["measures"],
            )
        )
    return out


# ---------------------------------------------------------------------------
# Join-aware advising (round 18): workloads carrying STAR-JOIN topology.
# A request may name its topology — the fact manifest/path plus the
# ordered dim list with join keys, exactly the identity
# ``create_join_mv`` records and ``answer_join_aggregate``'s
# ``_pick_join_mv`` matches on. Requests sharing a topology live in one
# subsumption lattice (a join MV whose group columns ⊇ a same-topology
# request's needed columns serves it — including star requests grouped
# only by fact columns, the "single-table rollup of its own fact
# grain"); requests with DIFFERENT topologies never share an MV, because
# the rewriter itself refuses cross-topology serving (join semantics —
# an inner join is only lossless under FK integrity the planner cannot
# assume).
# ---------------------------------------------------------------------------


def _topo_key(topology: dict) -> tuple:
    """Canonical identity of a star topology: (fact_path, ((dim_path,
    (on, ...)), ...)) — dim ORDER matters, as in the join-MV manifest."""
    return (
        topology["fact_path"],
        tuple(
            (p, tuple(on)) for p, on in topology["dims"]
        ),
    )


def _existing_topo_key(e: dict) -> tuple | None:
    """Topology key of an existing spec (a join-MV manifest or a plain
    dict with fact_path/dims), or None for single-table specs."""
    if "dim_paths" in e:  # manifest form (create_join_mv)
        return (
            e["source_path"],
            tuple(
                (p, tuple(on))
                for p, on in zip(e["dim_paths"], e["join_on"])
            ),
        )
    if "topology" in e:
        return _topo_key(e["topology"])
    if "fact_path" in e and "dims" in e:
        # the advised-spec form advise_mvs_workload itself emits
        # ({"kind": "join", "fact_path", "dims"}) — feeding advice
        # back as `existing` (incremental advising) or into
        # workload_request_rate must key by its real topology, not
        # fall into the plain bucket (round-19 review finding)
        return (
            e["fact_path"],
            tuple((p, tuple(on)) for p, on in e["dims"]),
        )
    return None


def advise_mvs_workload(
    requests: Sequence[dict], existing: Sequence[dict] | None = None
) -> list[dict]:
    """Join-aware :func:`advise_mvs`: each request may carry
    ``"topology": {"fact_path": ..., "dims": [(dim_path, [on, ...]),
    ...]}``. Requests are partitioned by topology (absent = plain
    single-table) and each partition is folded into its own maximal
    antichain by the SAME rules; advised join specs additionally carry
    ``{"kind": "join", "fact_path", "dims"}`` so
    :func:`create_advised_mvs` / ``create_join_mv`` can materialize
    them. ``existing`` may mix plain and join specs (manifest or
    request vocabulary); an existing spec only covers requests of ITS
    topology — exactly the rewriter's own refusal to serve across
    topologies. ``covers`` indices refer to the FULL request list.

    Guarantees (property-tested, per topology): every request covered
    by a subsuming advised-or-existing spec; advised column sets form
    an antichain."""
    groups: dict = {}
    for i, r in enumerate(requests):
        key = _topo_key(r["topology"]) if "topology" in r else None
        groups.setdefault(key, []).append(i)
    ex_by_key: dict = {}
    for e in existing or []:
        ex_by_key.setdefault(_existing_topo_key(e), []).append(e)
    out: list[dict] = []
    for key in sorted(groups, key=lambda k: (k is not None, k)):
        idxs = groups[key]
        sub_reqs = [
            {k2: v for k2, v in requests[i].items() if k2 != "topology"}
            for i in idxs
        ]
        sub = advise_mvs(sub_reqs, existing=ex_by_key.get(key) or None)
        for a in sub:
            a["covers"] = [idxs[j] for j in a["covers"]]
            if key is not None:
                a["kind"] = "join"
                a["fact_path"] = key[0]
                a["dims"] = [
                    (p, list(on)) for p, on in key[1]
                ]
        out.extend(sub)
    return out


def create_advised_join_mvs(
    spark: SparkSession,
    mv_root: str,
    *,
    fact: DataFrame,
    dims: Sequence[tuple],
    advised: Sequence[dict],
    prefix: str = "advised_join",
) -> list[dict]:
    """Materialize advised JOIN specs (``kind == 'join'`` entries from
    :func:`advise_mvs_workload`) — one ``create_join_mv`` per spec.
    ``dims``: ``[(dim_df, dim_path, on_cols), ...]`` and must match
    every spec's recorded topology (create_join_mv re-validates)."""
    from .mv import create_join_mv

    out = []
    for i, a in enumerate(advised):
        if a.get("kind") != "join":
            raise ValueError(
                f"spec #{i} is not a join spec; use create_advised_mvs"
            )
        if [(p, list(on)) for _, p, on in dims] != [
            (p, list(on)) for p, on in a["dims"]
        ]:
            raise ValueError(
                f"spec #{i} topology {a['dims']} does not match the "
                "supplied dims"
            )
        out.append(
            create_join_mv(
                spark, mv_root,
                name=f"{prefix}_{i}",
                fact=fact,
                fact_path=a["fact_path"],
                dims=dims,
                group_cols=a["group_cols"],
                measures=a["measures"],
            )
        )
    return out


def workload_request_rate(requests: Sequence[dict], spec: dict) -> int:
    """The workload→router bridge (round 19): sum the ``count`` (per
    planning period; default 1) of every workload request the given MV
    spec serves — judged by the SAME rules the rewriter and this
    advisor apply (needed columns ⊆ the spec's group columns, measures
    derivable from its stored partials, topology identical). Feed the
    result to ``plans.mv.plan_serve_policy(expected_requests=...)`` so
    the live-vs-maintain routing weighs REQUEST FREQUENCY, not just
    staleness mechanics: a hot dashboard (many requests per maintenance
    window) amortizes one fold where a cold one is cheaper served live.

    ``spec``: an MV manifest (plain or join — ``create_mv`` /
    ``create_join_mv`` form) or a plain ``{"group_cols", "measures"[,
    "topology"|"fact_path"+"dims"]}`` dict, exactly the ``existing``
    vocabulary :func:`advise_mvs` accepts."""
    from .mv import _measures_servable

    meas = spec.get("measures", {})
    man = {
        "measures": {
            out: (m if isinstance(m, dict) else {"fn": m[0], "col": m[1]})
            for out, m in meas.items()
        }
    }
    cols = set(spec["group_cols"])
    spec_topo = _existing_topo_key(spec)
    total = 0
    for i, r in enumerate(requests):
        req_topo = _topo_key(r["topology"]) if "topology" in r else None
        if req_topo != spec_topo:
            continue
        need_cols, _ = _norm_request(r, i)
        if need_cols <= cols and _measures_servable(
            man, dict(r.get("aggs", {}))
        ):
            total += int(r.get("count", 1))
    return total
