"""Materialized views with aggregate-navigation query rewrite.

Open-source Spark has no materialized-view rewrite: a BI query that
groups a 100 TB fact by two columns re-scans the fact even when a
kilobyte summary table already answers it. This module supplies the
classic OLAP answer (aggregate navigation — the Kimball/Calcite
materialized-view-matching idea, public in both literatures):

- ``create_mv`` persists PARTIAL aggregates (sum/count/min/max) at a
  declared group-column granularity, plus a manifest recording the
  grouping, the measure lineage, and a SOURCE-STATE FINGERPRINT.
- ``answer_aggregate`` plans a requested ``groupBy(cols).agg(...)``:
  if some registered MV SUBSUMES the request — its group columns are a
  superset of the requested ones (so the request is a rollup of the MV)
  and every requested measure is derivable from its partials — the plan
  reads the MV and re-aggregates; otherwise it computes from the base.
  Derivations: ``sum ← sum of partial sums``, ``count ← sum of partial
  counts``, ``min/max ← min/max of partials``, ``avg ← derived
  sum DIV/÷ derived count`` (never an average of averages).
- **Staleness guard**: the rewrite is used ONLY if the source's current
  file state matches the fingerprint captured at create/refresh time —
  a stale MV silently serving old numbers is the classic MV bug, so the
  planner falls back to the base instead. ``refresh_mv`` recomputes and
  re-fingerprints behind an atomic directory swap.

At 100 TB this is the difference between a dashboard query costing a
fact-table scan and costing an MB-scale summary read; the fingerprint
is what a table format's snapshot id provides for free. Candidate
choice among multiple subsuming MVs: fewest group columns (coarsest =
smallest) wins.

Reference analog: the reference's enriched topic feeds downstream
consumers that overwhelmingly run the same per-table/per-op rollups
(docs/architecture.md:9-73); a summary-serving layer is how that is
made cheap at scale.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .layout import maintenance_lock

#: requested-measure functions the rewriter understands
_DERIVABLE = ("sum", "count", "min", "max", "avg")


def _fingerprint(path: str) -> list:
    """Source file state (relpath, name, mtime_ns, size) — the staleness
    token. At 100 TB a table format's snapshot id plays this role."""
    state = []
    if os.path.isfile(path):
        st = os.stat(path)
        return [[".", os.path.basename(path), st.st_mtime_ns, st.st_size]]
    for dirpath, dirnames, filenames in os.walk(path):
        dirnames[:] = sorted(
            d for d in dirnames if not d.startswith((".", "_"))
        )
        for fn in sorted(filenames):
            if fn.startswith((".", "_")):
                continue
            st = os.stat(os.path.join(dirpath, fn))
            state.append(
                [os.path.relpath(dirpath, path), fn,
                 st.st_mtime_ns, st.st_size]
            )
    return state


def _mv_dir(mv_root: str, name: str) -> str:
    return os.path.join(mv_root, name)


def _partials(measures: dict) -> tuple[list, dict]:
    """(aggregate exprs for the MV build, partial-column metadata).
    Each measure (fn, col) stores the partials its rollup needs.
    ``count(*)`` (col=None) uses the shared all-rows ``__cnt``;
    ``count(col)`` and ``avg(col)`` store the per-column NON-NULL count
    ``__cnt_{col}`` — ANSI AVG/COUNT(col) skip NULLs, so dividing the
    null-skipping sum by the all-rows count would be silently wrong on
    any nullable measure column."""
    exprs: dict[str, object] = {"__cnt": F.count("*")}
    meta: dict[str, dict] = {}
    for out, (fn, col) in measures.items():
        if fn not in _DERIVABLE:
            raise ValueError(
                f"measure {out}: fn must be one of {_DERIVABLE}, got {fn}"
            )
        if fn == "count" and col is None:
            meta[out] = {"fn": "count", "col": None}
            continue
        if fn in ("count", "avg"):
            exprs[f"__cnt_{col}"] = F.count(col)
        if fn == "count":
            meta[out] = {
                "fn": "count", "col": col, "partial": f"__cnt_{col}"
            }
            continue
        part = f"__{fn if fn != 'avg' else 'sum'}_{col}"
        if fn in ("sum", "avg"):
            exprs[part] = F.sum(col)
        elif fn == "min":
            exprs[part] = F.min(col)
        else:
            exprs[part] = F.max(col)
        meta[out] = {"fn": fn, "col": col, "partial": part}
    return [e.alias(n) for n, e in exprs.items()], meta


def create_mv(
    spark: SparkSession,
    mv_root: str,
    *,
    name: str,
    source_path: str,
    source: DataFrame,
    group_cols: Sequence[str],
    measures: dict,
) -> dict:
    """Materialize ``source`` grouped by ``group_cols`` with partial
    aggregates for ``measures`` (``{out_name: (fn, col)}``, fn ∈
    sum/count/min/max/avg). ``source_path`` is the fingerprinted
    base-table directory ``source`` reads from."""
    group_cols = list(group_cols)
    exprs, meta = _partials(dict(measures))
    os.makedirs(mv_root, exist_ok=True)
    with maintenance_lock(mv_root):
        d = _mv_dir(mv_root, name)
        if os.path.exists(os.path.join(d, "mv.json")):
            raise ValueError(f"materialized view {name} already exists")
        source.groupBy(*group_cols).agg(*exprs).write.mode(
            "errorifexists"
        ).parquet(os.path.join(d, "data"))
        man = {
            "name": name,
            "source_path": source_path,
            "group_cols": group_cols,
            "measures": meta,
            "fingerprint": _fingerprint(source_path),
        }
        tmp = os.path.join(d, "mv.json.tmp")
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, os.path.join(d, "mv.json"))
        return man


def refresh_mv(
    spark: SparkSession, mv_root: str, name: str, source: DataFrame
) -> dict:
    """Recompute the MV against the source's CURRENT state behind an
    atomic swap (stale data dir replaced only after the new one is
    complete; the manifest re-fingerprints last)."""
    with maintenance_lock(mv_root):
        d = _mv_dir(mv_root, name)
        with open(os.path.join(d, "mv.json")) as f:
            man = json.load(f)
        exprs, _ = _partials(
            {
                out: (m["fn"], m["col"])
                for out, m in man["measures"].items()
            }
        )
        staged = os.path.join(d, ".data_staged")
        shutil.rmtree(staged, ignore_errors=True)
        source.groupBy(*man["group_cols"]).agg(*exprs).write.mode(
            "overwrite"
        ).parquet(staged)
        old = os.path.join(d, ".data_old")
        shutil.rmtree(old, ignore_errors=True)
        os.rename(os.path.join(d, "data"), old)
        os.rename(staged, os.path.join(d, "data"))
        shutil.rmtree(old, ignore_errors=True)
        man["fingerprint"] = _fingerprint(man["source_path"])
        tmp = os.path.join(d, "mv.json.tmp")
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, os.path.join(d, "mv.json"))
        return man


def maintain_mv(
    spark: SparkSession,
    mv_root: str,
    name: str,
    changes: DataFrame,
    *,
    base_new: DataFrame,
) -> dict:
    """INCREMENTAL maintenance of an MV from a z-weighted changeset —
    the CDC-to-summary loop closed: a MERGE lands on the fact, the same
    changeset (insert = +1 row, delete = −1 row with the BEFORE image,
    update = the −1/+1 pair) folds into the MV's partials, and the
    rewrite keeps serving fresh numbers without ever recomputing the
    summary from the 100 TB fact.

    Delegates the aggregate math to
    ``operators/materialize.mv_partial_delta_maintain`` (the
    multi-measure-column generalization of round-13's non-invertible
    IVM): count / sum / per-column NON-NULL count fold invertibly from
    the delta alone; MIN/MAX fold on inserts and recompute ONLY the
    groups whose stored extremum (of ANY measure column) a delete
    reached, semi-join-pruned from ``base_new`` (the post-changeset
    fact projection — the only time the fact is touched, and only for
    risky groups). ``changes`` carries the group columns + every
    measure column + ``__z`` (+1/−1). Sum-bearing measure columns must
    be integral (bigint cents — the telescoping-sum contract): a
    non-integral stored sum partial fails loud instead of silently
    truncating through the fold's long arithmetic.

    Publishes via the same atomic data-dir swap as ``refresh_mv`` and
    RE-FINGERPRINTS against the source's CURRENT state — so the
    staleness guard accepts the maintained MV exactly when the caller
    maintained it against the state the fact actually reached. Work is
    O(changeset + groups + risky-group base scan) vs refresh_mv's full
    fact pass."""
    from ..operators.materialize import mv_partial_delta_maintain

    with maintenance_lock(mv_root):
        d = _mv_dir(mv_root, name)
        with open(os.path.join(d, "mv.json")) as f:
            man = json.load(f)
        group_cols = man["group_cols"]
        # per-column partial spec from the measure lineage
        _KIND = {"sum": "sum", "avg": "sum", "count": "cnt",
                 "min": "min", "max": "max"}
        spec: dict[str, set] = {}
        for m in man["measures"].values():
            if m["col"] is None:
                continue  # count(*) rides the shared __cnt
            spec.setdefault(m["col"], set()).add(_KIND[m["fn"]])
            if m["fn"] in ("avg", "count"):
                spec[m["col"]].add("cnt")
        missing = [
            c for c in list(group_cols) + sorted(spec) + ["__z"]
            if c not in changes.columns
        ]
        if missing:
            raise ValueError(f"changes lacks column(s) {missing}")
        missing = [
            c for c in list(group_cols) + sorted(spec)
            if c not in base_new.columns
        ]
        if missing:
            raise ValueError(f"base_new lacks column(s) {missing}")
        from .mor import _read_cached

        data = _read_cached(spark, os.path.join(d, "data"))
        _INTEGRAL = ("bigint", "int", "smallint", "tinyint")
        dtypes = dict(data.dtypes)
        for c, kinds in spec.items():
            if "sum" in kinds and dtypes.get(f"__sum_{c}") not in _INTEGRAL:
                raise ValueError(
                    f"maintain_mv needs an integral sum partial (the "
                    f"telescoping-sum contract); __sum_{c} is "
                    f"{dtypes.get(f'__sum_{c}')} — refresh_mv this MV "
                    "instead, or store the measure as integer cents"
                )
        new_rows = mv_partial_delta_maintain(
            data, base_new,
            changes.select(*group_cols, *sorted(spec), "__z"),
            group_cols, spec,
            # this is a maintenance VERB (jobs allowed): one O(groups +
            # changeset) probe skips the risky-recompute leg — and with
            # it the base scan — in the common no-extremum-hit batch
            precheck_risky=True,
        )
        touched = changes.select(*group_cols).distinct()
        untouched = data.join(touched, group_cols, "left_anti")
        out = untouched.unionByName(new_rows.select(*data.columns))
        staged = os.path.join(d, ".data_staged")
        shutil.rmtree(staged, ignore_errors=True)
        out.write.mode("overwrite").parquet(staged)
        old = os.path.join(d, ".data_old")
        shutil.rmtree(old, ignore_errors=True)
        os.rename(os.path.join(d, "data"), old)
        os.rename(staged, os.path.join(d, "data"))
        shutil.rmtree(old, ignore_errors=True)
        man["fingerprint"] = _fingerprint(man["source_path"])
        tmp = os.path.join(d, "mv.json.tmp")
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, os.path.join(d, "mv.json"))
        return man


def scrub_mv_groups(
    spark: SparkSession, mv_root: str, name: str, group_rows: DataFrame
) -> dict:
    """GDPR erasure reaching the SUMMARY layer: remove every MV row
    whose group-column values match a row of ``group_rows`` (columns
    must be a non-empty subset of the MV's group columns — when an MV
    is keyed on a user/customer identifier, the GROUP VALUES are the
    PII that erasure must reach, even though the measures are
    aggregates). One anti-join over the O(groups) summary, atomic data
    swap, and a re-fingerprint against the source's CURRENT state.

    Correctness contract: call AFTER the fact-side purge. A purged key
    contributes zero rows to the post-purge fact, so dropping its group
    rows makes the MV EQUAL a full recompute — which is exactly why the
    re-fingerprint is sound. (Without the scrub the MV is merely stale:
    the fact purge bumps the source fingerprint — for merge-on-read
    sources the manifest's mutation counter — so the planner refuses to
    serve the purged contributions either way; the scrub is what
    restores summary serving WITHOUT a fact-scan refresh.) Returns
    ``{"groups_scrubbed": n}``."""
    with maintenance_lock(mv_root):
        d = _mv_dir(mv_root, name)
        with open(os.path.join(d, "mv.json")) as f:
            man = json.load(f)
        cols = list(group_rows.columns)
        bad = [c for c in cols if c not in man["group_cols"]]
        if bad or not cols:
            raise ValueError(
                f"scrub columns must be a non-empty subset of the MV's "
                f"group columns {man['group_cols']}; got {cols}"
            )
        from .mor import _read_cached

        data = _read_cached(spark, os.path.join(d, "data"))
        keys = group_rows.distinct()
        n = data.join(keys, cols, "left_semi").count()
        out = data.join(keys, cols, "left_anti")
        staged = os.path.join(d, ".data_staged")
        shutil.rmtree(staged, ignore_errors=True)
        out.write.mode("overwrite").parquet(staged)
        old = os.path.join(d, ".data_old")
        shutil.rmtree(old, ignore_errors=True)
        os.rename(os.path.join(d, "data"), old)
        os.rename(staged, os.path.join(d, "data"))
        shutil.rmtree(old, ignore_errors=True)
        man["fingerprint"] = _fingerprint(man["source_path"])
        tmp = os.path.join(d, "mv.json.tmp")
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, os.path.join(d, "mv.json"))
        return {"groups_scrubbed": n}


def changes_from_feed(feed: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Adapt a CHANGE-FEED output (``change_type`` ∈ insert / delete /
    update_pre / update_post plus row-image columns — the contract both
    ``plans.merge.change_feed`` and ``plans.mor.change_feed_mor`` emit)
    into the z-weighted changeset ``maintain_mv`` folds: the post-change
    images (insert, update_post) weigh +1, the removed images (delete,
    update_pre) weigh −1. ``cols`` is the projection the MV needs (group
    columns + measure columns). This closes the CDC→table→summary loop
    with no hand-built delta: a MERGE lands, its feed maintains every
    downstream MV."""
    return feed.select(
        *cols,
        F.when(
            F.col("change_type").isin("insert", "update_post"), F.lit(1)
        ).otherwise(F.lit(-1)).alias("__z"),
    )


def _list_mvs(mv_root: str) -> list[dict]:
    out = []
    if not os.path.isdir(mv_root):
        return out
    for d in sorted(os.listdir(mv_root)):
        p = os.path.join(mv_root, d, "mv.json")
        if os.path.exists(p):
            with open(p) as f:
                out.append(json.load(f))
    return out


#: simple-predicate operators the rewriter understands
_PRED_OPS = ("=", "!=", "<", "<=", ">", ">=", "in")


def _pred_expr(col: str, op: str, value):
    c = F.col(col)
    if op == "=":
        return c == F.lit(value)
    if op == "!=":
        return c != F.lit(value)
    if op == "<":
        return c < F.lit(value)
    if op == "<=":
        return c <= F.lit(value)
    if op == ">":
        return c > F.lit(value)
    if op == ">=":
        return c >= F.lit(value)
    if op == "in":
        return c.isin(*value)
    raise ValueError(f"predicate op must be one of {_PRED_OPS}, got {op}")


def answer_aggregate(
    spark: SparkSession,
    mv_root: str,
    source: DataFrame,
    source_path: str,
    *,
    group_cols: Sequence[str],
    aggs: dict,
    where: Sequence[tuple] | None = None,
) -> tuple[DataFrame, str | None]:
    """Plan ``source.filter(where).groupBy(group_cols).agg(aggs)``
    (``aggs``: ``{out: (fn, col)}``; ``where``: optional conjunction of
    ``(col, op, literal)`` triples, op ∈ ``=,!=,<,<=,>,>=,in``), served
    from the best subsuming FRESH materialized view when one exists,
    else from the base. Returns ``(df, mv_name | None)`` so callers can
    assert the routing.

    Subsumption: ``mv.group_cols ⊇ group_cols``, every PREDICATE column
    is an MV group column (a predicate on a grouping dimension filters
    the partials exactly — the filtered-rollup shape BI dashboards hit
    constantly; a predicate on any other column forces the base), and
    every requested measure is derivable from the registered lineage:
    ``count(*)`` from the always-stored ``__cnt``, ``count(col)`` /
    ``avg(col)`` from the per-column NON-NULL count partial (stored by
    count(col)/avg(col) measures), ``sum`` from a sum or avg measure's
    sum partial, min/max from exact lineage. avg derives as sum ÷
    non-null count — never an average of averages, never count(*).
    Freshness: the MV's fingerprint must equal the source's CURRENT
    file state — otherwise the MV is invisible to the planner (stale
    answers are wrong answers, not fast ones)."""
    group_cols = list(group_cols)
    aggs = dict(aggs)
    where = [tuple(p) for p in (where or [])]
    for col, op, _ in where:
        if op not in _PRED_OPS:
            raise ValueError(
                f"predicate op must be one of {_PRED_OPS}, got {op}"
            )
    want = set(group_cols)
    pred_cols = {col for col, _, _ in where}
    current = None  # lazily computed fingerprint

    candidates = []
    for man in _list_mvs(mv_root):
        if man["source_path"] != source_path:
            continue
        if not want <= set(man["group_cols"]):
            continue
        if not pred_cols <= set(man["group_cols"]):
            continue
        lineage = {
            (m["fn"], m["col"]): m for m in man["measures"].values()
        }

        def _servable(fn, col, lineage=lineage):
            if fn == "count" and col is None:
                return True  # __cnt always stored
            if fn == "count":
                return ("count", col) in lineage or ("avg", col) in lineage
            if fn == "sum":
                return ("sum", col) in lineage or ("avg", col) in lineage
            if fn == "avg":
                return ("avg", col) in lineage or (
                    ("sum", col) in lineage and ("count", col) in lineage
                )
            return (fn, col) in lineage

        if not all(_servable(fn, col) for fn, col in aggs.values()):
            continue
        if current is None:
            current = _fingerprint(source_path)
        if man["fingerprint"] != current:
            continue  # stale — invisible
        candidates.append(man)

    if not candidates:
        base = source
        for col, op, value in where:
            base = base.filter(_pred_expr(col, op, value))
        exprs = []
        for out, (fn, col) in aggs.items():
            if fn == "count" and col is None:
                exprs.append(F.count("*").alias(out))
            elif fn == "count":
                exprs.append(F.count(col).alias(out))
            elif fn == "avg":
                exprs.append(F.avg(col).alias(out))
            else:
                exprs.append(getattr(F, fn)(col).alias(out))
        return base.groupBy(*group_cols).agg(*exprs), None

    # coarsest subsuming MV = fewest group columns = smallest rollup read
    man = min(candidates, key=lambda m: len(m["group_cols"]))
    # schema-cached read (the read_version/read_mor discipline): a
    # registered query re-planning the same MV runs zero Spark jobs
    from .mor import _read_cached

    mv = _read_cached(
        spark, os.path.join(_mv_dir(mv_root, man["name"]), "data")
    )
    for col, op, value in where:
        mv = mv.filter(_pred_expr(col, op, value))
    by_lineage = {
        (m["fn"], m["col"]): m.get("partial")
        for m in man["measures"].values()
    }
    exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "count" and col is None:
            exprs.append(F.sum("__cnt").alias(out))
            continue
        if fn == "count":
            exprs.append(F.sum(f"__cnt_{col}").alias(out))
            continue
        part = by_lineage.get((fn, col)) or by_lineage.get(
            ("avg", col) if fn == "sum" else ("sum", col)
        )
        if fn in ("sum", "avg") and part is None:
            part = f"__sum_{col}"
        if fn == "sum":
            exprs.append(F.sum(part).alias(out))
        elif fn == "min":
            exprs.append(F.min(part).alias(out))
        elif fn == "max":
            exprs.append(F.max(part).alias(out))
        else:  # avg: derived sum over derived NON-NULL count
            exprs.append(
                (F.sum(part) / F.sum(f"__cnt_{col}")).alias(out)
            )
    return mv.groupBy(*group_cols).agg(*exprs), man["name"]
