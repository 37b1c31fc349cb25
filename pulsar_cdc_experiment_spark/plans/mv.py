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
    Each measure (fn, col) stores the partials its rollup needs; count
    and avg share the __cnt partial, avg additionally needs the sum."""
    exprs: dict[str, object] = {"__cnt": F.count("*")}
    meta: dict[str, dict] = {}
    for out, (fn, col) in measures.items():
        if fn not in _DERIVABLE:
            raise ValueError(
                f"measure {out}: fn must be one of {_DERIVABLE}, got {fn}"
            )
        if fn == "count":
            meta[out] = {"fn": "count", "col": None}
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
    ``operators/materialize.minmax_delta_maintain`` (round-13's
    non-invertible IVM): count/sum fold invertibly from the delta alone;
    MIN/MAX fold on inserts and recompute ONLY the groups whose stored
    extremum a delete reached, semi-join-pruned from ``base_new`` (the
    post-changeset fact projection — the only time the fact is touched,
    and only for risky groups). V1 contract: the MV's measures must
    reference ONE value column (fail loud otherwise). ``changes``
    carries the group columns + the value column + ``__z`` (+1/−1).

    Publishes via the same atomic data-dir swap as ``refresh_mv`` and
    RE-FINGERPRINTS against the source's CURRENT state — so the
    staleness guard accepts the maintained MV exactly when the caller
    maintained it against the state the fact actually reached. Work is
    O(changeset + groups + risky-group base scan) vs refresh_mv's full
    fact pass."""
    from ..operators.materialize import minmax_delta_maintain

    with maintenance_lock(mv_root):
        d = _mv_dir(mv_root, name)
        with open(os.path.join(d, "mv.json")) as f:
            man = json.load(f)
        vals = {m["col"] for m in man["measures"].values() if m["col"]}
        if len(vals) != 1:
            raise ValueError(
                "maintain_mv v1 needs measures over exactly one value "
                f"column, this MV has {sorted(vals)}"
            )
        val = vals.pop()
        group_cols = man["group_cols"]
        from .mor import _read_cached

        data = _read_cached(spark, os.path.join(d, "data"))
        have_min = f"__min_{val}" in data.columns
        have_max = f"__max_{val}" in data.columns
        view = data.select(
            *group_cols,
            F.col("__cnt").alias("n_rows"),
            (F.col(f"__sum_{val}") if f"__sum_{val}" in data.columns
             else F.lit(0).cast("long")).alias("sum_v"),
            (F.col(f"__min_{val}") if have_min
             else F.lit(None).cast("long")).alias("min_v"),
            (F.col(f"__max_{val}") if have_max
             else F.lit(None).cast("long")).alias("max_v"),
        )
        new_rows = minmax_delta_maintain(
            view, base_new, changes.select(*group_cols, val, "__z"),
            group_cols, val,
        )
        touched = changes.select(*group_cols).distinct()
        untouched = view.join(touched, group_cols, "left_anti")
        merged = untouched.unionByName(new_rows)
        out = merged.select(
            *group_cols,
            F.col("n_rows").alias("__cnt"),
            *(
                [F.col("sum_v").alias(f"__sum_{val}")]
                if f"__sum_{val}" in data.columns else []
            ),
            *([F.col("min_v").alias(f"__min_{val}")] if have_min else []),
            *([F.col("max_v").alias(f"__max_{val}")] if have_max else []),
        )
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


def answer_aggregate(
    spark: SparkSession,
    mv_root: str,
    source: DataFrame,
    source_path: str,
    *,
    group_cols: Sequence[str],
    aggs: dict,
) -> tuple[DataFrame, str | None]:
    """Plan ``source.groupBy(group_cols).agg(aggs)`` (``aggs``:
    ``{out: (fn, col)}``), served from the best subsuming FRESH
    materialized view when one exists, else from the base. Returns
    ``(df, mv_name | None)`` so callers can assert the routing.

    Subsumption: ``mv.group_cols ⊇ group_cols`` AND every requested
    measure matches a registered measure's (fn, col) lineage (avg
    additionally needs the sum+count partials, which every MV stores).
    Freshness: the MV's fingerprint must equal the source's CURRENT
    file state — otherwise the MV is invisible to the planner (stale
    answers are wrong answers, not fast ones)."""
    group_cols = list(group_cols)
    aggs = dict(aggs)
    want = set(group_cols)
    current = None  # lazily computed fingerprint

    candidates = []
    for man in _list_mvs(mv_root):
        if man["source_path"] != source_path:
            continue
        if not want <= set(man["group_cols"]):
            continue
        lineage = {
            (m["fn"], m["col"]): m for m in man["measures"].values()
        }
        ok = True
        for out, (fn, col) in aggs.items():
            if fn == "count":
                continue  # __cnt always stored
            key = (fn, col)
            if key not in lineage and not (
                fn == "avg" and ("sum", col) in lineage
            ) and not (
                fn == "sum" and ("avg", col) in lineage
            ):
                ok = False
                break
        if not ok:
            continue
        if current is None:
            current = _fingerprint(source_path)
        if man["fingerprint"] != current:
            continue  # stale — invisible
        candidates.append(man)

    if not candidates:
        exprs = []
        for out, (fn, col) in aggs.items():
            if fn == "count":
                exprs.append(F.count("*").alias(out))
            elif fn == "avg":
                exprs.append(
                    (F.sum(col) / F.count("*")).alias(out)
                )
            else:
                exprs.append(getattr(F, fn)(col).alias(out))
        return source.groupBy(*group_cols).agg(*exprs), None

    # coarsest subsuming MV = fewest group columns = smallest rollup read
    man = min(candidates, key=lambda m: len(m["group_cols"]))
    # schema-cached read (the read_version/read_mor discipline): a
    # registered query re-planning the same MV runs zero Spark jobs
    from .mor import _read_cached

    mv = _read_cached(
        spark, os.path.join(_mv_dir(mv_root, man["name"]), "data")
    )
    by_lineage = {
        (m["fn"], m["col"]): m.get("partial")
        for m in man["measures"].values()
    }
    exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            exprs.append(F.sum("__cnt").alias(out))
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
        else:  # avg: derived sum over derived count — never avg-of-avgs
            exprs.append(
                (F.sum(part) / F.sum("__cnt")).alias(out)
            )
    return mv.groupBy(*group_cols).agg(*exprs), man["name"]
