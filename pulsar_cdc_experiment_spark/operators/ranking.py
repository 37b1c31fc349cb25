"""Distributed global ranking / ntile — no single-partition total sort.

A bare ``Window.orderBy(...)`` (empty partitionSpec) funnels the ENTIRE
input through one task: the canonical Spark scale-killer. The exact same
semantics decompose into a bucketed two-phase rank:

1. ``approxQuantile`` picks ~`buckets` boundary values on the order column
   (driver-side model state: a few hundred doubles — NOT data).
2. Each row is assigned a bucket by comparing against the sorted boundaries
   (pure JVM expression, no shuffle). The assignment is a monotone function
   of the order column, so bucket i's rows all precede bucket i+1's rows in
   the global order; quantile error only skews bucket SIZES, never
   correctness.
3. Exact per-bucket counts (a tiny aggregate) become per-bucket rank
   offsets on the driver.
4. ``row_number`` over ``Window.partitionBy(bucket)`` — a PARALLEL window,
   one balanced shuffle — plus the bucket's offset is the exact global rank.

``global_ntile`` then maps ranks to tiles with SQL NTILE's exact fill rule
(first ``n_total % n`` tiles get the extra row), bit-identical to
``ntile(n) OVER (ORDER BY ...)`` on any input.

Cost: one full-data shuffle (balanced across buckets) + two tiny jobs,
versus the naive plan's one full-data shuffle INTO A SINGLE TASK. At 100 TB
the naive plan does not finish; this one scales with the cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKET_COL = "__rank_bucket"


def _bucket_expr(value_col: str, bounds: list[float]) -> Column:
    """Monotone bucket assignment: index of the first boundary >= value.

    NULL order values go to bucket -1 — BEFORE every real bucket — because
    ascending SQL ORDER BY (and Spark's default asc) sorts NULLS FIRST;
    routing them anywhere else would give NULL rows the wrong global ranks
    (they used to fall through every `<=` into the LAST bucket).
    """
    expr = F.lit(len(bounds))  # above every boundary
    for i in range(len(bounds) - 1, -1, -1):
        expr = F.when(F.col(value_col) <= F.lit(bounds[i]), F.lit(i)).otherwise(expr)
    return F.when(F.col(value_col).isNull(), F.lit(-1)).otherwise(expr)


def global_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str] | None = None,
    buckets: int = 64,
) -> DataFrame:
    """df + ``__rank`` = exact 1-based global rank by (value, tiebreaks) asc.

    Assumes (value, tiebreaks) is a total order (unique tiebreak) — the same
    precondition ntile-over-ORDER-BY needs for deterministic output.
    """
    ranked, _ = _global_rank_with_total(df, value_col, tiebreak_cols, buckets)
    return ranked


def _global_rank_with_total(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str] | None,
    buckets: int,
) -> tuple[DataFrame, int]:
    tiebreak_cols = tiebreak_cols or []
    probs = [i / buckets for i in range(1, buckets)]
    bounds = df.approxQuantile(value_col, probs, 0.001)
    # dedupe while preserving order (heavy skew can repeat boundaries)
    uniq: list[float] = []
    for b in bounds:
        if not uniq or b > uniq[-1]:
            uniq.append(b)

    bucketed = df.withColumn(BUCKET_COL, _bucket_expr(value_col, uniq))
    counts = {
        r[BUCKET_COL]: r["cnt"]
        for r in bucketed.groupBy(BUCKET_COL).agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    running = 0
    for b in sorted(counts):
        offsets[b] = running
        running += counts[b]

    offset_expr = F.lit(0)
    for b, off in offsets.items():
        offset_expr = F.when(F.col(BUCKET_COL) == b, F.lit(off)).otherwise(offset_expr)

    w = Window.partitionBy(BUCKET_COL).orderBy(
        F.col(value_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    ranked = bucketed.withColumn(
        "__rank", (F.row_number().over(w) + offset_expr).cast("long")
    ).drop(BUCKET_COL)
    return ranked, running


def global_prefix_sum(
    df: DataFrame,
    sum_col: str,
    order_value_col: str,
    tiebreak_cols: list[str] | None = None,
    buckets: int = 64,
) -> DataFrame:
    """df + ``__prefix_sum`` = exact running total of ``sum_col`` over the
    global (order_value, tiebreaks) order — same bucketed two-phase shape
    as :func:`global_rank` (per-bucket SUM offsets instead of counts), so
    no single-partition window. Exact for integer-valued ``sum_col``
    (token counts, byte sizes); float inputs inherit per-bucket summation
    order like any distributed sum.
    """
    tiebreak_cols = tiebreak_cols or []
    probs = [i / buckets for i in range(1, buckets)]
    bounds = df.approxQuantile(order_value_col, probs, 0.001)
    uniq: list[float] = []
    for b in bounds:
        if not uniq or b > uniq[-1]:
            uniq.append(b)

    bucketed = df.withColumn(BUCKET_COL, _bucket_expr(order_value_col, uniq))
    sums = {
        r[BUCKET_COL]: r["s"]
        for r in bucketed.groupBy(BUCKET_COL)
        .agg(F.sum(sum_col).alias("s"))
        .collect()
    }
    offsets: dict[int, int] = {}
    running = 0
    for b in sorted(sums):
        offsets[b] = running
        running += sums[b]

    offset_expr = F.lit(0)
    for b, off in offsets.items():
        offset_expr = F.when(F.col(BUCKET_COL) == b, F.lit(off)).otherwise(offset_expr)

    w = (
        Window.partitionBy(BUCKET_COL)
        .orderBy(F.col(order_value_col).asc(), *[F.col(c).asc() for c in tiebreak_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return bucketed.withColumn(
        "__prefix_sum", (F.sum(sum_col).over(w) + offset_expr).cast("long")
    ).drop(BUCKET_COL)


def global_ntile(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str] | None = None,
    n: int = 10,
    buckets: int = 64,
) -> DataFrame:
    """df + ``__tile``: exact NTILE(n) OVER (ORDER BY value, tiebreaks).

    SQL NTILE fill rule with n_total rows: k, r = divmod(n_total, n); the
    first r tiles hold k+1 rows, the rest k.
    """
    # n_total falls out of the rank pass's bucket counts — no extra action
    ranked, n_total = _global_rank_with_total(df, value_col, tiebreak_cols, buckets)
    k, r = divmod(n_total, n)
    rank = F.col("__rank")
    if k == 0:
        tile = rank  # fewer rows than tiles: tile == rank
    else:
        big = r * (k + 1)  # rows living in the first r (larger) tiles
        tile = F.when(
            rank <= F.lit(big), F.floor((rank - 1) / F.lit(k + 1)) + 1
        ).otherwise(F.lit(r) + F.floor((rank - F.lit(big) - 1) / F.lit(k)) + 1)
    return ranked.withColumn("__tile", tile.cast("int")).drop("__rank")
