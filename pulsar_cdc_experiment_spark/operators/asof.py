"""As-of (temporal) join — an operator Spark's API lacks, composed from
built-ins with the union+window technique.

Semantics (backward as-of, the CDC-relevant one): each left row matches the
single right row with the greatest ``right_ts <= left_ts`` for the same key
— "the state as of this event's time". This is how a CDC-materialized
dimension is joined to an event stream at event time.

Why not a range join: ``left.ts >= right.ts`` alone is a triangle join
(O(n·m) pairs per key before picking the max). The union+window shape is
linear: tag both sides, union, sort per key by time, carry the last right
row forward with ``last(ignorenulls)``, keep left rows. One shuffle on the
key plus an in-partition sort — window-function cost, no pair explosion.

DuckDB implements this natively (``ASOF JOIN``), which provides the driver
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """Backward/forward as-of join on ``key`` by time.

    Output: all left columns plus the right side's non-key/non-ts columns
    (null when no right row is at-or-before / at-or-after). Ties on equal
    timestamps match (<= / >=), mirroring DuckDB ASOF JOIN.

    ``tolerance`` (optional, a SQL interval body such as ``"7 DAYS"``)
    bounds the match the way pandas ``merge_asof(tolerance=...)`` does:
    the as-of candidate is still the single nearest at-or-before (/after)
    row, and if THAT row lies further than the tolerance the left row
    matches nothing — an earlier row is never substituted. Same plan
    shape: the bound is one post-carry conditional, no extra shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    lcols = list(left.columns)
    rcols = [c for c in right.columns if c not in (key, right_ts)]

    tagged_r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(
            *[F.col(c) for c in rcols], F.col(right_ts).alias("__rt")
        ).alias("__r"),
    )
    tagged_l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
    )
    unioned = tagged_l.withColumn(
        "__r", F.lit(None).cast(tagged_r.schema["__r"].dataType)
    ).unionByName(
        tagged_r.withColumn(
            "__l", F.lit(None).cast(tagged_l.schema["__l"].dataType)
        ).select("__k", "__t", "__is_left", "__l", "__r")
    )

    # right rows sort BEFORE left rows at equal ts so ties match (<= / >=)
    order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    carried = unioned.withColumn(
        "__r_asof", F.last("__r", ignorenulls=True).over(w)
    ).filter(F.col("__is_left") == 1)

    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}")
        rt = F.col("__r_asof").getField("__rt")
        within = (
            (F.col("__t") <= rt + tol)
            if direction == "backward"
            else (rt <= F.col("__t") + tol)
        )
        carried = carried.withColumn(
            "__r_asof", F.when(within, F.col("__r_asof"))
        )

    return carried.select(
        *[F.col("__l").getField(c).alias(c) for c in lcols],
        *[F.col("__r_asof").getField(c).alias(c) for c in rcols],
    )
