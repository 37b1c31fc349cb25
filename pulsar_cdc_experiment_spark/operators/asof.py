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

Two payload strategies (round-13 verdict #2/#4 — the carry mode inflates
the window's sort buffer by the full right-row struct, which hurts when
the right side is a wide enriched table like the reference's enrichment
envelope, cdc_enrichment_function.py:29-32):

- ``payload_mode="carry"`` (default): the right row travels through the
  window inside a struct. One key shuffle total — best when the right
  payload is narrow.
- ``payload_mode="rejoin"``: only (right ts, per-key row id) travel
  through the window's sort buffer; the payload re-joins AFTER the carry
  on (key, row id). Costs one extra key-partitioned window (the id) and
  one equi-join of the THIN carried stream against the right side — wins
  when right rows are wide, because the sort buffer never holds payload
  bytes. All shuffles stay keyed on the join key, so at 100 TB AQE reuses
  the exchange across the id-window / carry-window / rejoin stages.

DuckDB implements this natively (``ASOF JOIN``), which provides the driver
oracle — both modes value-match it.
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
    payload_mode: str = "carry",
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

    ``payload_mode``: ``"carry"`` | ``"rejoin"`` — identical semantics,
    different physical strategy for the right payload (see module
    docstring). Pick ``"rejoin"`` when the right side is wide.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if payload_mode not in ("carry", "rejoin"):
        raise ValueError("payload_mode must be 'carry' or 'rejoin'")

    lcols = list(left.columns)
    rcols = [c for c in right.columns if c not in (key, right_ts)]

    if payload_mode == "rejoin":
        # per-key row id: row_number over the same key partitioning the
        # carry uses, so the id window's exchange is reused downstream.
        # The id is unique within a key (ties included) — (key, id) is
        # the rejoin key.
        id_w = Window.partitionBy(key).orderBy(F.col(right_ts).asc())
        right = right.withColumn("__rid", F.row_number().over(id_w))
        carry_cols = [F.col("__rid"), F.col(right_ts).alias("__rt")]
    else:
        carry_cols = [
            *[F.col(c) for c in rcols], F.col(right_ts).alias("__rt")
        ]

    tagged_r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(*carry_cols).alias("__r"),
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

    if payload_mode == "rejoin":
        thin = carried.select(
            *[F.col("__l").getField(c).alias(c) for c in lcols],
            F.col("__k").alias("__jk"),
            F.col("__r_asof").getField("__rid").alias("__rid"),
        )
        payload = right.select(
            F.col(key).alias("__jk"), "__rid", *rcols
        )
        return thin.join(payload, ["__jk", "__rid"], "left").select(
            *lcols, *rcols
        )

    return carried.select(
        *[F.col("__l").getField(c).alias(c) for c in lcols],
        *[F.col("__r_asof").getField(c).alias(c) for c in rcols],
    )
