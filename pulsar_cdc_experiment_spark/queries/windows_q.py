"""Event-time window driver queries (SURVEY.md §2 C29-C31).

DuckDB emulations: tumbling = time_bucket; sliding = each row joined to its
width/slide covering buckets; session = lag+cumsum island detection. Spark
session_window semantics: start = first event ts, end = last event ts + gap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.rounding import rn
from ..operators.time_windows import flatten_window, session, sliding, tumbling
from ..registry import register
from ..sources.tables import table


@register(
    "window_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS w_start,
           time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes' AS w_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           floor((sum(value)) * 100 + 0.5) / 100 AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def window_tumbling(spark, sf_dir):
    """C29: 15-minute tumbling event-time aggregation."""
    ev = table(spark, sf_dir, "events")
    agg = tumbling(ev, "ts", "15 minutes", "event_type").agg(
        F.count("*").alias("n_events"),
        rn(F.sum("value"), 2).alias("sum_value"),
    )
    return flatten_window(agg)


@register(
    "window_sliding",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS w_start,
           time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' + INTERVAL '30 minutes' AS w_end,
           CAST(count(*) AS BIGINT) AS n_events,
           floor((avg(value)) * 100 + 0.5) / 100 AS avg_value
    FROM events CROSS JOIN (VALUES (0), (1)) AS g(k)
    GROUP BY 1, 2
    """,
)
def window_sliding(spark, sf_dir):
    """C30: 30-minute windows sliding by 15 — every event in exactly 2 windows."""
    ev = table(spark, sf_dir, "events")
    agg = sliding(ev, "ts", "30 minutes", "15 minutes").agg(
        F.count("*").alias("n_events"),
        rn(F.avg("value"), 2).alias("avg_value"),
    )
    return flatten_window(agg)


@register(
    "window_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS s_start,
           max(ts) + INTERVAL '30 minutes' AS s_end,
           CAST(count(*) AS BIGINT) AS n_events,
           floor((sum(value)) * 100 + 0.5) / 100 AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def window_session(spark, sf_dir):
    """C31: 30-minute-gap session windows per user.

    Boundary semantics (empirically pinned, test_streaming.py::
    test_session_window_gap_boundary_merges_at_exact_gap): Spark merges
    sessions whose windows TOUCH, so an event exactly `gap` after its
    predecessor stays in the SAME session — the oracle's gap-island flag is
    strictly `> INTERVAL '30 minutes'`.
    """
    ev = table(spark, sf_dir, "events")
    agg = session(ev, "ts", "30 minutes", "user_id").agg(
        F.count("*").alias("n_events"),
        rn(F.sum("value"), 2).alias("sum_value"),
    )
    return agg.select(
        "user_id",
        F.col("session_window.start").alias("s_start"),
        F.col("session_window.end").alias("s_end"),
        "n_events",
        "sum_value",
    )


@register(
    "window_ignore_nulls",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT user_id, event_id,
           floor((first_value(v IGNORE NULLS) OVER w) * 100 + 0.5) / 100 AS first_seen,
           floor((last_value(v IGNORE NULLS) OVER w) * 100 + 0.5) / 100 AS last_seen,
           floor((lag(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id)) * 100 + 0.5) / 100 AS prev_seen
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_ignore_nulls(spark, sf_dir):
    """C13 depth: IGNORE NULLS analytic windows — first/last non-null
    observation per key and the gap-bridging lag, the sparse-sensor /
    sparse-CDC-column fill pattern (every 5th value nulled to make the
    semantics observable)."""
    from pyspark.sql import Window

    from ..functions.rounding import rn as _rn

    ev = table(spark, sf_dir, "events").withColumn(
        "v", F.when(F.col("event_id") % 5 == 0, None).otherwise(F.col("value"))
    )
    full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    # F.lag has no ignorenulls kwarg — the SQL form carries the modifier
    prev = F.expr(
        "lag(v) IGNORE NULLS OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    )
    return ev.select(
        "user_id",
        "event_id",
        _rn(F.first("v", ignorenulls=True).over(full), 2).alias("first_seen"),
        _rn(F.last("v", ignorenulls=True).over(full), 2).alias("last_seen"),
        _rn(prev, 2).alias("prev_seen"),
    )


@register(
    "time_gapfill_locf",
    oracle="""
    WITH hourly AS (
      SELECT user_id,
             CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT) AS hour_no,
             floor((sum(value)) * 100 + 0.5) / 100 AS v
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT user_id, min(hour_no) AS h0, max(hour_no) AS h1
      FROM hourly GROUP BY 1
    ), grid AS (
      SELECT user_id, unnest(range(h0, h1 + 1)) AS hour_no FROM span
    ), joined AS (
      SELECT g.user_id, g.hour_no, h.v
      FROM grid g LEFT JOIN hourly h USING (user_id, hour_no)
    )
    SELECT user_id, hour_no,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY hour_no
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
           v IS NULL AS is_gap
    FROM joined
    """,
)
def time_gapfill_locf(spark, sf_dir):
    """Time-series gap filling with last-observation-carried-forward (the
    timescale/metrics-store resample): per-user hourly totals densified
    over each user's own [first, last] hour via sequence+explode, missing
    hours forward-filled with a last(ignorenulls) window. One shuffle on
    user_id serves the span agg, the grid join, and the fill window; the
    grid is bounded by time range × keys, never by event count — the
    shape that holds when events are 100 TB but hours are thousands."""
    from pyspark.sql import Window

    from ..functions.time import epoch_millis

    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "user_id",
            F.floor(epoch_millis("ts") / 3600000).cast("long").alias("hour_no"),
            "value",
        )
        .groupBy("user_id", "hour_no")
        .agg(rn(F.sum("value"), 2).alias("v"))
    )
    span = hourly.groupBy("user_id").agg(
        F.min("hour_no").alias("h0"), F.max("hour_no").alias("h1")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("hour_no")
    )
    joined = grid.join(hourly, ["user_id", "hour_no"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour_no",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v").isNull().alias("is_gap"),
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH signup AS (
      SELECT user_id,
             min(CAST(floor(epoch_ms(ts) / 604800000.0) AS BIGINT)) AS cohort_wk
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ), act AS (
      SELECT DISTINCT e.user_id, s.cohort_wk,
             CAST(floor(epoch_ms(e.ts) / 604800000.0) AS BIGINT) - s.cohort_wk
               AS wk_offset
      FROM events e JOIN signup s USING (user_id)
    )
    SELECT cohort_wk, wk_offset, CAST(count(*) AS BIGINT) AS n_users
    FROM act WHERE wk_offset >= 0 GROUP BY 1, 2
    """,
)
def retention_cohorts(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-signup week, counted
    once per (cohort, weeks-since-signup) they were active in — the
    product-analytics staple. The signup table is a per-user aggregate —
    it GROWS with the user base, so it gets NO broadcast hint: AQE
    broadcasts it while it measures small and falls back to a shuffle join
    once it doesn't (a pinned hint would OOM the build side at 100 TB).
    The DISTINCT collapses per-user-week activity before the final count,
    keeping the heavy agg on (user, week) keys rather than raw events."""
    from ..functions.time import epoch_millis

    ev = table(spark, sf_dir, "events")
    wk = F.floor(epoch_millis("ts") / 604800000).cast("long")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", wk.alias("wk"))
        .groupBy("user_id")
        .agg(F.min("wk").alias("cohort_wk"))
    )
    act = (
        ev.select("user_id", wk.alias("wk"))
        .join(signup, "user_id")
        .select(
            "user_id", "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("wk_offset")
        )
        .filter(F.col("wk_offset") >= 0)
        .distinct()
    )
    return act.groupBy("cohort_wk", "wk_offset").agg(F.count("*").alias("n_users"))
