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


@register(
    "funnel_conversion",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ), v AS (
      SELECT e.user_id, min(e.ts) AS v_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'view'
        AND e.ts >= s.s_ts AND e.ts <= s.s_ts + INTERVAL 7 DAY
      GROUP BY 1
    ), p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts >= v.v_ts AND e.ts <= v.v_ts + INTERVAL 7 DAY
      GROUP BY 1
    )
    SELECT 1 AS step, 'signup' AS event, CAST((SELECT count(*) FROM s) AS BIGINT) AS n_users
    UNION ALL
    SELECT 2, 'view', CAST((SELECT count(*) FROM v) AS BIGINT)
    UNION ALL
    SELECT 3, 'purchase', CAST((SELECT count(*) FROM p) AS BIGINT)
    """,
)
def funnel_conversion(spark, sf_dir):
    """Funnel analysis — the product-analytics staple: users progressing
    signup → first view within 7 days → first purchase within 7 days of
    that view; one row per step with the surviving-user count.

    Shape: a chain of per-user min-aggregates, each step joining the
    previous step's (user, step_ts) table on user_id with an event-time
    range predicate. Every shuffle in the chain is keyed on user_id, so
    at 100 TB the steps co-partition (AQE reuses the exchange) and no
    step ever materializes more than one row per surviving user — state
    is O(users at step k), monotonically shrinking down the funnel. The
    7-day windows make it an as-of-bounded funnel, not a lifetime one
    (asof_join_state is the single-step relative)."""
    from pyspark.storagelevel import StorageLevel

    ev = table(spark, sf_dir, "events")
    week = F.expr("INTERVAL 7 DAYS")

    def first_within(prev, etype, prev_ts, out_ts):
        e = ev.filter(F.col("event_type") == etype).select("user_id", "ts")
        return (
            e.join(prev, "user_id")
            .filter(
                (F.col("ts") >= F.col(prev_ts))
                & (F.col("ts") <= F.col(prev_ts) + week)
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    # each step table is read by the NEXT step's join AND by its own
    # count leg — persist the small per-user aggregates (lazy; no jobs at
    # construction) so the events scans run once per step, not once per
    # downstream reference
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    v = first_within(s, "view", "s_ts", "v_ts").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    p = first_within(v, "purchase", "v_ts", "p_ts")

    def step(i, name, df):
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(i).alias("step"), F.lit(name).alias("event"), "n_users"
        )

    return (
        step(1, "signup", s)
        .unionByName(step(2, "view", v))
        .unionByName(step(3, "purchase", p))
    )


@register(
    "window_session_dynamic_gap",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN event_type = 'purchase'
                  THEN INTERVAL '60 minutes'
                  ELSE INTERVAL '15 minutes' END AS gap
      FROM events
    ), flagged AS (
      SELECT user_id, ts, value, gap,
             CASE WHEN ts > max(ts + gap) OVER (
                    PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_session
      FROM g
    ), numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS s_start,
           max(ts + gap) AS s_end,
           CAST(count(*) AS BIGINT) AS n_events,
           floor((sum(value)) * 100 + 0.5) / 100 AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def window_session_dynamic_gap(spark, sf_dir):
    """C31 extension: session windows whose gap is a PER-ROW expression
    (``F.session_window(ts, gap_col)``) — a purchase keeps its session
    alive 60 minutes, anything else 15: the checkout-vs-browse
    sessionization rule real clickstream pipelines use, which a fixed
    gap cannot express. Merge semantics under dynamic gaps: each event
    contributes the window [ts, ts+gap); an event merges into the
    running session iff its ts does not EXCEED the max end of all prior
    windows — the oracle reproduces exactly that with a running
    max(ts + gap) island flag, and the session end is max(ts + gap),
    not last-event + constant. The boundary case (ts EXACTLY at the
    running end → MERGE, ts <= end not strict overlap) is pinned by
    tests/test_properties.py::
    test_session_window_boundary_merges_at_exact_end, so a Spark
    semantics change fails a unit test before it flakes parity. Same one-shuffle shape as the static
    session window (partition by user, per-stratum sort)."""
    ev = table(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("60 minutes")
    ).otherwise(F.lit("15 minutes"))
    agg = (
        ev.groupBy(
            F.session_window(F.col("ts"), gap), F.col("user_id")
        ).agg(
            F.count("*").alias("n_events"),
            rn(F.sum("value"), 2).alias("sum_value"),
        )
    )
    return agg.select(
        "user_id",
        F.col("session_window.start").alias("s_start"),
        F.col("session_window.end").alias("s_end"),
        "n_events",
        "sum_value",
    )
