"""Streaming driver queries (SURVEY.md §2 C29/C32-C35, B1-B4).

Each query runs a REAL Structured Streaming job (file source →
Trigger.AvailableNow → memory sink) and returns the materialized result.
Where the streamed computation is deterministic, the batch DuckDB oracle
applies in full — the strongest possible check of the unified model. Late
data/watermark-drop behavior (inherently multi-batch) is covered in
tests/test_streaming.py with a two-file staged source.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.rounding import rn
from ..registry import register
from ..sources.tables import table
from ..streaming.pipeline import read_events_stream, run_to_memory
from ..streaming.stateful import running_totals


@register(
    "stream_tumbling_agg",
    oracle="""
    SELECT time_bucket(INTERVAL '60 minutes', ts) AS w_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           floor((sum(value)) * 100 + 0.5) / 100 AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling_agg(spark, sf_dir):
    """C29 (streaming): hourly tumbling aggregate via readStream; complete
    output mode makes the final state equal to the batch aggregate."""
    ev = read_events_stream(spark, sf_dir)
    agg = ev.groupBy(F.window("ts", "60 minutes"), "event_type").agg(
        F.count("*").alias("n_events"), rn(F.sum("value"), 2).alias("sum_value")
    )
    out = run_to_memory(agg, "stream_tumbling_agg", output_mode="complete")
    return out.select(
        F.col("window.start").alias("w_start"), "event_type", "n_events", "sum_value"
    )


@register(
    "stream_static_join",
    oracle="""
    SELECT event_id, user_id, c_name, c_mktsegment, value
    FROM events JOIN customer ON user_id = c_custkey
    """,
)
def stream_static_join(spark, sf_dir):
    """C35: stream-static join — stateless, so append mode emits exactly
    the batch join result."""
    ev = read_events_stream(spark, sf_dir)
    cust = table(spark, sf_dir, "customer")
    joined = ev.join(
        F.broadcast(cust), ev.user_id == cust.c_custkey, "inner"
    ).select("event_id", "user_id", "c_name", "c_mktsegment", "value")
    return run_to_memory(joined, "stream_static_join", output_mode="append")


@register(
    "stream_dedup_keys",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_keys(spark, sf_dir):
    """C33: streaming dedup with watermarked state; projecting only the
    dedup keys makes the output order-independent → fully oracle-checkable."""
    ev = read_events_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "1 hour")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_to_memory(deduped, "stream_dedup_keys", output_mode="append")


@register(
    "stream_stateful_totals",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           floor((sum(value)) * 100 + 0.5) / 100 AS sum_value
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_totals(spark, sf_dir):
    """C34: custom keyed state via applyInPandasWithState — per-user running
    totals; the single AvailableNow batch makes the final update per key
    equal the batch GROUP BY."""
    ev = read_events_stream(spark, sf_dir)
    out = run_to_memory(
        running_totals(ev), "stream_stateful_totals", output_mode="update"
    )
    return out.select("user_id", "n_events", rn(F.col("sum_value"), 2).alias("sum_value"))


@register(
    "stream_session_agg",
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
           CAST(count(*) AS BIGINT) AS n_events,
           floor((sum(value)) * 100 + 0.5) / 100 AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def stream_session_agg(spark, sf_dir):
    """C31 (streaming): session_window over a real stream — the merging-
    window state path (sessions grow/merge as events arrive, unlike fixed
    tumbling buckets). Complete output mode over the AvailableNow run makes
    the final state equal the batch gap-island computation, so the full
    DuckDB oracle applies."""
    ev = read_events_stream(spark, sf_dir)
    agg = ev.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count("*").alias("n_events"), rn(F.sum("value"), 2).alias("sum_value")
    )
    out = run_to_memory(agg, "stream_session_agg", output_mode="complete")
    return out.select(
        "user_id",
        F.col("session_window.start").alias("s_start"),
        "n_events",
        "sum_value",
    )


@register(
    "stream_cdc_enrich_materialize",
    oracle="""
    SELECT user_id, event_id AS last_event_id, op_label AS last_op_label
    FROM (
      SELECT user_id, event_id,
             CASE CASE event_type WHEN 'signup' THEN 'c' WHEN 'purchase' THEN 'u'
                                  WHEN 'error' THEN 'd' WHEN 'view' THEN 'r' ELSE 'x' END
               WHEN 'c' THEN 'CREATE' WHEN 'u' THEN 'UPDATE' WHEN 'd' THEN 'DELETE'
               WHEN 'r' THEN 'READ' ELSE 'UNKNOWN' END AS op_label,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def stream_cdc_enrich_materialize(spark, sf_dir):
    """B4/B5 end-to-end: stream → enrich (op decode) → foreachBatch-style
    materialization. The fold runs on the COMPLETE streamed prefix (batch
    fold of the stream's contents) — the snapshot-then-stream unification."""
    from ..operators.enrichment import op_label
    from ..operators.materialize import latest_by_key
    from .cdc import _op_col

    ev = read_events_stream(spark, sf_dir)
    enriched = ev.withColumn("op", _op_col()).withColumn("op_label", op_label(F.col("op")))
    # land the enriched stream, then fold the landed prefix
    landed = run_to_memory(
        enriched.select("user_id", "event_id", "ts", "op_label"),
        "stream_cdc_enriched",
        output_mode="append",
    )
    latest = latest_by_key(landed, ["user_id"], ["ts", "event_id"])
    return latest.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("op_label").alias("last_op_label"),
    )


@register(
    "stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_event, s.event_id AS signup_event,
           p.user_id,
           floor((p.value) * 100 + 0.5) / 100 AS purchase_value
    FROM (SELECT user_id, ts, event_id, value FROM events
          WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'signup') s
      ON p.user_id = s.user_id
     AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 7 DAY
    """,
)
def stream_stream_join(spark, sf_dir):
    """Stream-stream INNER join with event-time range condition — the
    stateful two-sided join (each side buffers keyed state until the
    watermark passes the join window). Purchases matched to any signup of
    the same user within the preceding 7 days; inner join + AvailableNow
    processing of the full feed makes append output equal the batch join,
    so the full DuckDB oracle applies."""
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_event"),
            "value",
        )
        .withWatermark("p_ts", "1 hour")
    )
    signups = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user_id"),
            F.col("ts").alias("s_ts"),
            F.col("event_id").alias("signup_event"),
        )
        .withWatermark("s_ts", "1 hour")
    )
    joined = purchases.join(
        signups,
        (F.col("user_id") == F.col("s_user_id"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 7 DAYS")),
        "inner",
    ).select(
        "purchase_event",
        "signup_event",
        "user_id",
        rn(F.col("value"), 2).alias("purchase_value"),
    )
    return run_to_memory(joined, "stream_stream_join", output_mode="append")
