"""Timezone-independence regression tests (functions/time.py's contract).

The hazard: `events.ts` is TIMESTAMP_NTZ, and any path that routes it
through a session-zoned TIMESTAMP (`unix_millis`, `cast`, `F.lit(datetime)`)
silently shifts every derived epoch/ISO value on a non-UTC driver. The
helpers in functions/time.py use pure local-field arithmetic instead; these
tests pin that by running representative queries under a NON-UTC session
timezone and asserting results identical to (a) the UTC run and (b) the
DuckDB oracle — the same value-level gate the driver applies.

Queries are imported UNWRAPPED (the @register decorator returns the raw
function; the registry wrapper would re-pin UTC via prepare_session and
defeat the test).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

NON_UTC_TZ = "America/New_York"


def _normalize(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_normalize(x) for x in v)
    return v


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out: dict = {}
    for row in rows:
        key = tuple(_normalize(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def _collect(df):
    return _multiset(list(df.columns), [tuple(r) for r in df.collect()])


@pytest.fixture()
def ny_session(spark):
    """Scope the session to a non-UTC timezone, restoring UTC afterward."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", NON_UTC_TZ)
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def _oracle_multiset(duck: duckdb.DuckDBPyConnection, name: str):
    from pulsar_cdc_experiment_spark import registry
    from pulsar_cdc_experiment_spark.registry import load_all_query_modules

    load_all_query_modules()
    rel = duck.sql(registry.ORACLES[name])
    return _multiset(list(rel.columns), rel.fetchall())


def _run_both_tzs(spark, sf_dir, fn):
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = _collect(fn(spark, sf_dir))
        spark.conf.set("spark.sql.session.timeZone", NON_UTC_TZ)
        ny = _collect(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    return utc, ny


def test_cdc_event_time_iso_tz_independent(spark, sf_dir, duck):
    from pulsar_cdc_experiment_spark.queries.cdc import cdc_event_time_iso

    utc, ny = _run_both_tzs(spark, sf_dir, cdc_event_time_iso)
    assert ny == utc, "epoch/ISO rendering shifted under non-UTC session TZ"
    assert ny == _oracle_multiset(duck, "cdc_event_time_iso")


def test_window_tumbling_tz_independent(spark, sf_dir, duck):
    from pulsar_cdc_experiment_spark.queries.windows_q import window_tumbling

    utc, ny = _run_both_tzs(spark, sf_dir, window_tumbling)
    assert ny == utc, "tumbling window boundaries shifted under non-UTC TZ"
    assert ny == _oracle_multiset(duck, "window_tumbling")


def test_streaming_dedup_tz_independent(spark, sf_dir, duck):
    # exercises the derived-watermark path (with_event_time) off-UTC: the
    # watermark column is session-zoned TIMESTAMP but carries the NTZ
    # instant via field arithmetic, so OUTPUT values must not move
    from pulsar_cdc_experiment_spark.queries.streaming_q import stream_dedup_keys

    utc, ny = _run_both_tzs(spark, sf_dir, stream_dedup_keys)
    assert ny == utc
    assert ny == _oracle_multiset(duck, "stream_dedup_keys")


def test_epoch_helpers_tz_independent(spark):
    """epoch_millis/ntz_from_millis round-trip, bit-identical in both TZs."""
    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.functions.time import (
        epoch_millis,
        ntz_from_millis,
    )

    def run():
        df = spark.createDataFrame(
            [("2024-03-10 06:30:00.123",), ("1999-12-31 23:59:59.999",)],
            "s string",
        ).select(F.to_timestamp_ntz("s").alias("ts"))
        return df.select(
            epoch_millis("ts").alias("ms"),
            ntz_from_millis(epoch_millis("ts")).cast("string").alias("rt"),
        ).collect()

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = [tuple(r) for r in run()]
        spark.conf.set("spark.sql.session.timeZone", NON_UTC_TZ)
        ny = [tuple(r) for r in run()]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert utc == ny
    # 2024-03-10 06:30 NY-local is INSIDE the US DST spring-forward gap —
    # the exact value a zoned path would corrupt or shift
    assert utc[0][0] == 1710052200123
    assert utc[0][1] == "2024-03-10 06:30:00.123"
