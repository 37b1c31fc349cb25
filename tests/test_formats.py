"""Source/sink format breadth: the engine round-trips its tables through
CSV, JSON, and ORC readers/writers with explicit schemas — a reference
user's data does not always arrive as parquet."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from pulsar_cdc_experiment_spark.sources.tables import table


def _events(spark, sf_dir):
    return table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )


def test_csv_json_orc_round_trip(spark, sf_dir):
    ev = _events(spark, sf_dir)
    n = ev.count()
    agg = ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    expect = {r["event_type"]: r["n"] for r in agg}

    for fmt, opts in (
        ("csv", {"header": "true"}),
        ("json", {}),
        ("orc", {}),
    ):
        out = tempfile.mkdtemp(prefix=f"fmt_{fmt}_")
        ev.write.mode("overwrite").options(**opts).format(fmt).save(out)
        back = (
            spark.read.options(**opts)
            .schema(ev.schema)
            .format(fmt)
            .load(out)
        )
        assert back.count() == n, fmt
        got = {
            r["event_type"]: r["n"]
            for r in back.groupBy("event_type").agg(F.count("*").alias("n")).collect()
        }
        assert got == expect, fmt


def test_xml_round_trip(spark, sf_dir):
    """Spark 4 built-in XML source: write events as XML rows, read back
    with an explicit schema, and verify counts + a value-level spot check
    (DuckDB has no XML reader, so this path is test-pinned; the XPath
    extraction semantics are oracle-backed via the xml_functions query)."""
    ev = _events(spark, sf_dir).select("event_id", "user_id", "event_type", "value")
    n = ev.count()
    out = tempfile.mkdtemp(prefix="fmt_xml_")
    ev.write.mode("overwrite").option("rootTag", "events").option(
        "rowTag", "event"
    ).format("xml").save(out)
    back = (
        spark.read.option("rowTag", "event")
        .schema(ev.schema)
        .format("xml")
        .load(out)
    )
    assert back.count() == n
    a = {r["event_id"]: r["value"] for r in ev.orderBy("event_id").limit(50).collect()}
    b = {
        r["event_id"]: r["value"]
        for r in back.filter(F.col("event_id").isin(*a)).collect()
    }
    assert b == a
