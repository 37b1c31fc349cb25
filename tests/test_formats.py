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
