"""Text-format ingest tests: schema-on-read JSONL/CSV sources
(sources/files.py) and the registered ingest/maintenance queries."""

from __future__ import annotations

import tempfile

from pyspark.sql import types as T

from pulsar_cdc_experiment_spark.sources.files import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
)

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("v", T.DoubleType(), True),
    ]
)


def _write_lines(spark, lines):
    dst = tempfile.mkdtemp(prefix="ingest_test_")
    spark.createDataFrame([(s,) for s in lines], ["value"]).coalesce(
        1
    ).write.mode("overwrite").text(dst)
    return dst


def test_jsonl_corrupt_lines_are_captured_not_fatal(spark):
    dst = _write_lines(
        spark,
        [
            '{"id": 1, "name": "a", "v": 1.5}',
            '{"id": 2, "name": "b"',  # truncated → corrupt
            '{"id": 3, "name": "c", "v": -0.25}',
        ],
    )
    rows = {r["id"]: r for r in read_jsonl(spark, dst, _SCHEMA).collect()}
    assert rows[1]["v"] == 1.5 and rows[1][CORRUPT_COL] is None
    assert rows[3]["v"] == -0.25
    bad = rows[None]
    assert bad[CORRUPT_COL].startswith('{"id": 2')
    assert bad["name"] is None  # malformed JSON nulls every data field


def test_csv_partial_parse_keeps_healthy_fields(spark):
    """CSV PERMISSIVE semantics the quarantine logic depends on: a failed
    token nulls ONLY its field; the rest of the row parses and the raw
    line lands in the corrupt column — so quarantine must key off
    CORRUPT_COL, not off a null data field."""
    dst = _write_lines(spark, ["1,a,1.5", "oops,b,2.5", "3,c,"])
    rows = read_csv(spark, dst, _SCHEMA).collect()
    by_name = {r["name"]: r for r in rows}
    assert by_name["a"][CORRUPT_COL] is None
    bad = by_name["b"]
    assert bad["id"] is None and bad["v"] == 2.5
    assert bad[CORRUPT_COL] == "oops,b,2.5"
    # trailing empty token is a null, not a corrupt row
    assert by_name["c"]["v"] is None and by_name["c"][CORRUPT_COL] is None


def test_explicit_schema_read_plans_zero_jobs(spark):
    """The scale contract of sources/files.py: no inference pass — reading
    with an explicit schema launches no Spark job at plan time."""
    dst = _write_lines(spark, ['{"id": 1, "name": "a", "v": 1.0}'])
    tracker = spark.sparkContext.statusTracker()
    spark.sparkContext.setJobGroup("__ingest_build", "audit")
    df = read_jsonl(spark, dst, _SCHEMA).select("id", "v")
    _ = df.schema  # force analysis, not execution
    spark.sparkContext.setJobGroup("__ingest_done", "")
    assert not tracker.getJobIdsForGroup("__ingest_build")
    assert df.collect()[0]["v"] == 1.0


def test_registered_ingest_queries_quarantine_exact_counts(spark, sf_dir, duck):
    """Both ingest queries at sf0.001: the __corrupt__ group's count must
    equal the deterministic injection rate (event_id % k == 0)."""
    from pulsar_cdc_experiment_spark.registry import QUERIES, load_all_query_modules

    load_all_query_modules()
    for name, mod in (("ingest_jsonl_events", 97), ("ingest_csv_events", 89)):
        out = {r["grp"]: r for r in QUERIES[name](spark, sf_dir).collect()}
        want_bad = duck.sql(
            f"SELECT count(*) FROM events WHERE event_id % {mod} = 0"
        ).fetchone()[0]
        assert out["__corrupt__"]["n"] == want_bad, name
        assert out["__corrupt__"]["sum_value_cents"] == 0, name
        total = sum(r["n"] for r in out.values())
        want_total = duck.sql("SELECT count(*) FROM events").fetchone()[0]
        assert total == want_total, name


def test_orc_read_pushes_predicates(spark, sf_dir):
    """ORC scans carry PushedFilters like parquet — the plan evidence for
    the ingest_orc_events docstring's pruning claim."""
    import tempfile

    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.sources.files import read_orc
    from pulsar_cdc_experiment_spark.sources.tables import table

    dst = tempfile.mkdtemp(prefix="orc_push_")
    table(spark, sf_dir, "events").write.mode("overwrite").orc(dst)
    df = read_orc(spark, dst).filter(F.col("event_type") == "purchase").select(
        "event_id", "value"
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "event_type" in plan.split("PushedFilters")[1].split("]")[0]
    assert "ReadSchema" in plan
    assert df.count() > 0


def test_expect_operator_edges(spark):
    """operators/quality.expect: null rule results count as violations,
    uniqueness counts extras (c-1 per key), and an empty input yields
    zero-violation passing rules over zero rows."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from pulsar_cdc_experiment_spark.operators.quality import expect

    df = spark.createDataFrame(
        [(1, 5), (2, None), (2, -3), (3, 0)], "k int, v int"
    )
    out = {
        r["rule"]: (r["n_violations"], r["n_rows"], r["passed"])
        for r in expect(
            df,
            rules=[("v_positive", F.col("v") > 0)],
            unique_keys=[("k_unique", ["k"])],
        ).collect()
    }
    # v>0: null→violation, -3→violation, 0→violation ⇒ 3 of 4
    assert out["v_positive"] == (3, 4, False)
    # k=2 appears twice ⇒ one extra
    assert out["k_unique"] == (1, 4, False)

    empty = spark.createDataFrame(
        [], T.StructType([T.StructField("k", T.IntegerType()), T.StructField("v", T.IntegerType())])
    )
    out2 = {
        r["rule"]: (r["n_violations"], r["n_rows"], r["passed"])
        for r in expect(
            empty,
            rules=[("v_positive", F.col("v") > 0)],
            unique_keys=[("k_unique", ["k"])],
        ).collect()
    }
    assert out2["v_positive"] == (0, 0, True)
    assert out2["k_unique"] == (0, 0, True)
