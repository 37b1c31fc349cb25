"""Reference-fidelity tests for the enrichment operator (SURVEY.md §2 Tier A).

Replays documented envelope samples through the columnar enrichment and
asserts every enrichment field against the reference function's semantics
(reference cdc_enrichment_function.py:29-96), including malformed-input
pass-through (lines 104-107).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pulsar_cdc_experiment_spark.operators.enrichment import (
    enrich,
    enrich_json_or_passthrough,
)
from pulsar_cdc_experiment_spark.schemas import envelope_schema
from pulsar_cdc_experiment_spark.sources.cdc import parse_envelopes, table_filter

from .fixtures_cdc import MALFORMED, OP_LESS, sample_json_lines


def _enriched_rows(spark):
    raw = spark.createDataFrame([(s,) for s in sample_json_lines()], ["value"])
    env = parse_envelopes(raw).drop("_raw")
    out = enrich(env)
    return {r["original"]["after"]["id"] if r["original"]["after"] else r["original"]["before"]["id"]: r
            for r in out.collect()}


def test_parse_roundtrip(spark):
    raw = spark.createDataFrame([(s,) for s in sample_json_lines()], ["value"])
    env = parse_envelopes(raw)
    assert env.count() == 9
    assert env.filter(F.col("op").isNull()).count() == 0
    assert [f.name for f in env.schema.fields] == ["before", "after", "source", "op", "ts_ms", "_corrupt", "_raw"]


def test_op_decode_and_mutation_flags(spark):
    rows = _enriched_rows(spark)
    e = lambda i: rows[i]["enrichment"]["operation"]
    assert e(2)["label"] == "READ" and e(2)["is_mutation"] is False
    assert e(1)["label"] == "UPDATE" and e(1)["is_mutation"] is True
    assert e(3)["label"] == "DELETE" and e(3)["is_mutation"] is True
    assert e(4)["label"] == "CREATE" and e(4)["is_mutation"] is True
    assert e(6)["label"] == "UNKNOWN" and e(6)["is_mutation"] is False


def test_event_time_iso_matches_python_isoformat(spark):
    import datetime

    rows = _enriched_rows(spark)
    for key in rows:
        ts_ms = rows[key]["original"]["ts_ms"]
        expect = datetime.datetime.utcfromtimestamp(ts_ms / 1000.0).isoformat()
        got = rows[key]["enrichment"]["timestamps"]["event_time_iso"]
        assert got == expect, (key, got, expect)
    # both branches exercised: t0 (no fraction) and t0+4567 (fraction)
    isos = [r["enrichment"]["timestamps"]["event_time_iso"] for r in rows.values()]
    assert any("." in s for s in isos) and any("." not in s for s in isos)


def test_source_metadata_and_snapshot_flag(spark):
    rows = _enriched_rows(spark)
    sm = rows[1]["enrichment"]["source_metadata"]
    assert sm["database"] == "inventory"
    assert sm["schema"] == "public"
    assert sm["table"] == "customers"
    assert sm["connector"] == "postgresql"
    assert sm["version"] == "1.9.7.Final"
    assert rows[2]["enrichment"]["source_metadata"]["is_snapshot"] is True
    assert rows[4]["enrichment"]["source_metadata"]["is_snapshot"] is False


def test_data_quality_flags(spark):
    rows = _enriched_rows(spark)
    # update: has both images, complete
    dq = rows[1]["enrichment"]["data_quality"]
    assert dq["has_before"] and dq["has_after"] and dq["is_complete"]
    assert dq["field_count"] == 4
    # delete: after is null → field_count 0, incomplete
    dq3 = rows[3]["enrichment"]["data_quality"]
    assert dq3["has_before"] and not dq3["has_after"]
    assert dq3["field_count"] == 0 and not dq3["is_complete"]


def test_email_insights_branches(spark):
    rows = _enriched_rows(spark)
    ci = lambda i: rows[i]["enrichment"]["customer_insights"]
    assert ci(1)["email_domain"] == "example.com"
    assert ci(1)["has_email"] is True and ci(1)["email_length"] == len("alice.b@example.com")
    # empty email: has_email False, length 0, no domain
    assert ci(4)["email_domain"] is None and ci(4)["has_email"] is False and ci(4)["email_length"] == 0
    # no '@': domain None but has_email True
    assert ci(5)["email_domain"] is None and ci(5)["has_email"] is True
    # delete (after null): all null/absent
    assert ci(3)["email_domain"] is None and ci(3)["email_length"] is None


def test_malformed_passthrough(spark):
    raw = spark.createDataFrame(
        [(s,) for s in sample_json_lines() + MALFORMED + OP_LESS], ["value"]
    )
    out = enrich_json_or_passthrough(raw).collect()
    values = [r["value"] for r in out]
    # malformed inputs come back verbatim
    for bad in MALFORMED:
        assert bad in values
    # good inputs come back enriched with both envelope keys
    enriched = [v for v in values if v not in MALFORMED]
    assert len(enriched) == 9 + len(OP_LESS)
    for v in enriched:
        obj = json.loads(v)
        assert set(obj) == {"original", "enrichment"}
        assert obj["enrichment"]["operation"]["label"] in {
            "CREATE", "UPDATE", "DELETE", "READ", "UNKNOWN",
        }


def test_op_less_object_enriched_not_passed_through(spark):
    """Reference message.get("op", "unknown") semantics: a VALID JSON object
    without an op field is enriched (code "unknown", label UNKNOWN,
    is_mutation false), not treated as malformed
    (cdc_enrichment_function.py:35-45)."""
    raw = spark.createDataFrame([(s,) for s in OP_LESS], ["value"])
    out = [r["value"] for r in enrich_json_or_passthrough(raw).collect()]
    assert len(out) == len(OP_LESS)
    for v in out:
        obj = json.loads(v)
        op = obj["enrichment"]["operation"]
        assert op["code"] == "unknown"
        assert op["label"] == "UNKNOWN"
        assert op["is_mutation"] is False
    # the ts_ms-bearing one gets real timestamps enrichment (to_json drops
    # the null event_time_ms for the other)
    objs = [json.loads(v) for v in out]
    assert any(
        o["enrichment"]["timestamps"].get("event_time_ms") == 1637012345000
        for o in objs
    )


def test_table_include_filter(spark):
    lines = sample_json_lines()
    # retarget one envelope at another table
    other = json.loads(lines[0])
    other["source"]["table"] = "orders"
    raw = spark.createDataFrame([(s,) for s in lines + [json.dumps(other)]], ["value"])
    env = parse_envelopes(raw)
    kept = table_filter(env, ["public.customers"])
    assert kept.count() == 9
    assert table_filter(env, ["public.orders"]).count() == 1


def test_schemaless_envelope_mode(spark):
    """§1.4: unknown table schemas parse into map-based envelopes; the
    reference's JSON-key counting semantics apply directly (A12)."""
    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.schemas import schemaless_envelope_schema

    lines = sample_json_lines()
    raw = spark.createDataFrame([(s,) for s in lines], ["value"])
    env = raw.select(
        F.from_json(F.col("value"), schemaless_envelope_schema()).alias("e")
    ).select("e.*")
    rows = env.collect()
    assert len(rows) == 9
    # after is a map: JSON-key count == map size (the reference's len(after))
    counted = env.select(
        "op", F.size(F.map_keys("after")).alias("n")
    ).collect()
    for r in counted:
        if r["op"] == "d":
            assert r["n"] == -1  # null map (Spark size() convention)
        else:
            assert r["n"] == 4
    # values arrive as strings in schemaless mode; typed access still works
    first = env.filter(F.col("op") == "r").first()
    assert first["after"]["name"] == "Alice"
    assert first["source"]["table"] == "customers"
