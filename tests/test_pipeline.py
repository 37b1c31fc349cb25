"""End-to-end tests: config-driven pipeline + incremental materialization."""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from pulsar_cdc_experiment_spark.pipeline import CdcPipeline

from .fixtures_cdc import MALFORMED, sample_json_lines


def _write_feed(lines, n_files=1):
    d = tempfile.mkdtemp(prefix="cdc_feed_")
    chunks = [lines[i::n_files] for i in range(n_files)]
    for i, chunk in enumerate(chunks):
        p = os.path.join(d, f"{i:03d}.jsonl")
        with open(p, "w") as f:
            f.write("\n".join(chunk))
        os.utime(p, (1_700_000_000 + i * 60,) * 2)
    return d


def _config(feed_dir, out_dir):
    return {
        "source": {"path": feed_dir, "format": "json-envelope"},
        "tables": {"include": ["public.customers"]},
        "enrichment": {"function_name": "cdc-enrichment", "topic": "customers"},
        "materialize": {"key": "after.id"},
        "sink": {"path": out_dir, "format": "parquet"},
    }


def test_pipeline_end_to_end_stream_to_sink(spark):
    # a line-oriented feed cannot carry the empty-string payload (it reads
    # back as no line at all); that case is covered by the in-memory
    # passthrough test in test_enrichment.py
    bad_lines = [m for m in MALFORMED if m]
    feed = _write_feed(sample_json_lines() + bad_lines)
    out = tempfile.mkdtemp(prefix="cdc_out_")
    pipe = CdcPipeline(_config(feed, out))
    q = pipe.start(spark)
    q.awaitTermination(120)
    sunk = spark.read.parquet(out)
    values = [r["value"] for r in sunk.collect()]
    # the full reference contract at the byte level: enriched JSON for good
    # envelopes, verbatim pass-through for malformed payloads (A16-A17)
    assert len(values) == 9 + len(bad_lines)
    for bad in bad_lines:
        assert bad in values
    enriched = [v for v in values if v not in MALFORMED]
    assert all(set(json.loads(v)) == {"original", "enrichment"} for v in enriched)


def test_pipeline_materialized_state(spark):
    feed = _write_feed(sample_json_lines())
    pipe = CdcPipeline(_config(feed, tempfile.mkdtemp()))
    state = pipe.materialized(spark)
    ids = {r["after"]["id"] for r in state.collect()}
    assert ids == {1, 2, 4, 5, 6}  # id=3 deleted, histories folded


def test_incremental_materializer_matches_batch_fold(spark):
    """Incremental (foreachBatch upsert) state == one-shot batch fold,
    regardless of how the stream was sliced into micro-batches."""
    from pulsar_cdc_experiment_spark.streaming.materialize import (
        IncrementalMaterializer,
    )
    from pulsar_cdc_experiment_spark.sources.cdc import parse_envelopes

    lines = sample_json_lines()
    feed = _write_feed(lines, n_files=3)  # 3 micro-batches
    state_dir = tempfile.mkdtemp(prefix="matz_")

    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(feed)
    )
    env = parse_envelopes(stream).drop("_raw")
    flat = env.select(
        F.coalesce(F.col("after.id"), F.col("before.id")).alias("id"),
        "op",
        F.col("after.name").alias("name"),
        F.col("source.lsn").alias("lsn"),
    )
    m = IncrementalMaterializer(state_dir, ["id"], ["lsn"])
    q = m.attach(flat)
    q.awaitTermination(120)

    got = {
        r["id"]: (r["op"], r["name"], r["lsn"])
        for r in m.current_state(spark).collect()
    }
    # batch-fold reference result
    raw = spark.createDataFrame([(s,) for s in lines], ["value"])
    benv = parse_envelopes(raw).drop("_raw")
    bflat = benv.select(
        F.coalesce(F.col("after.id"), F.col("before.id")).alias("id"),
        "op",
        F.col("after.name").alias("name"),
        F.col("source.lsn").alias("lsn"),
    )
    from pulsar_cdc_experiment_spark.operators.materialize import latest_by_key

    expect = {
        r["id"]: (r["op"], r["name"], r["lsn"])
        for r in latest_by_key(bflat, ["id"], ["lsn"]).collect()
    }
    assert got == expect
    assert got[1] == ("u", "Alice B", 300)  # folded to the last update
    assert got[3][0] == "d"  # tombstone retained in state (caller filters)


def test_pipeline_routed_sink_partitions_by_table(spark):
    """B6: routed sink writes one partition directory per source table."""
    import glob

    lines = sample_json_lines()
    # add an envelope for a second table
    other = json.loads(lines[0])
    other["source"]["table"] = "orders"
    feed = _write_feed(lines + [json.dumps(other)])
    out = tempfile.mkdtemp(prefix="routed_out_")
    cfg = _config(feed, out)
    cfg["tables"]["include"] = ["public.customers", "public.orders"]
    q = CdcPipeline(cfg).start_routed(spark)
    q.awaitTermination(120)
    routes = {os.path.basename(p) for p in glob.glob(os.path.join(out, "_route=*"))}
    assert routes == {
        "_route=inventory.public.customers",
        "_route=inventory.public.orders",
    }
    back = spark.read.parquet(out)
    assert back.count() == 10
    # reading one route prunes to its directory
    one = back.filter(F.col("_route") == "inventory.public.orders")
    assert one.count() == 1


def test_custom_python_datasource_feed(spark):
    """Spark 4 Python DataSource extension seam: the cdc_feed source plans
    one partition per feed file, carries file/offset lineage, and composes
    with parse_envelopes + enrich unchanged — the engine-side contract a
    new wire protocol plugs into (the reference's packaged-connector
    analog)."""
    from pulsar_cdc_experiment_spark.sources.cdc import parse_envelopes
    from pulsar_cdc_experiment_spark.sources.python_ds import register_cdc_feed

    from .fixtures_cdc import sample_json_lines

    lines = sample_json_lines()
    feed = _write_feed(lines, n_files=3)
    register_cdc_feed(spark)

    raw = spark.read.format("cdc_feed").option("path", feed).load()
    assert raw.schema.simpleString() == (
        "struct<value:string,_file:string,_offset:bigint>"
    )
    rows = raw.collect()
    assert len(rows) == len(lines)
    assert {r["_file"] for r in rows} == {"000.jsonl", "001.jsonl", "002.jsonl"}
    # partition planning: one scan partition per feed file
    assert raw.rdd.getNumPartitions() == 3

    env = parse_envelopes(raw, "value", keep_cols=["_file", "_offset"])
    got = env.filter(F.col("_corrupt").isNull()).count()
    assert got == len(lines)
    # same payloads as the built-in text source reading the same feed
    text = spark.read.format("text").load(feed)
    assert {r["value"] for r in rows} == {r["value"] for r in text.collect()}


def test_custom_python_datasource_sink_two_phase_commit(spark, tmp_path):
    """The WRITE half of the extension seam (A18): tasks stage to hidden
    files, only the driver's commit publishes — then the cdc_feed READER
    round-trips the published batch (both halves of the custom protocol
    in one path)."""
    import os

    from pulsar_cdc_experiment_spark.sources.python_ds import register_cdc_feed

    register_cdc_feed(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    lines = [f'{{"id": {i}}}' for i in range(20)]
    df = spark.createDataFrame([(s,) for s in lines], ["value"]).repartition(3)
    df.write.format("cdc_feed").option("path", out).mode("append").save()

    published = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    assert len(published) == 3  # one published file per task
    assert "_SUCCESS" in os.listdir(out)  # driver-side commit marker
    # no staging leftovers after a clean commit
    assert not os.path.isdir(os.path.join(out, ".staging"))

    back = spark.read.format("cdc_feed").option("path", out).load()
    vals = {r["value"] for r in back.collect()}  # reader skips _SUCCESS
    assert vals == set(lines)


def test_custom_python_datasource_sink_multi_batch(spark, tmp_path):
    """Second-batch semantics (the round-4 advisor finding): append batches
    must not collide on part names (positional part-00000 silently
    overwrote the first batch's files), and an overwrite batch with FEWER
    tasks must sweep the previous batch's higher-numbered parts — stale
    parts under a refreshed _SUCCESS read back as a mixed batch."""
    import os

    from pulsar_cdc_experiment_spark.sources.python_ds import register_cdc_feed

    register_cdc_feed(spark)

    def write(vals, n_parts, mode, out):
        df = spark.createDataFrame([(v,) for v in vals], ["value"]).repartition(
            n_parts
        )
        df.write.format("cdc_feed").option("path", out).mode(mode).save()

    def read_back(out):
        back = spark.read.format("cdc_feed").option("path", out).load()
        return {r["value"] for r in back.collect()}

    # append + append: both batches fully present, no overwritten parts
    out = str(tmp_path / "sink_append")
    os.makedirs(out)
    write([f"a{i}" for i in range(6)], 3, "append", out)
    write([f"b{i}" for i in range(6)], 3, "append", out)
    assert len([f for f in os.listdir(out) if f.startswith("part-")]) == 6
    assert read_back(out) == {f"a{i}" for i in range(6)} | {
        f"b{i}" for i in range(6)
    }

    # big batch then SMALLER overwrite batch: only the new batch survives
    out2 = str(tmp_path / "sink_overwrite")
    os.makedirs(out2)
    write([f"old{i}" for i in range(8)], 4, "append", out2)
    write(["new0", "new1"], 1, "overwrite", out2)
    assert len([f for f in os.listdir(out2) if f.startswith("part-")]) == 1
    assert "_SUCCESS" in os.listdir(out2)
    assert read_back(out2) == {"new0", "new1"}


def test_custom_python_datasource_sink_abort_publishes_nothing(spark, tmp_path):
    """A failing task must leave the sink EMPTY: no published part files,
    no _SUCCESS, staging swept by abort — half-written batches are
    invisible to any reader gating on the commit marker."""
    import os

    import pytest
    from pyspark.sql import functions as F2

    from pulsar_cdc_experiment_spark.sources.python_ds import register_cdc_feed

    register_cdc_feed(spark)
    out = str(tmp_path / "sink_abort")
    os.makedirs(out)

    @F2.udf("string")
    def poison(v):
        if v == "boom":
            raise RuntimeError("injected task failure")
        return v

    df = spark.createDataFrame(
        [("ok-1",), ("boom",), ("ok-2",)], ["raw"]
    ).repartition(3).select(poison("raw").alias("value"))
    with pytest.raises(Exception):
        df.write.format("cdc_feed").option("path", out).mode("append").save()

    assert [f for f in os.listdir(out) if f.startswith("part-")] == []
    assert "_SUCCESS" not in os.listdir(out)
    staging = os.path.join(out, ".staging")
    assert not os.path.isdir(staging) or os.listdir(staging) == []


def test_custom_python_datasource_reader_gates_on_success_marker(
    spark, tmp_path
):
    """requireSuccess gives the all-or-nothing read the writer's docstring
    promises: a directory without the commit marker (mid-overwrite, or a
    crashed commit) plans zero partitions instead of returning a partial
    batch; the default ungated read still sees raw handwritten feeds."""
    import os

    from pulsar_cdc_experiment_spark.sources.python_ds import register_cdc_feed

    register_cdc_feed(spark)
    out = str(tmp_path / "gated")
    os.makedirs(out)
    with open(os.path.join(out, "part-raw-0.jsonl"), "w") as f:
        f.write('{"id": 1}\n')

    def read(**opts):
        r = spark.read.format("cdc_feed").option("path", out)
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load().count()

    assert read() == 1  # ungated: raw feed dirs stay readable
    assert read(requireSuccess="true") == 0  # no marker -> nothing visible
    with open(os.path.join(out, "_SUCCESS"), "w"):
        pass
    assert read(requireSuccess="true") == 1


def test_pipeline_config_rescue_and_kafka_wiring(spark):
    """Config-driven drift rescue (source.rescue: true) flows _rescued
    through the pipeline; a kafka-format config wires the reader to the
    connector-resolution boundary (jar absent in this container)."""
    lines = sample_json_lines()
    drifted = json.loads(lines[0])
    drifted["after"]["loyalty_tier"] = "gold"
    feed = _write_feed(lines + [json.dumps(drifted)])

    cfg = _config(feed, tempfile.mkdtemp())
    cfg["source"]["rescue"] = True
    pipe = CdcPipeline(cfg)
    env = pipe.envelopes(spark, streaming=False)
    rescued = env.filter(F.col("_rescued").isNotNull()).collect()
    assert len(rescued) == 1
    assert rescued[0]["_rescued"] == {"loyalty_tier": "gold"}
    # materialization still folds the full feed (drift costs no rows)
    assert pipe.materialized(spark).count() == 5

    kcfg = {
        "source": {
            "format": "kafka",
            "bootstrap_servers": "broker:9092",
            "topic": "dbserver1.public.customers",
        }
    }
    try:
        CdcPipeline(kcfg).envelopes(spark, streaming=True)
        assert False, "expected connector resolution to fail here"
    except Exception as e:
        assert "kafka" in str(e).lower()


def test_insert_to_enriched_latency_bound(spark):
    """The reference's ONLY stated performance bound: a row inserted into
    Postgres must appear enriched on the output topic within 10 s
    (reference scripts/verify.sh:400-407). Spark analog: an envelope file
    landing in the feed directory appears enriched in the sink within one
    micro-batch. Measures and prints the latency; asserts the reference's
    10 s contract with margin for CI noise."""
    import time

    lines = sample_json_lines()
    feed = _write_feed(lines[:3])
    out = tempfile.mkdtemp(prefix="lat_out_")
    pipe = CdcPipeline(_config(feed, out))

    # continuously-running micro-batches (the production trigger shape)
    src = pipe.enriched_json(spark)
    q = (
        src.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="lat_ckpt_"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # wait for the initial batch to flush
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 3:
                    break
            except Exception:
                pass
            time.sleep(0.25)

        # the "INSERT": a new envelope file lands mid-stream
        new_line = lines[3]
        marker = json.loads(new_line)["after"]["id"]
        t0 = time.time()
        p = os.path.join(feed, "insert.jsonl")
        with open(p, "w") as f:
            f.write(new_line)

        latency = None
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                got = (
                    spark.read.parquet(out)
                    .filter(F.col("value").contains(f'"id":{marker}'))
                    .count()
                )
                if got >= 1:
                    latency = time.time() - t0
                    break
            except Exception:
                pass
            time.sleep(0.25)
        assert latency is not None, "inserted envelope never appeared enriched"
        print(f"insert->enriched latency: {latency:.2f}s")
        assert latency < 10.0  # the reference's own bound, met with margin
    finally:
        q.stop()


def test_cli_entrypoint(spark, tmp_path):
    """python -m pulsar_cdc_experiment_spark: YAML config -> running
    pipeline (the reference's declarative-deploy UX). main() is invoked
    in-process against the shared session-config — the subcommand paths
    build their own session, so here we exercise config loading + the
    materialize path end to end via a subprocess-free seam."""
    from pulsar_cdc_experiment_spark.__main__ import load_config
    from pulsar_cdc_experiment_spark.pipeline import CdcPipeline

    feed = _write_feed(sample_json_lines())
    out = str(tmp_path / "state_out")
    cfg_path = str(tmp_path / "pipeline.yaml")
    with open(cfg_path, "w") as f:
        f.write(f"""
source:
  path: {feed}
  format: json-envelope
tables:
  include: [public.customers]
enrichment:
  function_name: cdc-enrichment
  topic: customers
materialize:
  key: after.id
sink:
  path: {out}
  format: parquet
""")
    cfg = load_config(cfg_path)
    assert cfg["tables"]["include"] == ["public.customers"]
    pipe = CdcPipeline(cfg)
    pipe.materialized(spark).write.mode("overwrite").parquet(out)
    ids = {r["after"]["id"] for r in spark.read.parquet(out).collect()}
    assert ids == {1, 2, 4, 5, 6}

    # JSON config loads through the same seam
    cfg_json = str(tmp_path / "p.json")
    with open(cfg_json, "w") as f:
        json.dump(cfg, f)
    assert load_config(cfg_json) == cfg

    # continuous-trigger mode starts and stops cleanly
    q = pipe.start(spark, available_now=False, processing_interval="1 second")
    try:
        assert q.isActive
    finally:
        q.stop()
