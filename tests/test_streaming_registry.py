"""Registry-wide streaming smoke test (round-3 postmortem).

Round 3 shipped a change that broke two REGISTERED streaming queries
(`withWatermark` on TIMESTAMP_NTZ) while the whole pytest suite stayed
green, because no test executed the registry's stream_* entries — the
driver's sample was the first thing to notice. This test closes that hole:
every `stream_*` registry entry runs end-to-end at the test SF, so a broken
streaming query can never again ride a green suite.
"""

from __future__ import annotations

import pytest

from pulsar_cdc_experiment_spark import registry
from pulsar_cdc_experiment_spark.registry import load_all_query_modules

load_all_query_modules()

STREAM_QUERIES = sorted(n for n in registry.QUERIES if n.startswith("stream_"))


def test_registry_has_streaming_queries():
    # guards against the pattern itself silently matching nothing
    assert len(STREAM_QUERIES) >= 5


@pytest.mark.parametrize("name", STREAM_QUERIES)
def test_stream_query_executes(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    # force full materialization through the streaming sink + any
    # post-processing; count() is enough to surface analysis/runtime errors
    assert df.count() >= 0


def test_stream_late_data_drop_semantics(spark, sf_dir):
    """The C32 driver query's result must prove the drop: every emitted
    window sits at/after the mid-range cutoff (the late batch's whole
    time range is absent), and the on-time windows carry exactly the
    batch counts of their rows — late rows neither created windows nor
    leaked into existing ones."""
    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.functions.time import epoch_micros
    from pulsar_cdc_experiment_spark.sources.tables import table

    out = registry.QUERIES["stream_late_data_drop"](spark, sf_dir)
    rows = {r["w_start_epoch"]: r["n_events"] for r in out.collect()}
    assert rows, "no finalized windows emitted"

    ev = table(spark, sf_dir, "events")
    rng = ev.agg(
        F.min(epoch_micros("ts")).alias("lo"), F.max(epoch_micros("ts")).alias("hi")
    ).first()
    mid_s = (rng["lo"] + (rng["hi"] - rng["lo"]) // 2) // 1_000_000
    # no window from the late batch's range (start < mid, minus the hour
    # containing mid itself, which on-time rows legitimately share)
    assert all(w >= mid_s - 3600 for w in rows), (min(rows), mid_s)
    # on-time windows match the batch per-hour counts over ts >= mid
    hour = (epoch_micros("ts") / 1_000_000).cast("long") - (
        (epoch_micros("ts") / 1_000_000).cast("long") % 3600
    )
    expect = {
        r["h"]: r["n"]
        for r in ev.filter(epoch_micros("ts") >= rng["lo"] + (rng["hi"] - rng["lo"]) // 2)
        .groupBy(hour.alias("h"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for w, n in rows.items():
        assert expect.get(w) == n, (w, n, expect.get(w))
