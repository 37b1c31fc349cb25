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
