"""5-run steady-state probe for individual headline queries.

Round-3/4 methodology (NOTES.md): the first sf0.1 run after the sf0.001
warm-up still pays volume-dependent JIT, so min-of-3 occasionally catches
only warm-up tail. Five timed runs expose the steady state and the decay
curve; use this before attributing a bench delta to a plan or data-model
change.

Usage: python tools/probe.py cdc_enrich_e2e stream_tumbling_agg ...
Prints one JSON line: {"sf": ..., "runs": {name: [r1..r5]}, "steady": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "5"))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: python tools/probe.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)

    import __spark_entry__ as entry_mod
    from pulsar_cdc_experiment_spark.session import (
        get_spark,
        shuffle_partitions_for_bytes,
    )

    sf_bytes = sum(
        os.path.getsize(os.path.join(SF_DIR, f))
        for f in os.listdir(SF_DIR)
        if f.endswith(".parquet")
    )
    spark = get_spark(
        app_name="probe",
        shuffle_partitions=shuffle_partitions_for_bytes(sf_bytes),
    )
    queries = dict(entry_mod.queries())
    # bench-only entry (see bench.py): engine-hash fast path, no oracle
    from pulsar_cdc_experiment_spark.queries.llm_ops import dedup_minhash_lsh_fast

    queries["dedup_minhash_lsh_fast"] = dedup_minhash_lsh_fast

    # identical warm-up discipline to bench.py
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "double")
    spark.range(1000).select(_warm(F.col("id").cast("double"))).write.format(
        "noop"
    ).mode("overwrite").save()
    warm_sf = "/root/testdata/sf0.001"
    for name in names:
        try:
            queries[name](spark, warm_sf).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    # identical fixture discipline to bench.py: fixture-building queries
    # re-pay the full build+probe cycle per run (clear keeps session_once
    # catalog fixtures, matching bench); others reuse the session cache
    from pulsar_cdc_experiment_spark.queries import fixture_cache

    FIXTURE_BUILDERS = {
        "zorder_events_slabs",
        "table_maintenance_report",
        "ingest_jsonl_events",
        "incremental_maintenance_report",
        "multimodal_serving_pipeline",
    }

    runs: dict[str, list[float]] = {}
    for name in names:
        spark.catalog.clearCache()
        seq = []
        for _ in range(N_RUNS):
            if name in FIXTURE_BUILDERS:
                fixture_cache.clear(markers=False)
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            seq.append(round(time.perf_counter() - t0, 3))
        runs[name] = seq

    print(
        json.dumps(
            {
                "sf": SF_DIR,
                "n_runs": N_RUNS,
                "runs": runs,
                "steady": {n: min(r) for n, r in runs.items()},
                "median": {n: sorted(r)[len(r) // 2] for n, r in runs.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
