"""Measure CDC enrichment throughput: columnar engine vs per-message Python.

The reference executes its data plane as an interpreted Python function, one
message at a time (parse JSON → build enriched dict → serialize). This tool
measures (a) a GENERIC per-message Python baseline of that execution model
(json.loads → field probes/derivations → json.dumps; deliberately our own
minimal stand-in, not a re-implementation of the reference's function) and
(b) this engine's whole-stage-codegen columnar path (cdc_enrich_e2e), over
the same synthesized envelope corpus.

Usage: python tools/throughput_compare.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def python_per_message(lines: list[str]) -> float:
    """Generic interpreted per-message loop (the reference's execution model)."""
    t0 = time.perf_counter()
    for line in lines:
        obj = json.loads(line)
        op = obj.get("op")
        src = obj.get("source") or {}
        after = obj.get("after") or {}
        out = {
            "original": obj,
            "meta": {
                "is_mutation": op in ("c", "u", "d"),
                "table": src.get("table"),
                "n_fields": sum(1 for v in after.values() if v is not None),
            },
        }
        json.dumps(out)
    return time.perf_counter() - t0


def main() -> None:
    from pulsar_cdc_experiment_spark.queries.cdc import synthesize_envelopes
    from pulsar_cdc_experiment_spark.session import get_spark

    import __spark_entry__ as entry_mod

    from pulsar_cdc_experiment_spark.operators.enrichment import (
        enrich_json_or_passthrough,
    )
    from pyspark.sql import functions as F

    spark = get_spark(app_name="throughput")
    raw = synthesize_envelopes(spark, SF_DIR)
    lines = [r["value"] for r in raw.collect()]

    py_s = python_per_message(lines)

    # replicate to ~1M envelopes so the columnar measurement is
    # throughput-bound, not fixed-overhead-bound
    reps = max(1, 1_000_000 // max(len(lines), 1))
    big = (
        raw.crossJoin(spark.range(reps).select(F.col("id").alias("__rep")))
        .select("value")
        .repartition(32)
        .persist()
    )
    n = big.count()
    out = enrich_json_or_passthrough(big)
    out.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    spark_s = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "n_envelopes": n,
                "python_per_message_msgs_per_sec": round(len(lines) / py_s),
                "engine_columnar_msgs_per_sec": round(n / spark_s),
                "speedup": round((n / spark_s) / (len(lines) / py_s), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
