"""Dump .explain("formatted") for a set of registered queries to files.

Usage:
  python tools/explain_to_files.py --out plans/r19 --suffix _before q1 q2 ...
  python tools/explain_to_files.py --out plans/r19 --suffix _after --headline

Plans are captured at the bench scale ($SPARK_GRAFT_SF_DIR, default
sf0.1) with the bench session settings, so the files reflect exactly
what the benchmark executes. Fixture builds run as needed (session
fixtures are built once per session).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--out", default="plans/r19")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--headline", action="store_true",
                    help="also include every bench.py HEADLINE query")
    args = ap.parse_args()

    names = list(args.queries)
    if args.headline:
        import bench

        names += [n for n in bench.HEADLINE if n not in names]

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
        app_name="explain-dump",
        shuffle_partitions=shuffle_partitions_for_bytes(sf_bytes),
    )
    from pulsar_cdc_experiment_spark import registry

    registry.load_all_query_modules()
    queries = dict(registry.QUERIES)
    from pulsar_cdc_experiment_spark.queries.llm_ops import (
        dedup_minhash_lsh_fast,
    )

    queries["dedup_minhash_lsh_fast"] = dedup_minhash_lsh_fast

    os.makedirs(args.out, exist_ok=True)
    for name in names:
        try:
            df = queries[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
            print(f"FAIL {name}: {plan[:200]}", file=sys.stderr)
        with open(
            os.path.join(args.out, f"{name}{args.suffix}.txt"), "w"
        ) as f:
            f.write(plan)
        print(f"wrote {name}{args.suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
