"""CLI: run the config-driven CDC pipeline, mirroring the reference's UX.

The reference deploys from declarative YAML (connector manifest + function
binding); the Spark engine's equivalent one-liner:

    python -m pulsar_cdc_experiment_spark run --config pipeline.yaml
    python -m pulsar_cdc_experiment_spark materialize --config pipeline.yaml
    python -m pulsar_cdc_experiment_spark enrich-batch --config pipeline.yaml

Config is the CdcPipeline dict (pipeline.py docstring) as YAML or JSON:

    source:      {path: /data/cdc-feed, format: json-envelope, rescue: true}
    tables:      {include: [public.customers]}
    enrichment:  {function_name: cdc-enrichment, topic: customers}
    materialize: {key: after.id}
    sink:        {path: /out, format: parquet}

`run` starts the streaming sink and blocks until termination (or
``--available-now`` to drain and exit — the batch face of the same plan).
"""

from __future__ import annotations

import argparse
import json
import sys


def load_config(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        import yaml

        return yaml.safe_load(text)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pulsar_cdc_experiment_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, help_ in (
        ("run", "start the streaming enrich pipeline into the configured sink"),
        ("materialize", "batch-fold the feed to latest-row state parquet"),
        ("enrich-batch", "batch-enrich the feed to the configured sink path"),
    ):
        p = sub.add_parser(name, help=help_)
        p.add_argument("--config", required=True)
        p.add_argument("--master", default=None)
        if name == "run":
            p.add_argument(
                "--available-now",
                action="store_true",
                help="drain everything currently in the source, then exit",
            )
    args = ap.parse_args(argv)

    from .pipeline import CdcPipeline
    from .session import get_spark

    cfg = load_config(args.config)
    pipe = CdcPipeline(cfg)
    spark = get_spark(app_name=f"cdc-{args.cmd}", master=args.master)
    try:
        if args.cmd == "run":
            q = pipe.start(spark, available_now=args.available_now)
            q.awaitTermination()
            return 0
        if args.cmd == "materialize":
            out = cfg["sink"]["path"]
            pipe.materialized(spark).write.mode("overwrite").parquet(out)
            print(f"materialized state -> {out}")
            return 0
        if args.cmd == "enrich-batch":
            out = cfg["sink"]["path"]
            pipe.enriched_json(spark, streaming=False).write.mode(
                "overwrite"
            ).text(out)
            print(f"enriched feed -> {out}")
            return 0
        return 2
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
