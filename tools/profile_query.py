"""Job-level profile of one registered query: where does the wall go?

Runs the query like bench.py does (cold: fixture cache cleared; then one
warm run), with the Spark event log enabled, and attributes wall time to
individual jobs (+ the gaps between them = driver-side work: planning,
manifest IO, file ops).

Usage: python tools/profile_query.py <query> [--sf-dir DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse(part: str, jobs: dict) -> None:
    if part.endswith(".zstd"):
        import io

        import pyarrow as pa

        fh = io.TextIOWrapper(
            pa.CompressedInputStream(part, "zstd"), encoding="utf-8"
        )
    else:
        fh = open(part)
    with fh as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"] / 1000.0,
                    "desc": (
                        props.get("spark.job.description")
                        or props.get("callSite.short", "")
                    )[:110],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"] / 1000.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cold-runs", type=int, default=2)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="spark-events-")

    from pyspark.sql import SparkSession

    from pulsar_cdc_experiment_spark.session import (
        RUNTIME_CONF,
        default_parallelism,
        shuffle_partitions_for_bytes,
    )

    sf_bytes = sum(
        os.path.getsize(os.path.join(args.sf_dir, f))
        for f in os.listdir(args.sf_dir)
        if f.endswith(".parquet")
    )
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(f"profile-{args.query}")
        .master(f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions_for_bytes(sf_bytes)),
        )
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "spark-warehouse"),
        )
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from pulsar_cdc_experiment_spark import registry

    registry.load_all_query_modules()
    queries = dict(registry.QUERIES)
    from pulsar_cdc_experiment_spark.queries.llm_ops import (
        dedup_minhash_lsh_fast,
    )

    queries["dedup_minhash_lsh_fast"] = dedup_minhash_lsh_fast
    fn = queries[args.query]

    from pulsar_cdc_experiment_spark.queries import fixture_cache

    # warm codegen on the tiny SF, like bench.py
    warm_sf = "/root/testdata/sf0.001"
    try:
        df = fn(spark, warm_sf)
        df.write.format("noop").mode("overwrite").save()
    except Exception as e:  # noqa: BLE001
        print(f"warm-up failed (continuing): {e}", file=sys.stderr)

    sc = spark.sparkContext
    marks: list[tuple[str, float, float]] = []

    def timed(label: str, cold: bool) -> None:
        if cold:
            fixture_cache.clear(markers=False)
        spark.catalog.clearCache()
        sc.setJobDescription(None)
        t0 = time.time()
        out = fn(spark, args.sf_dir)
        out.write.format("noop").mode("overwrite").save()
        marks.append((label, t0, time.time()))

    for i in range(args.cold_runs):
        timed(f"cold{i}", cold=True)
    timed("warm", cold=False)

    app_id = sc.applicationId
    spark.stop()

    # parse the event log (Spark 4 writes a rolling dir: eventlog_v2_<app>/)
    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        d = os.path.join(evdir, f"eventlog_v2_{app_id}")
        parts = sorted(
            os.path.join(d, f) for f in os.listdir(d)
            if not f.startswith("appstatus")
        )
    else:
        parts = [path]
    jobs: dict[int, dict] = {}
    for part in parts:
        _parse(part, jobs)

    for label, t0, t1 in marks:
        wall = t1 - t0
        runjobs = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if j.get("end") and t0 <= j["start"] <= t1
        ]
        jobtime = sum(j["end"] - j["start"] for _, j in runjobs)
        print(f"\n=== {label}: wall {wall:.2f}s, {len(runjobs)} jobs, "
              f"job-time {jobtime:.2f}s, gaps {wall - jobtime:.2f}s ===")
        prev_end = t0
        for jid, j in runjobs:
            gap = j["start"] - prev_end
            dur = j["end"] - j["start"]
            mark = " <<GAP" if gap > 0.15 else ""
            print(
                f"  job {jid:4d}  +{gap:5.2f}s gap{mark}  run {dur:5.2f}s"
                f"  {j['desc']}"
            )
            prev_end = max(prev_end, j["end"])
        print(f"  tail gap {t1 - prev_end:5.2f}s")

    print(f"\nevent log: {path}")


if __name__ == "__main__":
    main()
