"""IVF-ANN nprobe → recall/latency/scan-fraction curve (round-7 verdict
task 5): the measurement that justifies choosing IVF over LSH at scale.

For each nprobe in the sweep: run ivf_topk for N query vectors against
the embeddings table, score recall@k against the brute-force exact top-k,
time each probe, and compute the fraction of the corpus the probed lists
actually scan — the quantity that matters at 100 TB, where a probe's cost
is proportional to rows read, not to wall-clock on a 2000-row fixture.

Usage:
    python tools/ivf_curve.py [--sf-dir /root/testdata/sf0.1]
                              [--queries 16] [--topk 10] [--lists 16]

Prints a markdown table (paste into SCALE.md) and one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", type=int, default=16)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--lists", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.operators import similarity as S
    from pulsar_cdc_experiment_spark.session import get_spark
    from pulsar_cdc_experiment_spark.sources.tables import table

    spark = get_spark(app_name="ivf_curve", shuffle_partitions=16)
    emb = table(spark, args.sf_dir, "embeddings").persist()
    n_total = emb.count()

    cents = S.kmeans_centroids(emb, k=args.lists, iters=args.iters)
    # list sizes: the scan-fraction denominator comes from the ACTUAL
    # assignment, not an even-split assumption
    sizes = {
        r["__ivf"]: r["n"]
        for r in S.ivf_bucketize(emb, cents)
        .groupBy("__ivf").agg(F.count("*").alias("n")).collect()
    }

    # query vectors: every 7th vec_id — spread across the corpus, stable
    qrows = (
        emb.filter(F.col("vec_id") % 7 == 0)
        .orderBy("vec_id").limit(args.queries).collect()
    )
    queries = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows]

    exact = {}
    for qid, qv in queries:
        exact[qid] = {
            r["vec_id"]
            for r in S.brute_force_topk(emb, qv, k=args.topk).collect()
        }

    import numpy as np

    sweep = sorted({1, 2, 4, 8, args.lists})
    results = []
    for nprobe in sweep:
        recalls, times, fracs = [], [], []
        for qid, qv in queries:
            q = np.asarray(qv, dtype=float)
            d2 = [float(((q - np.asarray(c)) ** 2).sum()) for c in cents]
            probes = [int(i) for i in np.argsort(d2)[:nprobe]]
            fracs.append(sum(sizes.get(p, 0) for p in probes) / n_total)
            t0 = time.perf_counter()
            got = {
                r["vec_id"]
                for r in S.ivf_topk(
                    emb, qv, cents, k=args.topk, nprobe=nprobe
                ).collect()
            }
            times.append(time.perf_counter() - t0)
            recalls.append(len(got & exact[qid]) / args.topk)
        times.sort()
        results.append({
            "nprobe": nprobe,
            "recall": round(sum(recalls) / len(recalls), 3),
            "scan_frac": round(sum(fracs) / len(fracs), 3),
            "probe_sec_median": round(times[len(times) // 2], 3),
        })

    print(f"\n| nprobe | recall@{args.topk} | corpus scanned | probe sec (median, "
          f"sf={os.path.basename(args.sf_dir)}) |")
    print("|---|---|---|---|")
    for r in results:
        print(f"| {r['nprobe']} | {r['recall']:.3f} | "
              f"{100 * r['scan_frac']:.1f}% | {r['probe_sec_median']:.3f} |")
    print()
    print(json.dumps({
        "sf_dir": args.sf_dir, "n_vectors": n_total, "lists": args.lists,
        "topk": args.topk, "n_queries": len(queries), "curve": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
