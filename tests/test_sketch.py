"""Misra-Gries frequent-items sketch (operators/sketch.py).

Pins the two claims the frequent_tokens_sketch query rests on:
1. SUPERSET — every item with global count > n/(capacity+1) survives the
   per-partition candidate pass, under adversarial skewed partitionings.
2. EXACTNESS — candidates + exact recount + threshold equals the brute
   force GROUP BY/HAVING answer exactly.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pulsar_cdc_experiment_spark.operators.sketch import mg_candidates


def _freq_truth(items, capacity):
    from collections import Counter

    n = len(items)
    cnt = Counter(items)
    return {i for i, c in cnt.items() if c * (capacity + 1) > n}


def _run(spark, items, capacity, num_partitions):
    df = spark.createDataFrame(
        [(x,) for x in items], "tok string"
    ).repartition(num_partitions)
    cand = {r.tok for r in mg_candidates(df, "tok", capacity).collect()}
    return cand


def test_mg_superset_uniform_plus_heavy(spark):
    rng = random.Random(7)
    # 5000 background tokens over a 400-word vocab + one heavy hitter at 8%
    items = [f"w{rng.randrange(400)}" for _ in range(5000)]
    items += ["HEAVY"] * 430
    rng.shuffle(items)
    for parts in (1, 3, 16):
        cand = _run(spark, items, capacity=10, num_partitions=parts)
        assert _freq_truth(items, 10) <= cand
        assert "HEAVY" in cand


def test_mg_superset_adversarial_sorted_partitions(spark):
    # worst case for per-partition summaries: the stream arrives SORTED,
    # so each partition is dominated by few tokens; the frequent item is
    # spread thin across all of them
    items = sorted(f"w{i % 300}" for i in range(6000))
    items += ["HEAVY"] * 500  # ~7.7% > 1/21
    df_items = items  # keep sorted-ish order; repartition round-robins
    cand = _run(spark, df_items, capacity=20, num_partitions=8)
    assert _freq_truth(items, 20) <= cand


def test_mg_bounded_output(spark):
    rng = random.Random(11)
    items = [f"w{rng.randrange(2000)}" for _ in range(4000)]
    parts = 4
    cand = _run(spark, items, capacity=15, num_partitions=parts)
    # union of per-partition summaries: at most capacity x partitions
    assert len(cand) <= 15 * parts


def test_frequent_tokens_query_equals_brute_force(spark, sf_dir):
    from pulsar_cdc_experiment_spark.queries.llm_ops import (
        frequent_tokens_sketch,
    )
    from pulsar_cdc_experiment_spark.operators import text as TX
    from pulsar_cdc_experiment_spark.sources.tables import table

    got = {
        (r.tok, r.freq)
        for r in frequent_tokens_sketch(spark, sf_dir).collect()
    }
    toks = (
        table(spark, sf_dir, "documents")
        .select(F.explode(TX.tokens(F.col("text"))).alias("tok"))
    )
    n = toks.count()
    brute = {
        (r.tok, r.freq)
        for r in toks.groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") * 41 > F.lit(n))
        .collect()
    }
    assert got == brute and len(brute) > 0
