"""Tests for embedding similarity search (SURVEY.md §2 C42)."""

from __future__ import annotations

from pulsar_cdc_experiment_spark.operators import similarity as S
from pulsar_cdc_experiment_spark.sources.tables import table


def test_brute_force_topk_self_first(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    qvec = emb.filter("vec_id = 7").first()["embedding"]
    top = S.brute_force_topk(emb, qvec, k=5).collect()
    assert top[0]["vec_id"] == 7
    assert abs(top[0]["cos_sim"] - 1.0) < 1e-9
    sims = [r["cos_sim"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_recall_on_planted_cluster(spark):
    """LSH recall is only meaningful when true neighbors exist: the parquet
    embeddings' top-10 cosines are ~0.3 (near-random — no scheme recalls
    those), so plant a genuine cluster and measure recall there."""
    import numpy as np

    rng = np.random.default_rng(7)
    dim = 64
    background = rng.standard_normal((200, dim))
    q = rng.standard_normal(dim)
    planted = q + 0.15 * rng.standard_normal((15, dim))  # cosine ≈ 0.98
    rows = [
        (i, [float(x) for x in v], 0)
        for i, v in enumerate(np.vstack([background, planted]))
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    qvec = [float(x) for x in q]
    planes = S.hyperplanes(dim=dim, bits=8, seed=42)
    exact = {r["vec_id"] for r in S.brute_force_topk(emb, qvec, k=10).collect()}
    approx = {r["vec_id"] for r in S.lsh_topk(emb, qvec, planes, k=10).collect()}
    assert exact <= set(range(200, 215))  # brute force finds the planted set
    assert len(exact & approx) >= 8  # LSH recalls ≥80% of true neighbors


def test_lsh_on_real_embeddings_smoke(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    qvec = emb.filter("vec_id = 7").first()["embedding"]
    planes = S.hyperplanes(dim=len(qvec), bits=4, seed=42)
    approx = S.lsh_topk(emb, qvec, planes, k=10).collect()
    assert 7 in {r["vec_id"] for r in approx}  # query always in its own bucket
    sims = [r["cos_sim"] for r in approx]
    assert sims == sorted(sims, reverse=True)


def test_pairwise_blocked_cosine_threshold(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    pairs = S.pairwise_cosine_in_blocks(emb, "label", 0.9).collect()
    assert all(r["cos_sim"] >= 0.9 for r in pairs)
    assert all(r["id_a"] < r["id_b"] for r in pairs)


def test_ivf_recall_on_planted_cluster(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    dim = 32
    background = rng.standard_normal((150, dim))
    q = rng.standard_normal(dim)
    planted = q + 0.15 * rng.standard_normal((12, dim))
    rows = [
        (i, [float(x) for x in v], 0)
        for i, v in enumerate(np.vstack([background, planted]))
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    qvec = [float(x) for x in q]
    cents = S.kmeans_centroids(emb, k=6, iters=2)
    exact = {r["vec_id"] for r in S.brute_force_topk(emb, qvec, k=10).collect()}
    approx = {r["vec_id"] for r in S.ivf_topk(emb, qvec, cents, k=10, nprobe=2).collect()}
    # the planted cluster concentrates in one IVF list; probing 2 of 6
    # lists must recover most of the true top-k
    assert len(exact & approx) >= 8


def test_probe_buckets_hamming_radius():
    """multiprobe=k probes exactly the Hamming ball of radius k (round-1
    advice: values > 1 previously added nothing beyond 1-bit flips)."""
    from math import comb

    from pulsar_cdc_experiment_spark.operators.similarity import probe_buckets

    def popcount_ball(bucket, bits, r):
        return {
            b for b in range(2**bits) if bin(b ^ bucket).count("1") <= r
        }

    for bits, bucket in ((4, 0b1010), (5, 0)):
        for radius in range(0, bits + 1):
            got = probe_buckets(bucket, bits, radius)
            assert got == popcount_ball(bucket, bits, radius)
            assert len(got) == sum(comb(bits, r) for r in range(radius + 1))
    # radius beyond bit width saturates, never errors
    assert probe_buckets(3, 3, 99) == set(range(8))


def test_ivf_nprobe_recall_curve_on_real_embeddings(spark, sf_dir):
    """Round-8 (r7 verdict #5): pin the nprobe → recall trade-off that
    justifies IVF at scale on the REAL embeddings table, not a planted
    cluster. Asserts (a) recall@10 at the DEFAULT nprobe=4 stays ≥ 0.6
    (measured 0.73 at sf0.001, 0.68 at sf0.1 — tools/ivf_curve.py, table
    in SCALE.md), (b) recall is monotone in nprobe (more lists probed
    can only add candidates), and (c) nprobe = n_lists is exact —
    probing everything IS brute force. The wall-clock trade lives in
    tools/ivf_curve.py's scan-fraction column (nprobe/n_lists of the
    corpus read per probe on the partitioned layout)."""
    from pyspark.sql import functions as F

    emb = table(spark, sf_dir, "embeddings")
    cents = S.kmeans_centroids(emb, k=16, iters=3)
    qrows = (
        emb.filter(F.col("vec_id") % 7 == 0).orderBy("vec_id").limit(8).collect()
    )
    queries = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows]

    # the exact top-10 is nprobe-independent — compute it once per query
    # instead of once per curve point (round-20 suite wall-time; the
    # assertions are unchanged)
    exact_by_q = {
        qid: {r["vec_id"] for r in S.brute_force_topk(emb, qv, k=10).collect()}
        for qid, qv in queries
    }

    def recall_at(nprobe: int) -> float:
        hits = 0
        for qid, qv in queries:
            got = {
                r["vec_id"]
                for r in S.ivf_topk(emb, qv, cents, k=10, nprobe=nprobe).collect()
            }
            hits += len(got & exact_by_q[qid])
        return hits / (10 * len(queries))

    curve = {np_: recall_at(np_) for np_ in (1, 4, 16)}
    assert curve[4] >= 0.6, curve
    assert curve[1] <= curve[4] <= curve[16], curve
    assert curve[16] == 1.0, curve


def test_int8_quantized_topk_recall_and_code_bounds(spark, sf_dir):
    """int8 scalar quantization: codes bounded in [-127, 127], every
    vector's max-magnitude coordinate maps to ±127 (symmetric scale is
    per-vector), and quantized top-10 recalls ≥ 8/10 of the exact
    top-10 (64-dim embeddings lose little ordering at 8 bits). The
    rescoring column must equal brute-force cosine exactly — same fold,
    same rows."""
    from pyspark.sql import functions as F

    emb = table(spark, sf_dir, "embeddings")
    codes = emb.select(
        "vec_id", S.int8_codes(F.col("embedding")).alias("code")
    )
    stats = codes.select(
        F.max(F.array_max("code")).alias("mx"),
        F.min(F.array_min("code")).alias("mn"),
        F.min(
            F.greatest(F.abs(F.array_max("code")), F.abs(F.array_min("code")))
        ).alias("peak_min"),
    ).first()
    assert stats["mx"] <= 127 and stats["mn"] >= -127
    assert stats["peak_min"] == 127  # per-vector scale: peak always saturates

    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    exact = {r["vec_id"] for r in S.brute_force_topk(emb, qvec, k=10).collect()}
    qrows = S.quantized_topk(emb, qvec, k=10).collect()
    got = {r["vec_id"] for r in qrows}
    assert len(got & exact) >= 8, (sorted(got), sorted(exact))
    # rescoring column is the true cosine for those rows
    by_id = {
        r["vec_id"]: r["cos_sim"]
        for r in S.brute_force_topk(emb, qvec, k=500).collect()
    }
    for r in qrows:
        assert abs(r["cos_sim"] - by_id[r["vec_id"]]) < 1e-12


def test_quantized_topk_zero_vector_ranks_last_not_first(spark):
    """Round-13 (r12 advice): an all-zero corpus vector has qdot=0 AND
    na2=0; unguarded, q_cos = 0/0 = NaN, which Spark sorts ABOVE every
    double in DESC order — the zero vector would rank FIRST. The
    denominator guard pins its score to exactly 0.0 so it sorts with
    the other orthogonal vectors, never above a real match."""
    import math

    from pulsar_cdc_experiment_spark.operators import similarity as S

    rows = [
        (0, [1.0, 0.0, 0.0]),   # exact match to query
        (1, [0.9, 0.1, 0.0]),   # near match
        (2, [0.0, 0.0, 0.0]),   # zero vector
        (3, [-1.0, 0.0, 0.0]),  # anti-match
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = S.quantized_topk(df, [1.0, 0.0, 0.0], k=4).collect()
    assert [r["vec_id"] for r in got] == [0, 1, 2, 3]
    zrow = [r for r in got if r["vec_id"] == 2][0]
    assert zrow["q_cos"] == 0.0 and not math.isnan(zrow["q_cos"])


def test_append_ivf_index_equals_bulk_with_frozen_centroids(spark, sf_dir):
    """append_ivf_index (round-15): an index built on two-thirds of the
    corpus and appended with the rest must be ROW-IDENTICAL (id, list
    assignment) to a bulk write of the full corpus under the SAME
    frozen centroids — and a partition-pruned probe over the appended
    layout must return exactly the bulk layout's results, including
    appended vectors. Also pins that the probe scan stays
    partition-pruned (PartitionFilters on __ivf) over the mixed
    old+appended files."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.operators import similarity as S
    from pulsar_cdc_experiment_spark.sources.tables import table

    emb = table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="ivf_append_t_")
    try:
        base = emb.filter(F.col("vec_id") % 3 != 0)
        cents = S.kmedians_centroids(base, k=8, iters=2)
        inc = os.path.join(root, "inc")
        bulk = os.path.join(root, "bulk")
        S.write_ivf_index(base, inc, cents)
        S.append_ivf_index(
            emb.filter(F.col("vec_id") % 3 == 0), inc, cents
        )
        S.write_ivf_index(emb, bulk, cents)
        rows_inc = {
            (r["vec_id"], r["__ivf"])
            for r in spark.read.parquet(inc).select("vec_id", "__ivf").collect()
        }
        rows_bulk = {
            (r["vec_id"], r["__ivf"])
            for r in spark.read.parquet(bulk).select("vec_id", "__ivf").collect()
        }
        assert rows_inc == rows_bulk
        q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        got_inc = [
            (r["vec_id"], round(r["cos_sim"], 9))
            for r in S.probe_ivf_index(spark, inc, q, cents, k=10, nprobe=2).collect()
        ]
        got_bulk = [
            (r["vec_id"], round(r["cos_sim"], 9))
            for r in S.probe_ivf_index(spark, bulk, q, cents, k=10, nprobe=2).collect()
        ]
        assert got_inc == got_bulk
        assert got_inc[0][0] == 0  # the APPENDED query vector is found
        df = S.probe_ivf_index(spark, inc, q, cents, k=10, nprobe=2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "__ivf" in plan, plan
    finally:
        shutil.rmtree(root, ignore_errors=True)
