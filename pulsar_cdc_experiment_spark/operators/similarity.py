"""Embedding similarity search: brute-force top-k and LSH-bucketed ANN.

Vectors are plain ``array<float>`` columns; math is done in double via
built-in higher-order functions (zip_with/aggregate) — JVM-side, no Python.

Scale: brute-force is one scan + TakeOrdered (exact, O(N·d) per query —
the right baseline and the right answer for ≤10^7 rows per query batch).
The LSH path buckets vectors by random-hyperplane signs: bucketing is a
map-side signature + one shuffle; queries probe their own bucket plus
1-bit-flip neighbors (multiprobe), trading recall for a ~2^bits fan-in
reduction. Plane matrix is seeded-deterministic and broadcast as literals;
at 100 TB the bucketed table would be written out partitioned by bucket so
probes become partition-pruned scans.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        df.select(
            F.col(id_col),
            cosine(F.col(vec_col), q).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hyperplanes(dim: int, bits: int = 12, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplane matrix (bits × dim)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def lsh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id of a vector under the given hyperplanes."""
    out = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        out = out + F.when(dot(vec, p) > 0, F.lit(2**i)).otherwise(0)
    return out


def lsh_bucketize(
    df: DataFrame, planes: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    return df.withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))


def probe_buckets(bucket: int, bits: int, radius: int) -> set[int]:
    """All bucket ids within Hamming distance ``radius`` of ``bucket``."""
    from itertools import combinations

    probes = {bucket}
    for r in range(1, min(radius, bits) + 1):
        for idxs in combinations(range(bits), r):
            flipped = bucket
            for i in idxs:
                flipped ^= 2**i
            probes.add(flipped)
    return probes


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    planes: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 1,
) -> DataFrame:
    """ANN top-k probing every bucket within Hamming distance ``multiprobe``
    of the query's bucket (0 = own bucket only, 1 = +all 1-bit flips,
    2 = +all 2-bit flips, ...). Probe count grows as sum of C(bits, r) —
    at the 4–16 bit scales this operator targets that stays small; recall
    rises with the radius at proportional fan-in cost."""
    probes = probe_buckets(query_bucket(query_vec, planes), len(planes), multiprobe)
    bucketed = lsh_bucketize(df, planes, vec_col)
    return _topk_in_buckets(bucketed, probes, query_vec, k, id_col, vec_col)


def _topk_in_buckets(bucketed, probes, query_vec, k, id_col, vec_col):
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        bucketed.filter(F.col("__bucket").isin(*probes))
        .select(F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def query_bucket(query_vec, planes: np.ndarray) -> int:
    """Driver-side bucket id of a query vector (mirrors lsh_bucket)."""
    qv = np.asarray(query_vec, dtype=float)
    return sum(2**i for i, plane in enumerate(planes) if float(qv @ plane) > 0)


def write_ann_index(
    df: DataFrame, dst: str, planes: np.ndarray, vec_col: str = "embedding"
) -> None:
    """Persist the LSH index as a BUCKET-PARTITIONED parquet layout.

    This is the 100 TB shape of the ANN path: ``lsh_topk`` bucketizes at
    query time (full scan per query — fine for one-off jobs), whereas a
    served index computes buckets ONCE at write time and lays the table
    out with one directory per bucket, so every probe is a partition-
    pruned scan that reads only the probed buckets' files
    (2^bits directories; with bits sized so each holds ≳ one row group).
    tests/test_scale_plans.py asserts the probe plan carries non-empty
    PartitionFilters — the proof the pruning actually reaches the scan.
    """
    lsh_bucketize(df, planes, vec_col).write.partitionBy("__bucket").mode(
        "overwrite"
    ).parquet(dst)


def probe_ann_index(
    spark,
    path: str,
    query_vec: list[float],
    planes: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 1,
) -> DataFrame:
    """ANN top-k over a :func:`write_ann_index` layout: the bucket filter
    is a PARTITION filter (``__bucket`` is a directory column), so Spark
    plans a pruned scan over just the probed directories."""
    probes = probe_buckets(query_bucket(query_vec, planes), len(planes), multiprobe)
    return _topk_in_buckets(
        spark.read.parquet(path), probes, query_vec, k, id_col, vec_col
    )


def kmeans_centroids(
    df: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd's k-means for the IVF coarse quantizer.

    Init = the k lowest-id vectors (seedless determinism); each iteration is
    one assign (expression argmin over broadcast centroid literals) + one
    element-wise mean aggregate (posexplode → groupBy(cluster, dim)).
    Centroids (k×d floats) round-trip through the driver per iteration —
    that is the standard shape (they are broadcast model state, not data).
    """
    init = [
        [float(x) for x in r[vec_col]]
        for r in df.orderBy(id_col).limit(k).collect()
    ]
    centroids = init
    for _ in range(iters):
        assigned = df.select(
            F.col(vec_col), _nearest_centroid(F.col(vec_col), centroids).alias("__c")
        )
        dims = assigned.select(
            "__c", F.posexplode(vec_col).alias("__dim", "__val")
        )
        means = (
            dims.groupBy("__c", "__dim")
            .agg(F.avg("__val").alias("__m"))
            .groupBy("__c")
            .agg(F.array_sort(F.collect_list(F.struct("__dim", "__m"))).alias("__ms"))
            .collect()
        )
        new = {r["__c"]: [m["__m"] for m in r["__ms"]] for r in means}
        centroids = [new.get(i, centroids[i]) for i in range(k)]
    return centroids


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid (squared L2) as an expression argmin."""
    scored = [
        F.struct(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(v)) for v in c]),
                    lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("dist"),
            F.lit(i).alias("idx"),
        )
        for i, c in enumerate(centroids)
    ]
    return F.array_min(F.array(*scored)).getField("idx")


def ivf_bucketize(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Assign each vector to its IVF list (coarse cluster). At scale, write
    the output partitioned by __ivf so probes are partition-pruned scans."""
    return df.withColumn("__ivf", _nearest_centroid(F.col(vec_col), centroids))


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k probing the ``nprobe`` nearest IVF lists only."""
    import numpy as np

    q = np.asarray(query_vec, dtype=float)
    d2 = [float(((q - np.asarray(c)) ** 2).sum()) for c in centroids]
    probes = [int(i) for i in np.argsort(d2)[:nprobe]]
    bucketed = ivf_bucketize(df, centroids, vec_col)
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        bucketed.filter(F.col("__ivf").isin(*probes))
        .select(F.col(id_col), cosine(F.col(vec_col), qcol).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def write_ivf_index(
    df: DataFrame,
    dst: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF lists as an ``__ivf``-partitioned parquet layout —
    the IVF mirror of :func:`write_ann_index` (round 8): list assignment
    is computed ONCE at write time, one directory per list, so a served
    probe is a partition-pruned scan reading only the ``nprobe`` probed
    lists' files (`nprobe/n_lists` of the corpus — the scan-fraction
    column of SCALE.md's nprobe curve made physical).
    tests/test_scale_plans.py asserts the probe plan carries non-empty
    PartitionFilters on __ivf."""
    ivf_bucketize(df, centroids, vec_col).write.partitionBy("__ivf").mode(
        "overwrite"
    ).parquet(dst)


def append_ivf_index(
    df: DataFrame,
    path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> None:
    """Incrementally extend a :func:`write_ivf_index` layout: assign
    ONLY the new vectors against the FROZEN centroid model and append
    them to their lists' partition directories — O(new vectors), never
    a corpus re-index. This is the streaming-embedding-ingest shape at
    100 TB: the coarse quantizer is small model state, and freezing it
    keeps every existing assignment valid (probe correctness needs only
    that query-time list selection and stored assignments use the SAME
    centroids), at the cost of list-balance drift if the distribution
    moves — the standard IVF trade; retrain + ``write_ivf_index`` on a
    maintenance schedule, like compaction. Probes stay partition-pruned
    scans over old and appended files alike."""
    ivf_bucketize(df, centroids, vec_col).write.partitionBy("__ivf").mode(
        "append"
    ).parquet(path)


def probe_ivf_index(
    spark,
    path: str,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k over a :func:`write_ivf_index` layout: the nearest-list
    selection happens driver-side against the k×d centroid model (no
    data scan), and the ``__ivf IN (...)`` filter is a PARTITION filter
    over the layout's directories."""
    import numpy as np

    q = np.asarray(query_vec, dtype=float)
    d2 = [float(((q - np.asarray(c)) ** 2).sum()) for c in centroids]
    probes = [int(i) for i in np.argsort(d2)[:nprobe]]
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        spark.read.parquet(path)
        .filter(F.col("__ivf").isin(*probes))
        .select(F.col(id_col), cosine(F.col(vec_col), qcol).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def pairwise_cosine_in_blocks(
    df: DataFrame,
    block_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs within a blocking key (cosine ≥ threshold)."""
    sel = df.select(F.col(id_col), F.col(block_col).alias("__blk"), F.col(vec_col))
    a, b = sel.alias("a"), sel.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__blk") == F.col("b.__blk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def kmedians_centroids(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd-style clustering with coordinate-wise MEDIAN updates.

    Exists for cross-engine reproducibility: a mean of doubles depends on
    summation order (partial-aggregate merge order is nondeterministic),
    but a median is an order statistic — exact and order-independent — so
    centroids computed here match a SQL engine's bit-for-bit, making the
    whole IVF pipeline value-checkable (embed_ivf_portable). Same shape as
    :func:`kmeans_centroids`: assign (expression argmin) + per-(cluster,
    dim) median aggregate; k×d floats round-trip the driver per iteration.
    """
    init = [
        [float(x) for x in r[vec_col]]
        for r in df.orderBy(id_col).limit(k).collect()
    ]
    centroids = init
    for _ in range(iters):
        assigned = df.select(
            F.col(vec_col), _nearest_centroid(F.col(vec_col), centroids).alias("__c")
        )
        dims = assigned.select("__c", F.posexplode(vec_col).alias("__dim", "__val"))
        meds = (
            dims.groupBy("__c", "__dim")
            .agg(F.median(F.col("__val").cast("double")).alias("__m"))
            .groupBy("__c")
            .agg(F.array_sort(F.collect_list(F.struct("__dim", "__m"))).alias("__ms"))
            .collect()
        )
        new = {r["__c"]: [m["__m"] for m in r["__ms"]] for r in meds}
        centroids = [new.get(i, centroids[i]) for i in range(k)]
    return centroids


# ---------------------------------------------------------------------------
# int8 scalar quantization: the memory/bandwidth half of vector search.
# A 100 TB embedding corpus at float32 is 25 TB of codes at int8 — the
# quantized scan reads 4x fewer bytes and the candidate scoring is
# integer arithmetic (exact in doubles up to 2^53, so the scores are
# reproducible bit-for-bit across engines — unlike float dot products,
# whose partial-sum order varies). Classic two-stage retrieval: rank by
# quantized cosine, then rescore the short candidate list against the
# full-precision vectors.


def int8_codes(vec: Column) -> Column:
    """Per-vector symmetric int8 quantization codes.

    scale = max|v| / 127; code_i = floor(v_i * 127 / max|v| + 0.5)
    (round-half-up — deterministic and expressible identically in any
    SQL engine, unlike banker's rounding). Codes land in [-127, 127].
    The max-abs fold uses ``greatest`` (order-independent), so codes are
    exactly reproducible regardless of partial-aggregation order.
    """
    ma = F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))),
    )
    ma = F.greatest(ma, F.lit(1e-30))  # zero-vector guard: codes all 0
    return F.transform(
        vec, lambda v: F.floor(v.cast("double") * 127.0 / ma + 0.5)
    )


def int8_query_codes(query_vec: list[float]) -> list[int]:
    """Driver-side twin of :func:`int8_codes` for a literal query vector
    (same IEEE-double arithmetic, so codes agree with the column path)."""
    import math

    ma = max(max(abs(float(v)) for v in query_vec), 1e-30)
    return [int(math.floor(float(v) * 127.0 / ma + 0.5)) for v in query_vec]


def quantized_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by int8-quantized cosine, with the exact full-precision
    cosine attached for rescoring.

    Output: (id, q_cos, cos_sim) — q_cos ranks the candidates (integer
    dot over codes, exact), cos_sim is the rescoring pass over the
    original vectors, computed on the SAME row so the short list never
    re-joins the corpus. At cluster scale the codes column is written
    once (OPTIMIZE-style maintenance) and the quantized scan replaces
    the float32 scan; here both live in one plan to keep the query
    self-contained.
    """
    qc = int8_query_codes(query_vec)
    qcol = F.array(*[F.lit(int(c)) for c in qc])
    qvecol = F.array(*[F.lit(float(v)) for v in query_vec])
    nq2 = float(sum(c * c for c in qc))
    codes = F.col("__code")
    qdot = F.aggregate(
        F.zip_with(codes, qcol, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na2 = F.aggregate(
        F.transform(codes, lambda x: (x * x).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        df.select(
            F.col(id_col),
            F.col(vec_col),
            int8_codes(F.col(vec_col)).alias("__code"),
        )
        .select(
            F.col(id_col),
            # zero-vector corpus row: qdot=0 AND na2=0 → 0/0 = NaN, which
            # Spark sorts ABOVE every double in DESC order, so unguarded
            # zero vectors would rank FIRST. Mirror int8_codes' guard on
            # the denominator: the score becomes exactly 0.0 (round-12
            # advice).
            (
                qdot
                / (F.greatest(F.sqrt(na2), F.lit(1e-30)) * F.sqrt(F.lit(nq2)))
            ).alias("q_cos"),
            cosine(F.col(vec_col), qvecol).alias("cos_sim"),
        )
        .orderBy(F.col("q_cos").desc(), F.col(id_col).asc())
        .limit(k)
    )
