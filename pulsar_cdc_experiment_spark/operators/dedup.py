"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The scale story (the reason these exist at all):

- exact: one shuffle on the hash of the content column. At 100 TB, dedup on
  a digest column (xxhash64) instead of raw text so the shuffle carries 8
  bytes/row, not documents.
- n-gram Jaccard within blocks: quadratic ONLY within a blocking key —
  choose blocks so the largest block is bounded; the block join broadcasts
  nothing and shuffles each doc once.
- MinHash+LSH: linear-cost candidate generation. signatures are k=32 ints
  per doc (map-side), banding explodes to bands-per-doc rows, the bucket
  group-by is the single shuffle, and only same-bucket docs are pair-joined.
  This is the 100 TB near-dup path; threshold/bands tune the S-curve.
- SimHash: one 64-bit signature per doc; near-dups cluster by signature
  band. Cheapest signal, coarsest.

Everything is built-in expressions. The default LSH/SimHash paths use JVM
murmur/xxhash (engine-specific → their queries declare rows-only oracles;
the Jaccard math itself is oracle-checked); portable_minhash_near_dups
swaps in a cross-engine polynomial hash family so the ENTIRE pipeline is
value-checkable (dedup_minhash_portable has a full DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..plans.tuning import fan_out
from .text import tokens


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact content value (C28).

    Aggregation (not dropDuplicates) so the survivor choice is deterministic
    regardless of partitioning.
    """
    return df.groupBy(content_col).agg(
        F.min(id_col).alias(id_col),
        F.count("*").alias("n_copies"),
    )


def word_ngrams(toks: Column, n: int = 3) -> Column:
    """Sliding word n-gram shingles of a TOKEN ARRAY column.

    Takes the token array (not raw text) deliberately: this expression
    references its input ~|tokens| times, so the caller must materialize
    tokenization in its own projection first (see ``shingled``) — otherwise
    Catalyst inlines the regex tokenizer per reference and per lambda
    element (measured 10x slowdown).
    """
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def shingled(
    df: DataFrame, id_col: str, text_col: str, n: int, *extra_cols: str
) -> DataFrame:
    """(id, *extra, __shingles) with tokenization materialized once.

    Two separate projections: tokens first (multi-referenced alias —
    CollapseProject keeps it), shingles second; plus a fan-out so small
    single-file inputs use all cores. Together these took the sf0.1 MinHash
    signature stage from 15 s to ~1 s.
    """
    wt = fan_out(df).select(
        F.col(id_col), *[F.col(c) for c in extra_cols],
        tokens(F.col(text_col)).alias("__toks"),
    )
    return wt.select(
        F.col(id_col), *[F.col(c) for c in extra_cols],
        F.array_distinct(word_ngrams(F.col("__toks"), n)).alias("__shingles"),
    )


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two arrays treated as sets."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All same-block pairs with n-gram Jaccard ≥ threshold.

    Quadratic within a block only; callers pick ``block_col`` so blocks stay
    bounded (at 100 TB: length-bucket × language × source, or an LSH bucket
    from :func:`minhash_lsh_candidates` for unbounded corpora).
    """
    sh = shingled(df, id_col, text_col, n, block_col).withColumnRenamed(
        block_col, "__block"
    )
    a = sh.alias("a")
    b = sh.alias("b")
    pair = a.join(
        b,
        (F.col(f"a.__block") == F.col(f"b.__block"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    sim = jaccard(F.col("a.__shingles"), F.col("b.__shingles"))
    return pair.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        sim.alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    ngram: int = 3,
) -> DataFrame:
    """MinHash signatures as ``num_hashes`` flat int columns ``h0..h{k-1}``.

    Shape chosen for scale: explode shingles → per-row murmur3 with k seeds →
    one groupBy(doc) with k ``min`` aggregates. Flat expressions (no nested
    higher-order functions), map-side partial mins, a single shuffle whose
    payload is k ints per doc. (A first cut computed the signature as one
    nested transform-over-shingles expression per seed — Catalyst inlined
    the shingle expression 32×, 70 s for 500 docs. This shape is ~20× faster
    and is also the right plan at 100 TB.)
    """
    sh = shingled(df, id_col, text_col, ngram).select(
        F.col(id_col), F.explode("__shingles").alias("__sh")
    )
    return sh.groupBy(id_col).agg(
        *[F.min(F.hash("__sh", F.lit(j))).alias(f"h{j}") for j in range(num_hashes)]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    ngram: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become candidates.

    Returns (id_a, id_b) candidate pairs, deduplicated across bands. With
    k=32, b=8, r=4 the S-curve crosses ~50% candidate probability at
    Jaccard ≈ (1/b)^(1/r) ≈ 0.6. See :func:`_band_candidates` for the
    ``max_bucket_size`` hot-bucket guard.
    """
    sig = minhash_signatures(df, id_col, text_col, num_hashes, ngram)
    return _band_candidates(sig, id_col, num_hashes, bands, max_bucket_size)


def _banded_buckets(sig: DataFrame, id_col: str, num_hashes: int, bands: int) -> DataFrame:
    """(id, band, bucket) rows: one bucket id per band per doc."""
    rows_per_band = num_hashes // bands
    return sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(
                            *[
                                F.col(f"h{j}")
                                for j in range(b * rows_per_band, (b + 1) * rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def _band_candidates(
    sig: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band a signature table (h0..h{k-1} columns) into bucket candidates.

    ``max_bucket_size`` is the hot-bucket guard: candidate generation is
    quadratic WITHIN a bucket, so one pathological bucket (boilerplate
    text, empty docs, a template) can dominate the whole job at scale.
    Buckets holding more than ``max_bucket_size`` docs are excluded from
    pair generation (their members usually still pair via their other
    bands' buckets). The per-bucket count is a window over exactly the
    join key, so it reuses the join's own (band, bucket) shuffle — the
    guard costs no extra full-data exchange. Use
    :func:`lsh_oversized_buckets` to LOG what the guard dropped.
    """
    banded = _banded_buckets(sig, id_col, num_hashes, bands)
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "bucket")
        banded = (
            banded.withColumn("__bsz", F.count("*").over(w))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def lsh_oversized_buckets(
    sig: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
    max_bucket_size: int,
) -> DataFrame:
    """The guard's drop metric: (band, bucket, n_docs) rows the cap excluded.

    Callers log/sink this next to the dedup output so a silent recall loss
    is visible in ops — at 100 TB 'the guard fired' is a signal (template
    spam, empty docs) worth alerting on, not just a perf footnote.
    """
    return (
        _banded_buckets(sig, id_col, num_hashes, bands)
        .groupBy("band", "bucket")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > max_bucket_size)
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    ngram: int = 3,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """LSH candidates verified with true n-gram Jaccard ≥ threshold.

    The shingle table feeds both the signature path and the verify join;
    persist it so tokenization+shingling runs once (at 100 TB the same role
    is played by writing signatures/shingles to a checkpoint table).

    ``max_bucket_size`` (default 10k) bounds the per-bucket quadratic blow-
    up — a 10k bucket is ~50M candidate pairs, the most one degenerate
    bucket may cost; None disables.
    """
    sh = shingled(df, id_col, text_col, ngram).persist()
    exploded = sh.select(F.col(id_col), F.explode("__shingles").alias("__sh"))
    sig = exploded.groupBy(id_col).agg(
        *[F.min(F.hash("__sh", F.lit(j))).alias(f"h{j}") for j in range(num_hashes)]
    )
    cands = _band_candidates(sig, id_col, num_hashes, bands, max_bucket_size)
    return (
        cands.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("__shingles", "__sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("__shingles", "__sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            jaccard(F.col("__sh_a"), F.col("__sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per doc using xxhash64 per-token bits.

    Same explode→aggregate shape as MinHash: per (doc, token) row compute
    the 64-bit hash once, vote ±1 per bit via 64 flat ``sum`` aggregates,
    then assemble sign bits into one BIGINT signature.
    """
    tok = fan_out(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t")
    ).withColumn("__h", F.xxhash64("__t"))
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright("__h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for b in range(64):
        bit_val = F.lit(1).cast("long") * (2**b) if b < 63 else F.lit(-(2**63)).cast("long")
        sig = sig + F.when(F.col(f"b{b}") > 0, bit_val).otherwise(F.lit(0).cast("long"))
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_clusters(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Docs grouped by identical SimHash signature (coarse near-dup)."""
    sigs = simhash_signatures(df, id_col, text_col)
    return (
        sigs.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("min_id"))
    )


# --- portable MinHash (cross-engine reproducible) ---------------------------

# The engine-hash pipeline above is the FAST path (murmur3 is one JVM call
# per shingle) but cannot be value-checked by another engine. This variant
# swaps the hash for a portable polynomial (char fold mod 1e9+7 — the same
# construction as text.token_fingerprint) + fixed affine re-hashes, so the
# ENTIRE LSH pipeline (signatures → bands → candidates → verify) reproduces
# bit-for-bit in any SQL engine. Cost: ~|shingle| arithmetic ops per hash
# instead of one murmur3 call — measurable but same plan shape; use it when
# cross-system reproducibility of the candidate set matters (audits, or a
# corpus deduped by several engines cooperatively).

PORT_P = 1_000_000_007
PORT_BASE = 131
PORT_A = [3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59]
PORT_B = [101, 103, 107, 109, 113, 127, 137, 139, 149, 151, 157, 163, 167, 173, 179, 181]


def portable_string_hash(col: Column) -> Column:
    """Polynomial char-fold hash, identical in Spark and DuckDB."""
    chars = F.filter(F.split(col, ""), lambda c: c != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * PORT_BASE + F.ascii(c)) % PORT_P,
    )


def portable_minhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.15,
    num_hashes: int = 16,
    bands: int = 4,
    ngram: int = 3,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """minhash_near_dups with the portable hash family — same plan shape
    (explode → flat per-row hash → k min aggregates → band join → Jaccard
    verify), fully oracle-checkable."""
    rows_per_band = num_hashes // bands
    sh = shingled(df, id_col, text_col, ngram).persist()
    hashed = sh.select(
        F.col(id_col), F.explode("__shingles").alias("__s")
    ).select(id_col, portable_string_hash(F.col("__s")).alias("__H"))
    sig = hashed.groupBy(id_col).agg(
        *[
            F.min((F.lit(PORT_A[j]) * F.col("__H") + F.lit(PORT_B[j])) % PORT_P).alias(f"h{j}")
            for j in range(num_hashes)
        ]
    )

    def band_bucket(b: int) -> Column:
        acc = F.lit(0).cast("long")
        for j in range(b * rows_per_band, (b + 1) * rows_per_band):
            acc = (acc * PORT_BASE + F.col(f"h{j}")) % PORT_P
        return acc

    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_bucket(b).alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "bucket")
        banded = (
            banded.withColumn("__bsz", F.count("*").over(w))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return (
        cands.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("__shingles", "__sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("__shingles", "__sh_b"), "id_b")
        .select("id_a", "id_b", jaccard(F.col("__sh_a"), F.col("__sh_b")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def write_signature_index(
    df: DataFrame,
    dst: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    files: int = 4,
    append: bool = False,
    batch_id: str | int | None = None,
) -> tuple[str, str]:
    """Persist a corpus's MinHash signature index on disk: ``dst/shingles``
    (shingle sets keyed on the doc id) and ``dst/bands`` (LSH band/bucket
    rows keyed on ``(band, bucket)``), each range-laid-out on its join key
    (plans/layout.range_layout — the same partition-pruned shape as the
    ANN index, similarity.write_ann_index).

    This is the 100 TB form of dedup-against-history: the corpus is hashed
    ONCE at index-build time; incoming batches (stream or batch) shuffle-
    join the on-disk tables on ``(band, bucket)`` — never a broadcast of
    corpus state, never a re-hash of the history. ``append=True`` adds a
    new batch's signatures as extra files in the same directories
    (correct immediately — the joins don't require disjoint ranges; the
    range layout is a pruning optimization that degrades until the next
    :func:`compact_signature_index` pass, exactly like any LSM-ish table).

    Append batches are ATOMIC and (with a caller-supplied ``batch_id``)
    IDEMPOTENT — the CdcFeedWriter two-phase shape: both tables are
    staged under ``dst/.staging/<batch_id>/`` first, then published by
    renaming parts to deterministic ``part-<batch_id>-<i>`` names, then an
    applied-marker ``dst/_applied/<batch_id>`` is dropped LAST. A
    ``foreachBatch`` replay of an already-applied batch (at-least-once
    redelivery after a crash anywhere past the marker) is skipped
    outright; a crash mid-publish leaves no marker, so the replay
    re-stages and re-publishes over the SAME deterministic names —
    converging instead of double-appending. A crash between the shingle
    and band publishes is likewise healed on replay (both tables are
    fully staged before either is published, and publish order is
    bands-last so a probe never sees bands without their shingle sets).
    Without a ``batch_id`` a fresh uuid is used: still atomic, but a
    replay appends a second copy — streaming maintenance should always
    pass the foreachBatch epoch id.

    Uses the PORTABLE hash family so an index probed by a value-checked
    query stays oracle-checkable end-to-end.
    """
    import os

    from ..plans.layout import range_layout

    rows_per_band = num_hashes // bands
    sh_path = os.path.join(dst, "shingles")
    bands_path = os.path.join(dst, "bands")
    if append:
        import uuid

        bid = uuid.uuid4().hex[:12] if batch_id is None else str(batch_id)
        marker = os.path.join(dst, "_applied", bid)
        if os.path.exists(marker):
            return sh_path, bands_path
    sh = shingled(df, id_col, text_col, ngram).select(
        F.col(id_col).alias("old_id"), F.col("__shingles").alias("__sh_old")
    )
    if append:
        import shutil

        staging = os.path.join(dst, ".staging", bid)
        shutil.rmtree(staging, ignore_errors=True)  # partially-staged replay
        sh = sh.persist()  # one tokenization pass feeds both tables
        sh.repartition(files).write.mode("overwrite").parquet(
            os.path.join(staging, "shingles")
        )
        sh_src = sh
    else:
        range_layout(sh, sh_path, ["old_id"], files)
        # derive bands from the WRITTEN table: the raw corpus is scanned
        # exactly once however many downstream tables the index carries
        sh_src = df.sparkSession.read.parquet(sh_path)
    hashed = sh_src.select(
        F.col("old_id"), F.explode("__sh_old").alias("__s")
    ).select("old_id", portable_string_hash(F.col("__s")).alias("__H"))
    sig = hashed.groupBy("old_id").agg(
        *[
            F.min((F.lit(PORT_A[j]) * F.col("__H") + F.lit(PORT_B[j])) % PORT_P).alias(f"h{j}")
            for j in range(num_hashes)
        ]
    )

    def band_bucket(b: int) -> Column:
        acc = F.lit(0).cast("long")
        for j in range(b * rows_per_band, (b + 1) * rows_per_band):
            acc = (acc * PORT_BASE + F.col(f"h{j}")) % PORT_P
        return acc

    banded = sig.select(
        "old_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_bucket(b).alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("old_id", "bb.band", "bb.bucket")
    if append:
        banded.repartition(files).write.mode("overwrite").parquet(
            os.path.join(staging, "bands")
        )
        sh.unpersist()
        # both tables fully staged — publish (shingles first, bands last:
        # extra shingle rows are harmless to a concurrent probe, bands
        # without shingle sets would drop verified pairs), then marker
        for sub in ("shingles", "bands"):
            _publish_staged_parquet(
                os.path.join(staging, sub), os.path.join(dst, sub), bid
            )
        shutil.rmtree(os.path.join(dst, ".staging", bid), ignore_errors=True)
        os.makedirs(os.path.join(dst, "_applied"), exist_ok=True)
        with open(marker, "w"):
            pass
    else:
        range_layout(banded, bands_path, ["band", "bucket"], files)
    return sh_path, bands_path


def _publish_staged_parquet(staged_dir: str, live_dir: str, batch_id: str) -> None:
    """Move a staged parquet table's data files into ``live_dir`` under
    deterministic ``part-<batch_id>-<i>`` names. A replay republishing the
    same batch overwrites the same names (os.replace) and sweeps any
    higher-numbered residue from a previous partial publish, so the live
    directory converges to exactly one copy of the batch."""
    import os

    os.makedirs(live_dir, exist_ok=True)
    staged = sorted(
        f for f in os.listdir(staged_dir) if not f.startswith(("_", "."))
    )
    prefix = f"part-{batch_id}-"
    keep = set()
    for i, f in enumerate(staged):
        ext = ".parquet" if f.endswith(".parquet") else ""
        final = f"{prefix}{i:05d}{ext}"
        keep.add(final)
        os.replace(os.path.join(staged_dir, f), os.path.join(live_dir, final))
    for f in os.listdir(live_dir):
        if f.startswith(prefix) and f not in keep:
            os.remove(os.path.join(live_dir, f))


def compact_signature_index(
    spark, dst: str, target_mb: int = 256
) -> tuple[int, int]:
    """LSM-style maintenance pass over an incrementally-appended
    :func:`write_signature_index` directory: rewrite ``shingles`` and
    ``bands`` back into their byte-derived file counts, range-laid-out on
    their join keys — restoring the pruning the append path degrades (each
    appended batch adds files whose key ranges overlap history's).

    Returns ``(n_shingle_files, n_band_files)`` written. The swap is
    staged: both compacted tables are fully written under
    ``dst/.compact/`` before either live directory is replaced, and the
    replace itself is two renames (live → .old, compacted → live) with a
    sub-millisecond window — run compaction from the same single
    maintainer that owns appends (the foreachBatch loop's trigger,
    exactly where Delta/Iceberg run OPTIMIZE). ``_applied`` batch markers
    are preserved: an already-applied batch replayed AFTER compaction is
    still skipped — its rows are baked into the compacted files.

    Completes the index lifecycle: build → append → compact → probe.
    """
    import os
    import shutil

    from ..plans.layout import dir_bytes, range_layout, target_file_count

    keys = {"shingles": ["old_id"], "bands": ["band", "bucket"]}
    counts: dict[str, int] = {}
    staged: dict[str, str] = {}
    for sub, key_cols in keys.items():
        live = os.path.join(dst, sub)
        n = target_file_count(dir_bytes(live), target_mb)
        out = os.path.join(dst, ".compact", sub)
        shutil.rmtree(out, ignore_errors=True)
        # materialize the full current table, then lay it out fresh
        range_layout(spark.read.parquet(live), out, key_cols, n)
        counts[sub] = n
        staged[sub] = out
    for sub in keys:  # both staged — swap (bands last, matching publish order)
        live = os.path.join(dst, sub)
        old = live + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(live, old)
        os.rename(staged[sub], live)
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(os.path.join(dst, ".compact"), ignore_errors=True)
    return counts["shingles"], counts["bands"]


def read_signature_index(spark, dst: str) -> tuple[DataFrame, DataFrame]:
    """(shingle_sets, banded_buckets) of a :func:`write_signature_index`
    layout — plain parquet reads, so every probe plan gets pushdown and
    the tables never transit the driver."""
    import os

    return (
        spark.read.parquet(os.path.join(dst, "shingles")),
        spark.read.parquet(os.path.join(dst, "bands")),
    )


SIMHASH_PORT_BITS = 30  # < log2(PORT_P): every bit of the portable hash


def simhash_portable_signatures(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """SimHash over the portable char-fold hash (30-bit signature).

    Same explode→vote→assemble shape as :func:`simhash_signatures`, but
    every step reproduces in any SQL engine: per (doc, token) row one
    polynomial hash, per-bit ±1 votes via integer shifts, sign bits
    assembled into one BIGINT.
    """
    tok = fan_out(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t")
    ).select(id_col, portable_string_hash(F.col("__t")).alias("__h"))
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when((F.col("__h") / F.lit(2**b)).cast("long") % 2 == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(SIMHASH_PORT_BITS)
        ]
    )
    sig = F.lit(0).cast("long")
    for b in range(SIMHASH_PORT_BITS):
        sig = sig + F.when(F.col(f"b{b}") > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_portable_clusters(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Docs grouped by identical portable SimHash signature."""
    sigs = simhash_portable_signatures(df, id_col, text_col)
    return sigs.groupBy("simhash").agg(
        F.count("*").alias("n_docs"), F.min(id_col).alias("min_id")
    )
