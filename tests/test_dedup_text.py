"""Tests for dedup + text-analysis operators (SURVEY.md §2 C28, C40-C41)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsar_cdc_experiment_spark.operators import dedup as D
from pulsar_cdc_experiment_spark.operators import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "a"),
            (2, "the quick brown fox jumps over the lazy dog", "a"),  # exact dup
            (3, "the quick brown fox leaps over the lazy dog", "a"),  # near dup
            (4, "completely different content about spark engines", "a"),
            (5, "tiny", "b"),
            (6, "Punctuation, CASE and   spacing!  normalize; right?", "b"),
        ],
        ["doc_id", "text", "src"],
    )


def test_tokenize_normalizes(spark, docs):
    row = docs.filter("doc_id = 6").select(
        TX.tokens(F.col("text")).alias("t")
    ).first()
    assert row["t"] == ["punctuation", "case", "and", "spacing", "normalize", "right"]


def test_exact_dedup(spark, docs):
    out = D.exact_dedup(docs, "text", "doc_id")
    rows = {r["doc_id"]: r["n_copies"] for r in out.collect()}
    assert rows[1] == 2  # doc 2 collapsed into doc 1
    assert 2 not in rows and rows[3] == 1


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", "src", n=3, threshold=0.4)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0  # exact dup
    assert 0.4 <= got[(1, 3)] < 1.0  # one-word-changed near dup
    assert (1, 4) not in got and (5, 6) not in got


def test_minhash_agrees_with_exact_jaccard(spark, docs):
    near = D.minhash_near_dups(docs, "doc_id", "text", threshold=0.4)
    got = {(r["id_a"], r["id_b"]) for r in near.collect()}
    # LSH with 8 bands of 4 rows catches J=1.0 always and J≈0.5 with high
    # probability; the exact-dup pair must always survive.
    assert (1, 2) in got
    assert (1, 4) not in got


def test_simhash_exact_dups_share_signature(spark, docs):
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in D.simhash_signatures(docs, "doc_id", "text").collect()
    }
    assert sigs[1] == sigs[2]
    # hamming distance of near-dup < distant doc
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(sigs[1], sigs[3]) < ham(sigs[1], sigs[4])


def test_lang_predict_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "der Hund und die Katze und der Vogel"),
            (3, "le chat et le chien et les oiseaux"),
            (4, "el perro y el gato y los pajaros"),
            (5, "xyzzy plugh abracadabra"),
        ],
        ["id", "text"],
    )
    got = {
        r["id"]: r["p"]
        for r in df.select("id", TX.lang_predict(F.col("text")).alias("p")).collect()
    }
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "unknown"}


def test_quality_score_monotonic(spark):
    df = spark.createDataFrame(
        [
            (1, "the engine processes data and the pipeline scales for the cluster work load today"),
            (2, "!!! ??? ### 123 456 789 !!!"),
        ],
        ["id", "text"],
    )
    got = {
        r["id"]: r["q"]
        for r in df.select("id", TX.quality_score(F.col("text")).alias("q")).collect()
    }
    assert got[1] > got[2]
    assert 0.0 <= got[2] < got[1] <= 1.0


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        ["id", "text"],
    )
    got = {
        r["id"]: r["fp"]
        for r in df.select(
            "id", TX.token_fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    assert got[1] == got[3]
    assert got[1] != got[2]


def test_connected_components_clusters(spark):
    from pulsar_cdc_experiment_spark.operators.components import (
        connected_components,
        dedup_survivors,
    )

    nodes = spark.createDataFrame([(i,) for i in range(1, 9)], ["id"])
    # chain 1-2-3, pair 4-5, isolated 6,7,8
    edges = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], ["id_a", "id_b"])
    comp = {
        r["id"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 7, 8: 8}
    surv = dedup_survivors(nodes, edges, "id")
    survivors = {r["id"] for r in surv.filter("is_survivor").collect()}
    assert survivors == {1, 4, 6, 7, 8}


def test_connected_components_long_chain(spark):
    """Diameter > a few hops: the fixpoint loop must keep iterating."""
    from pulsar_cdc_experiment_spark.operators.components import connected_components

    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"])
    comp = {r["id"]: r["component"] for r in connected_components(nodes, edges).collect()}
    assert set(comp.values()) == {0}


def test_lsh_hot_bucket_guard(spark):
    """A planted degenerate bucket (many identical docs) is excluded from
    candidate generation by max_bucket_size, while normal near-dup pairs
    elsewhere still surface; the drop metric reports the hot buckets
    (round-1 verdict #6: one pathological bucket is still quadratic)."""
    from pulsar_cdc_experiment_spark.operators.dedup import (
        lsh_oversized_buckets,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod"
    rows = [(i, boiler) for i in range(40)]  # the hot bucket: 40 clones
    rows += [
        (100, "the quick brown fox jumps over the lazy dog near the river bank"),
        (101, "the quick brown fox jumps over the lazy dog near the river bend"),
        (102, "completely different text about spark catalyst optimizer internals"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    uncapped = minhash_lsh_candidates(df, "doc_id", "text", ngram=3)
    clones = uncapped.filter((F.col("id_a") < 100) & (F.col("id_b") < 100))
    assert clones.count() == 40 * 39 // 2  # quadratic blow-up, unguarded

    capped = minhash_lsh_candidates(
        df, "doc_id", "text", ngram=3, max_bucket_size=10
    )
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in got            # normal near-dups survive the guard
    assert not any(a < 100 and b < 100 for a, b in got)  # hot bucket dropped

    sig = minhash_signatures(df, "doc_id", "text", 32, 3)
    dropped = lsh_oversized_buckets(sig, "doc_id", 32, 8, max_bucket_size=10)
    metric = dropped.collect()
    assert len(metric) == 8             # clones collide in every band
    assert all(r["n_docs"] == 40 for r in metric)


def test_signature_index_write_probe_and_append(spark, sf_dir):
    """write_signature_index is the persisted corpus face of the MinHash
    path: probing the on-disk index finds the same near-dup pairs as the
    all-in-one portable_minhash_near_dups, and an incremental append
    batch becomes probe-able without re-hashing the original corpus."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.operators import dedup as D
    from pulsar_cdc_experiment_spark.sources.tables import table

    docs = table(spark, sf_dir, "documents").limit(200)
    first = docs.filter(F.col("doc_id") % 5 != 0)
    extra = docs.filter(F.col("doc_id") % 5 == 0)

    idx = tempfile.mkdtemp(prefix="sig_idx_")
    D.write_signature_index(first, idx)
    sh, banded = D.read_signature_index(spark, idx)
    assert sh.count() == first.count()
    assert banded.count() == first.count() * 4  # one row per band

    # probing the index reproduces the monolithic operator's pairs
    expect = {
        (r["id_a"], r["id_b"])
        for r in D.portable_minhash_near_dups(first, "doc_id", "text").collect()
    }
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.old_id") < F.col("b.old_id")),
        )
        .select(F.col("a.old_id").alias("id_a"), F.col("b.old_id").alias("id_b"))
        .distinct()
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in cands.join(
            sh.select(F.col("old_id").alias("id_a"), F.col("__sh_old").alias("__sh_a")), "id_a"
        )
        .join(
            sh.select(F.col("old_id").alias("id_b"), F.col("__sh_old").alias("__sh_b")), "id_b"
        )
        .filter(D.jaccard(F.col("__sh_a"), F.col("__sh_b")) >= 0.15)
        .select("id_a", "id_b")
        .collect()
    }
    assert got == expect

    # incremental append: new docs land in the same index, old files untouched
    files_before = set(os.listdir(os.path.join(idx, "shingles")))
    D.write_signature_index(extra, idx, append=True)
    sh2, banded2 = D.read_signature_index(spark, idx)
    assert sh2.count() == docs.count()
    assert banded2.count() == docs.count() * 4
    assert files_before <= set(os.listdir(os.path.join(idx, "shingles")))
    # appended ids are probe-able alongside the originals
    appended_ids = {r["doc_id"] for r in extra.select("doc_id").collect()}
    indexed = {r["old_id"] for r in sh2.select("old_id").collect()}
    assert appended_ids <= indexed


def test_signature_index_streaming_maintenance(spark, sf_dir):
    """The out-of-band index maintenance loop claimed in SCALE.md: a
    document stream appends each micro-batch's signatures to the
    persisted index via foreachBatch, and after the run the index covers
    exactly the streamed corpus — no re-hash of earlier batches, no
    broadcast state. Restart safety is the SINK's job, not the
    checkpoint's (a checkpoint cannot un-run a partially-applied
    foreachBatch): the epoch id is passed as write_signature_index's
    batch_id, so an at-least-once redelivery skips the already-applied
    batch (see test_signature_index_append_replay_is_idempotent)."""
    import os
    import tempfile

    from pulsar_cdc_experiment_spark.operators import dedup as D
    from pulsar_cdc_experiment_spark.schemas import DOCUMENTS

    docs_dir = tempfile.mkdtemp(prefix="sig_stream_")
    link = os.path.join(docs_dir, "documents.parquet")
    os.symlink(os.path.join(sf_dir, "documents.parquet"), link)
    idx = tempfile.mkdtemp(prefix="sig_idx_stream_")
    ckpt = tempfile.mkdtemp(prefix="sig_ckpt_")

    stream = spark.readStream.schema(DOCUMENTS).parquet(docs_dir)

    def upsert(batch_df, batch_id):
        D.write_signature_index(batch_df, idx, append=True, batch_id=batch_id)

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    sh, banded = D.read_signature_index(spark, idx)
    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    assert sh.count() == n_docs
    assert banded.count() == n_docs * 4


def test_signature_index_append_replay_is_idempotent(spark, sf_dir):
    """The round-5 advisor's at-least-once hazard: a foreachBatch replay
    (redelivery after a crash between the batch's writes and the
    checkpoint commit) must not double-append a batch's signature rows.
    Replaying the same batch_id is a no-op; a DIFFERENT batch id still
    appends; and no staging residue survives a publish."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.operators import dedup as D
    from pulsar_cdc_experiment_spark.sources.tables import table

    docs = table(spark, sf_dir, "documents").limit(120)
    base = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)

    idx = tempfile.mkdtemp(prefix="sig_idx_replay_")
    D.write_signature_index(base, idx)
    D.write_signature_index(batch, idx, append=True, batch_id=7)
    sh1, banded1 = D.read_signature_index(spark, idx)
    n_sh, n_banded = sh1.count(), banded1.count()
    assert n_sh == docs.count()

    # replay of the SAME epoch: applied-marker short-circuits, rows stable
    D.write_signature_index(batch, idx, append=True, batch_id=7)
    sh2, banded2 = D.read_signature_index(spark, idx)
    assert (sh2.count(), banded2.count()) == (n_sh, n_banded)
    # probe sees each pair once — no duplicate old_id rows
    assert sh2.groupBy("old_id").count().filter(F.col("count") > 1).count() == 0

    # a new epoch still appends; staging is cleaned up either way
    D.write_signature_index(batch.limit(5), idx, append=True, batch_id=8)
    assert D.read_signature_index(spark, idx)[0].count() == n_sh + 5
    staging = os.path.join(idx, ".staging")
    assert not os.path.isdir(staging) or os.listdir(staging) == []
    assert sorted(os.listdir(os.path.join(idx, "_applied"))) == ["7", "8"]


def _probe_pairs(spark, idx, threshold=0.15):
    from pulsar_cdc_experiment_spark.operators import dedup as D

    sh, banded = D.read_signature_index(spark, idx)
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.old_id") < F.col("b.old_id")),
        )
        .select(F.col("a.old_id").alias("id_a"), F.col("b.old_id").alias("id_b"))
        .distinct()
    )
    return {
        (r["id_a"], r["id_b"])
        for r in cands.join(
            sh.select(F.col("old_id").alias("id_a"), F.col("__sh_old").alias("__sh_a")), "id_a"
        )
        .join(
            sh.select(F.col("old_id").alias("id_b"), F.col("__sh_old").alias("__sh_b")), "id_b"
        )
        .filter(D.jaccard(F.col("__sh_a"), F.col("__sh_b")) >= threshold)
        .select("id_a", "id_b")
        .collect()
    }


def test_signature_index_compaction_preserves_probes(spark, sf_dir):
    """The last gap in the 100 TB dedup story (round-5 verdict task 3):
    appends accumulate small overlapping files; compact_signature_index
    rewrites both tables back to their byte-derived file counts WITHOUT
    changing a single probe result — build → append → compact → probe is
    the complete index lifecycle. Applied-batch markers survive, so a
    replay of a pre-compaction batch stays a no-op afterwards."""
    import glob
    import os
    import tempfile

    from pulsar_cdc_experiment_spark.operators import dedup as D
    from pulsar_cdc_experiment_spark.sources.tables import table

    docs = table(spark, sf_dir, "documents").limit(150)
    base = docs.filter(F.col("doc_id") % 4 == 0)
    idx = tempfile.mkdtemp(prefix="sig_idx_compact_")
    D.write_signature_index(base, idx)
    for m in (1, 2, 3):  # three append batches -> 3*files extra files each
        D.write_signature_index(
            docs.filter(F.col("doc_id") % 4 == m), idx, append=True, batch_id=m
        )

    def n_files(sub):
        return len(glob.glob(os.path.join(idx, sub, "part-*")))

    files_before = n_files("shingles") + n_files("bands")
    pairs_before = _probe_pairs(spark, idx)
    n_sh_before = D.read_signature_index(spark, idx)[0].count()

    n_sh_files, n_band_files = D.compact_signature_index(spark, idx)
    files_after = n_files("shingles") + n_files("bands")
    assert (n_files("shingles"), n_files("bands")) == (n_sh_files, n_band_files)
    assert files_after < files_before  # tiny tables -> 1 file each
    assert n_files("shingles") == 1 and n_files("bands") == 1

    # pair-for-pair identical probes; row counts unchanged
    assert _probe_pairs(spark, idx) == pairs_before
    assert D.read_signature_index(spark, idx)[0].count() == n_sh_before
    # no staging/compaction residue
    assert not os.path.isdir(os.path.join(idx, ".compact"))
    assert not os.path.isdir(os.path.join(idx, "shingles.old"))

    # an already-applied batch replayed AFTER compaction is still skipped
    D.write_signature_index(
        docs.filter(F.col("doc_id") % 4 == 1), idx, append=True, batch_id=1
    )
    assert D.read_signature_index(spark, idx)[0].count() == n_sh_before
    assert _probe_pairs(spark, idx) == pairs_before


def test_corpus_chunk_tokens_covers_every_token(spark):
    """Chunk grid property check on adversarial lengths (1, 39, 40, 41,
    95, 100 tokens — 95 is the n-k-not-a-stride-multiple case whose tail
    a naive stride grid drops): every token position is covered by at
    least one chunk, no chunk exceeds k, starts are the stride grid plus
    the appended last valid start, and short docs yield exactly one
    chunk."""
    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.operators import text as TX

    k, stride = 40, 30
    rows = [(n, " ".join(f"w{i}" for i in range(1, n + 1))) for n in (1, 39, 40, 41, 95, 100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    t = docs.select("doc_id", TX.tokens(F.col("text")).alias("toks")).withColumn(
        "n", F.size("toks").cast("long")
    )
    last_start = F.greatest(F.lit(1).cast("long"), F.col("n") - k + 1)
    starts = F.array_distinct(
        F.concat(
            F.sequence(F.lit(1).cast("long"), last_start, F.lit(stride).cast("long")),
            F.array(last_start),
        )
    )
    out = t.select(
        "doc_id", "n", "toks", F.explode(starts).alias("s")
    ).select(
        "doc_id", "n", "s",
        F.size(F.slice(F.col("toks"), F.col("s").cast("int"), k)).alias("len"),
    ).collect()

    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for n, chunks in ((r[0], by_doc[r[0]]) for r in rows):
        covered = set()
        for c in chunks:
            assert c["len"] <= k
            covered.update(range(c["s"], c["s"] + c["len"]))
        assert covered == set(range(1, n + 1)), (n, sorted(covered))
        ss = sorted(c["s"] for c in chunks)
        assert len(ss) == len(set(ss))
        if n <= k:
            assert ss == [1]
        else:
            assert ss[-1] == n - k + 1  # tail start always present
            assert all(b - a <= stride for a, b in zip(ss, ss[1:]))


def test_corpus_dedup_segments_properties(spark, sf_dir):
    """Properties the oracle match alone doesn't surface: (a) the pass is
    non-vacuous (duplicate segments exist and are dropped), (b) the kept
    segments are exactly the distinct segments of the corpus (nothing
    lost, nothing duplicated), (c) a document whose segments are all
    first occurrences round-trips byte-identically, (d) every clean_text
    re-splits into exactly its kept segments — reconstruction preserves
    order and content."""
    from pyspark.sql import functions as F

    from pulsar_cdc_experiment_spark.registry import (
        QUERIES,
        load_all_query_modules,
    )
    from pulsar_cdc_experiment_spark.queries.llm_ops import _SEG_W
    from pulsar_cdc_experiment_spark.sources.tables import table

    load_all_query_modules()
    out = QUERIES["corpus_dedup_segments"](spark, sf_dir).persist()
    docs = table(spark, sf_dir, "documents")

    totals = out.agg(
        F.sum("n_segs").alias("segs"), F.sum("n_kept").alias("kept")
    ).collect()[0]
    assert totals["kept"] < totals["segs"]  # (a) duplicates were dropped

    # (b) kept count == corpus-wide distinct segment count
    w = docs.select("doc_id", F.split("text", " ").alias("w"))
    segs = w.select(
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("w") / F.lit(float(_SEG_W))).cast("int") - 1,
                ),
                lambda i: F.array_join(
                    F.slice("w", i * _SEG_W + 1, _SEG_W), " "
                ),
            )
        ).alias("seg")
    )
    assert totals["kept"] == segs.distinct().count()

    # (c) untouched docs round-trip byte-identically
    untouched = out.filter(F.col("n_kept") == F.col("n_segs")).join(
        docs, "doc_id"
    )
    assert untouched.count() > 0
    assert untouched.filter(
        F.col("clean_text") != F.col("text")
    ).count() == 0

    # (d) re-splitting clean_text yields n_kept segments for every doc
    # (empty docs: split('')=[''] -> guard with the n_kept=0 case)
    resplit = out.withColumn(
        "n_resplit",
        F.when(F.col("clean_text") == "", F.lit(0)).otherwise(
            F.ceil(
                F.size(F.split("clean_text", " ")) / F.lit(float(_SEG_W))
            ).cast("long")
        ),
    )
    # a rebuilt doc's segments need not re-align to the 5-word grid
    # (dropped middle segments shift later words), so compare against
    # the WORD count instead: kept segments contribute their exact words
    kept_words = out.filter(F.col("clean_text") != "").select(
        "doc_id",
        F.size(F.split("clean_text", " ")).alias("n_words_clean"),
    )
    orig_last = (
        w.select(
            "doc_id",
            F.size("w").alias("n_words"),
            F.ceil(F.size("w") / F.lit(float(_SEG_W)))
            .cast("long")
            .alias("n_segs"),
        )
    )
    j = kept_words.join(orig_last, "doc_id").join(
        out.select("doc_id", "n_kept"), "doc_id"
    )
    # every kept full segment has _SEG_W words; only the doc's LAST
    # segment may be shorter. So n_words_clean is between
    # (n_kept-1)*W + 1 and n_kept*W, and equals n_words when nothing
    # was dropped.
    bad = j.filter(
        (F.col("n_words_clean") > F.col("n_kept") * _SEG_W)
        | (F.col("n_words_clean") < (F.col("n_kept") - 1) * _SEG_W + 1)
    )
    assert bad.count() == 0
    out.unpersist()


def test_leakage_safe_split_keeps_near_dups_on_one_side(spark, sf_dir):
    """The split's defining property, asserted directly: every
    shingle-Jaccard near-dup pair lands in the SAME split (no train/val
    leakage), the cluster id is the min doc id of the component, and
    the three splits roughly follow the 8/1/1 hash allocation."""
    from pulsar_cdc_experiment_spark.registry import (
        QUERIES,
        load_all_query_modules,
    )
    from pulsar_cdc_experiment_spark.sources.tables import table

    load_all_query_modules()
    out = QUERIES["corpus_split_leakage_safe"](spark, sf_dir)
    rows = {r["doc_id"]: (r["component"], r["split"]) for r in out.collect()}
    docs = table(spark, sf_dir, "documents")
    assert len(rows) == docs.count()  # every doc assigned exactly once

    pairs = D.ngram_jaccard_pairs(
        docs, "doc_id", "text", "source", n=3, threshold=0.15
    ).collect()
    assert pairs, "fixture produced no near-dup pairs; property untested"
    for p in pairs:
        ca, sa = rows[p["id_a"]]
        cb, sb = rows[p["id_b"]]
        assert sa == sb, (p, sa, sb)  # the leakage guarantee
        assert ca == cb  # same component
        assert ca <= min(p["id_a"], p["id_b"])  # min-label component id
    by_split = {}
    for _c, s in rows.values():
        by_split[s] = by_split.get(s, 0) + 1
    assert by_split.get("train", 0) > by_split.get("val", 0)
    assert by_split.get("train", 0) > by_split.get("test", 0)
