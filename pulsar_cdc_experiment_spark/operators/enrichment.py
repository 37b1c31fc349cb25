"""CDC enrichment — the reference's Pulsar Function re-expressed as one select.

The reference enriches each CDC event in a per-message Python function
(reference functions/cdc-enrichment/cdc_enrichment_function.py:19-107):
parse → wrap in {original, enrichment} envelope → op decode → timestamps →
source metadata → data-quality flags → email insights → lineage metadata →
serialize, with an error path that forwards malformed input verbatim
(lines 104-107).

Here the whole thing is a single shuffle-free columnar projection built from
``pyspark.sql.functions`` expressions, so it runs inside whole-stage codegen
at full scan speed (the reference runs interpreted CPython one message at a
time, including ``json.dumps(indent=2)`` in the hot path, line 99).

Semantic fidelity notes (each maps to a reference line):
- op label map c/u/d/r → CREATE/UPDATE/DELETE/READ else UNKNOWN (lines 34-46).
- is_mutation = op ∈ {c,u,d} (line 45).
- event_time_iso = datetime.fromtimestamp(ts_ms/1000).isoformat(): Python
  isoformat OMITS the fractional part when microsecond == 0 — replicated
  with a conditional format (lines 49-53).
- source.snapshot is compared as the STRING "true" (line 66).
- email_domain = email.split("@")[1] — the SECOND split part, not the last;
  guarded by '@' containment (lines 80-85).
- field_count: the reference counts JSON keys of ``after``; with a typed
  schema every key always exists, so we count NON-NULL fields — identical
  on well-formed events, documented delta on sparse ones (SURVEY.md §7).
- On unparseable input the ORIGINAL bytes pass through unmodified — no DLQ,
  no drop (lines 104-107); see :func:`enrich_json_or_passthrough`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import CORRUPT_COL, CUSTOMERS_ROW, envelope_schema_corrupt

# Default lineage literals (the reference reads these from the function
# context, cdc_enrichment_function.py:89-96; in Spark they are plan-level
# constants plus source metadata columns).
FUNCTION_NAME = "cdc-enrichment"
FUNCTION_VERSION = "1.0.0"

OP_LABELS = {"c": "CREATE", "u": "UPDATE", "d": "DELETE", "r": "READ"}


def op_label(op: Column) -> Column:
    """Dictionary-decode op code → label, UNKNOWN fallback (A5)."""
    expr = F.lit("UNKNOWN")
    for code, label in reversed(list(OP_LABELS.items())):
        expr = F.when(op == code, label).otherwise(expr)
    return expr


def is_mutation(op: Column) -> Column:
    """op ∈ {c,u,d} (A6)."""
    return op.isin("c", "u", "d")


def iso_from_millis(ts_ms: Column) -> Column:
    """Python ``datetime.fromtimestamp(ms/1000).isoformat()`` equivalent (A7).

    isoformat drops the fraction entirely when microsecond == 0; otherwise it
    prints exactly 6 fractional digits (epoch millis → micros end in 000).

    Rendered from TIMESTAMP_NTZ so the string is the UTC instant on EVERY
    driver (``timestamp_millis`` + ``date_format`` would render in the
    session timezone — the round-2 latent hazard; see functions/time.py).
    """
    from ..functions.time import ntz_from_millis

    ts = ntz_from_millis(ts_ms)
    return F.when(
        ts_ms % 1000 == 0, F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
    ).otherwise(F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))


def email_domain(email: Column) -> Column:
    """``email.split('@')[1] if '@' in email else None`` (A13)."""
    return F.when(email.contains("@"), F.split(email, "@").getItem(1))


def non_null_field_count(struct_col: Column, field_names: list[str]) -> Column:
    """Count of non-null fields of a typed struct (A12; see module docstring)."""
    flags = [
        F.when(struct_col.getField(f).isNotNull(), 1).otherwise(0)
        for f in field_names
    ]
    out = F.lit(0)
    for flag in flags:
        out = out + flag
    return out


def enrichment_struct(
    df_cols,
    row_fields: list[str],
    function_name: str = FUNCTION_NAME,
    function_version: str = FUNCTION_VERSION,
    topic: str | Column = "persistent://public/default/dbserver1.public.customers",
    partition_id: str | Column = "0",
    message_id: str | Column | None = None,
) -> Column:
    """Build the ``enrichment`` struct from envelope columns.

    ``df_cols`` is a callable column resolver (usually ``F.col``) so the same
    expression tree works on top-level envelope columns or nested ones.

    Lineage values (``topic``/``partition_id``/``message_id``) accept either
    literals (file/test feeds) or COLUMNS — message-bus sources pass their
    per-record metadata columns (Kafka topic/partition/offset,
    sources/kafka.py), matching the reference's per-message context lookups
    (cdc_enrichment_function.py:89-96).
    """

    def as_col(v):
        if v is None:
            return F.lit(None).cast("string")
        return F.lit(v) if isinstance(v, str) else v.cast("string")
    c = df_cols
    # The reference defaults a missing op to the CODE "unknown" before
    # decoding (message.get("op", "unknown"), cdc_enrichment_function.py:35):
    # op-less messages are VALID and enriched, with operation.code="unknown",
    # label=UNKNOWN, is_mutation=false.
    op = F.coalesce(c("op"), F.lit("unknown"))
    after = c("after")
    email = after.getField("email")
    has_after = after.isNotNull()
    field_count = F.when(
        has_after, non_null_field_count(after, row_fields)
    ).otherwise(F.lit(0))

    return F.struct(
        F.struct(
            op.alias("code"),
            op_label(op).alias("label"),
            is_mutation(op).alias("is_mutation"),
        ).alias("operation"),
        F.struct(
            c("ts_ms").alias("event_time_ms"),
            iso_from_millis(c("ts_ms")).alias("event_time_iso"),
            # Processing-time capture (A8). Non-deterministic by nature.
            F.date_format(
                F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
            ).alias("processing_time_iso"),
        ).alias("timestamps"),
        F.struct(
            c("source").getField("db").alias("database"),
            c("source").getField("schema").alias("schema"),
            c("source").getField("table").alias("table"),
            c("source").getField("connector").alias("connector"),
            c("source").getField("version").alias("version"),
            (c("source").getField("snapshot") == F.lit("true")).alias("is_snapshot"),
        ).alias("source_metadata"),
        F.struct(
            c("before").isNotNull().alias("has_before"),
            has_after.alias("has_after"),
            field_count.alias("field_count"),
            (has_after & (field_count > 0)).alias("is_complete"),
        ).alias("data_quality"),
        F.struct(
            email_domain(email).alias("email_domain"),
            (email.isNotNull() & (F.length(email) > 0)).alias("has_email"),
            F.when(email.isNotNull(), F.length(email)).alias("email_length"),
        ).alias("customer_insights"),
        F.struct(
            F.lit(function_name).alias("function_name"),
            F.lit(function_version).alias("function_version"),
            # In Pulsar these come from the function context; in Spark the
            # natural analogs are source metadata columns (Kafka
            # topic/partition/offset via sources/kafka.py).
            as_col(message_id).alias("message_id"),
            as_col(topic).alias("topic"),
            as_col(partition_id).alias("partition_id"),
        ).alias("processing_metadata"),
    )


def enrich(
    df: DataFrame,
    row_fields: list[str] | None = None,
    **lineage,
) -> DataFrame:
    """Envelope DataFrame → {original, enrichment} DataFrame (A4-A15).

    Stateless and shuffle-free: exactly mirrors the reference's per-message
    map but columnar. Works on batch and streaming DataFrames.
    """
    if row_fields is None:
        row_fields = [f.name for f in CUSTOMERS_ROW.fields]
    # Engine-internal columns (_raw, _corrupt) are plumbing, not payload —
    # the reference's "original" is exactly the parsed message.
    payload_cols = [n for n in df.columns if not n.startswith("_")]
    return df.select(
        F.struct(*[F.col(n) for n in payload_cols]).alias("original"),
        enrichment_struct(F.col, row_fields, **lineage).alias("enrichment"),
    )


def enrich_json_or_passthrough(
    raw_df: DataFrame,
    value_col: str = "value",
    row_schema=CUSTOMERS_ROW,
    **lineage,
) -> DataFrame:
    """Raw JSON bytes/strings → enriched JSON, malformed input passed through.

    Replicates the reference's never-drop error path
    (cdc_enrichment_function.py:104-107): if the payload does not parse as a
    CDC envelope, emit the ORIGINAL payload unmodified. Output column:
    ``value`` (JSON string).

    ``from_json`` in PERMISSIVE mode yields an ALL-NULL struct for corrupt
    input (and a NULL struct for empty input), so parse failure is detected
    via the corrupt-record column — NOT via a null ``op``: a valid JSON
    object without ``op`` is enriched by the reference (op → "unknown",
    label UNKNOWN, cdc_enrichment_function.py:35), and only genuinely
    unparseable payloads (non-JSON, or JSON non-objects, which raise
    AttributeError on .get there) pass through verbatim. Structs are
    serialized with ``to_json`` only here at the edge (SURVEY.md §4).

    Plan shape: the parse is materialized in its OWN projection before the
    enrichment projection. The enrichment expression references the
    envelope ~30 times; inlined, Catalyst would run ``from_json`` once per
    reference (measured ~20x slower end-to-end at sf0.1).
    """
    schema = envelope_schema_corrupt(row_schema)
    row_fields = [f.name for f in row_schema.fields]

    parsed_df = raw_df.select(
        F.col(value_col).cast("string").alias("__raw"),
        F.from_json(
            F.col(value_col).cast("string"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("__env"),
    )
    env = F.col("__env")

    def resolver(name: str) -> Column:
        return env.getField(name)

    # original = the parsed envelope WITHOUT the engine's corrupt marker.
    original = F.struct(
        *[
            env.getField(f.name).alias(f.name)
            for f in schema.fields
            if f.name != CORRUPT_COL
        ]
    )
    enriched = F.to_json(
        F.struct(
            original.alias("original"),
            enrichment_struct(resolver, row_fields, **lineage).alias("enrichment"),
        )
    )
    # Parsed ⇔ the payload was a JSON object: corrupt marker null and the
    # envelope struct itself non-null (empty input parses to a NULL struct).
    ok = env.isNotNull() & env.getField(CORRUPT_COL).isNull()
    return parsed_df.select(
        F.when(ok, enriched).otherwise(F.col("__raw")).alias("value")
    )
