"""Scalar function library queries (SURVEY.md §2 C19-C25).

Every function pair here was chosen so Spark and DuckDB have exactly
equivalent semantics (documented per query where the equivalence is
non-obvious: 0- vs 1-based array indexing, dayofweek epoch, HUGEINT sums).
All expressions are JVM-built-ins — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.rounding import rn
from ..registry import register
from ..sources.tables import table


@register(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_type) AS type_upper,
           CAST(length(p_name) AS INTEGER) AS name_len,
           concat_ws('|', p_brand, p_type) AS brand_type,
           regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
           trim('  ' || p_name || ' ') AS name_trimmed,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           string_split(p_name, ' ')[1] AS first_word,
           replace(p_name, ' ', '_') AS name_snake,
           reverse(p_brand) AS brand_rev,
           CAST(strpos(p_name, 'widget') AS INTEGER) AS widget_pos,
           substr(p_type, 1, 3) AS type_prefix
    FROM part
    """,
)
def string_functions(spark, sf_dir):
    """C19: string functions. Spark split is 0-indexed, DuckDB lists 1-indexed."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_type").alias("type_upper"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr("p_name", "widget").alias("widget_pos"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
    )


@register(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(dayofmonth(o_orderdate) AS INTEGER) AS order_day,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-12-31') AS BIGINT) AS days_to_eoy,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(o_orderdate AS DATE) AS order_date,
           (o_orderdate + INTERVAL 30 DAY)::DATE AS due_date,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter
    FROM orders
    """,
)
def date_functions(spark, sf_dir):
    """C20: date/time functions, UTC session; both engines truncate ts→date."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        # DuckDB date_trunc('month') yields DATE; align both sides on DATE
        F.to_date(F.date_trunc("month", d)).alias("month_start"),
        F.datediff(F.lit("1998-12-31"), d).cast("long").alias("days_to_eoy"),
        F.date_format(d, "yyyy-MM").alias("ym"),
        F.to_date(d).alias("order_date"),
        F.date_add(F.to_date(d), 30).alias("due_date"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).alias("order_quarter"),
    )


@register(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((abs(l_discount - 0.05)) * 10000 + 0.5) / 10000 AS abs_disc_delta,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           floor((pow(l_quantity, 2)) * 100 + 0.5) / 100 AS qty_sq,
           floor((sqrt(l_extendedprice)) * 10000 + 0.5) / 10000 AS price_sqrt,
           CAST(sign(l_extendedprice - 30000) AS DOUBLE) AS price_sign,
           CAST(((l_orderkey % 7) + 7) % 7 AS BIGINT) AS key_mod7,
           floor((exp(l_discount)) * 1000000 + 0.5) / 1000000 AS disc_exp,
           floor((ln(l_extendedprice)) * 1000000 + 0.5) / 1000000 AS price_ln
    FROM lineitem
    """,
)
def math_functions(spark, sf_dir):
    """C21: math functions; pmod expressed as ((x%7)+7)%7 in the oracle."""
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rn(F.abs(F.col("l_discount") - 0.05), 4).alias("abs_disc_delta"),
        F.floor(price).alias("price_floor"),
        F.ceil(price).alias("price_ceil"),
        rn(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        rn(F.sqrt(price), 4).alias("price_sqrt"),
        F.signum(price - 30000).alias("price_sign"),
        F.pmod("l_orderkey", F.lit(7)).cast("long").alias("key_mod7"),
        rn(F.exp("l_discount"), 6).alias("disc_exp"),
        rn(F.log(price), 6).alias("price_ln"),
    )


@register(
    "array_functions",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           list_sort(string_split(text, ' '))[1] AS first_sorted,
           array_to_string(string_split(text, ' ')[1:3], '-') AS first3,
           CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_tokens
    FROM documents
    """,
)
def array_functions(spark, sf_dir):
    """C23: array functions over tokenized text (scalar outputs only —
    raw array columns would hash differently across engines)."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.sort_array(toks).getItem(0).alias("first_sorted"),
        F.concat_ws("-", F.slice(toks, 1, 3)).alias("first3"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


@register(
    "map_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           map_extract(map(['qty', 'disc'], [l_quantity, l_discount]), 'qty')[1] AS qty_val,
           CAST(cardinality(map(['qty', 'disc'], [l_quantity, l_discount])) AS INTEGER) AS n_keys,
           array_to_string(map_keys(map(['qty', 'disc'], [l_quantity, l_discount])), ',') AS keys_csv
    FROM lineitem
    """,
)
def map_functions(spark, sf_dir):
    """C24: map construction/access. DuckDB map_extract returns a list —
    hence the [1]; both engines preserve insertion order of keys."""
    li = table(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"), F.lit("disc"), F.col("l_discount")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(m, "qty").alias("qty_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.concat_ws(",", F.map_keys(m)).alias("keys_csv"),
    )


@register(
    "json_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod10,
           json_extract(props, '$.missing') IS NULL AS missing_is_null
    FROM events
    """,
)
def json_functions(spark, sf_dir):
    """C25: JSON probing of the schemaless props column — the batch face of
    the reference's schemaless ``.get()`` probing (cdc_enrichment_function
    .py:35-81); from_json with explicit schema is the typed path."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("k_value"),
        (k % 10).alias("k_mod10"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
    )


@register(
    "json_typed_parse",
    oracle="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed
    FROM events
    """,
)
def json_typed_parse(spark, sf_dir):
    """C25/A3: from_json with explicit schema (PERMISSIVE) → typed struct."""
    ev = table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return ev.select("event_id", parsed.getField("k").alias("k_typed"))


@register(
    "content_digests",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex,
           to_base64(CAST(substr(text, 1, 12) AS BLOB)) AS prefix_b64,
           hex(substr(text, 1, 4)) AS prefix_hex
    FROM documents
    """,
)
def content_digests(spark, sf_dir):
    """C19/C28-adjacent: content digests — the primitive behind
    digest-based exact dedup at scale (shuffle 16-32 bytes, not documents).
    md5/sha256 are standardized, so the oracle matches byte-for-byte."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2("text", 256).alias("sha256_hex"),
        F.base64(F.encode(F.substring("text", 1, 12), "UTF-8")).alias("prefix_b64"),
        F.hex(F.substring("text", 1, 4)).alias("prefix_hex"),
    )


@register(
    "math_bitwise_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey & 255 AS BIGINT) AS key_and,
           CAST(l_orderkey | 8 AS BIGINT) AS key_or,
           CAST(xor(l_orderkey, l_linenumber) AS BIGINT) AS key_xor,
           CAST(l_linenumber << 3 AS BIGINT) AS line_shl,
           CAST(l_orderkey >> 2 AS BIGINT) AS key_shr,
           floor((sin(l_discount)) * 1000000 + 0.5) / 1000000 AS disc_sin,
           floor((atan2(l_quantity, l_extendedprice)) * 1000000 + 0.5) / 1000000 AS qp_atan2,
           floor((degrees(l_tax)) * 1000000 + 0.5) / 1000000 AS tax_deg,
           floor((log2(l_quantity + 1)) * 1000000 + 0.5) / 1000000 AS qty_log2,
           floor((cbrt(l_extendedprice)) * 1000000 + 0.5) / 1000000 AS price_cbrt
    FROM lineitem
    """,
)
def math_bitwise_trig(spark, sf_dir):
    """C21 (second pack): bitwise and transcendental functions — both
    engines use the same IEEE libm definitions, so 6-decimal rounding is
    bit-stable."""
    li = table(spark, sf_dir, "lineitem")
    k, ln = F.col("l_orderkey"), F.col("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("key_and"),
        k.bitwiseOR(F.lit(8)).alias("key_or"),
        k.bitwiseXOR(ln.cast("long")).alias("key_xor"),
        F.shiftleft(ln, 3).cast("long").alias("line_shl"),
        F.shiftright(k, 2).alias("key_shr"),
        rn(F.sin("l_discount"), 6).alias("disc_sin"),
        rn(F.atan2(F.col("l_quantity"), F.col("l_extendedprice")), 6).alias("qp_atan2"),
        rn(F.degrees("l_tax"), 6).alias("tax_deg"),
        rn(F.log2(F.col("l_quantity") + 1), 6).alias("qty_log2"),
        rn(F.cbrt("l_extendedprice"), 6).alias("price_cbrt"),
    )


@register("approx_quantiles")  # rows-only: sketch-based, engine-specific
def approx_quantiles(spark, sf_dir):
    """C10-adjacent: approximate quantiles (Greenwald-Khanna sketch) — at
    100 TB this replaces exact percentiles: mergeable sketch, no sort."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias(
            "price_quantiles"
        )
    )


@register(
    "approx_quantiles_bounds",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           true AS ok_p50, true AS ok_p90, true AS ok_p99
    FROM lineitem GROUP BY 1
    """,
)
def approx_quantiles_bounds(spark, sf_dir):
    """C10-adjacent on the driver's HARD signal: the Greenwald-Khanna
    sketch's guarantee is a RANK bound — ``percentile_approx(p,
    accuracy)`` returns a value whose rank is within n/accuracy of p·n.
    This query checks that contract in-query: each approximate quantile
    must lie between the EXACT quantiles at p ± 0.01 (accuracy 10000 →
    rank error ≤ 1e-4, two orders inside the band), emitted as booleans
    the oracle hardcodes ``true``. The exact p ± 0.01 bounds stay
    internal — only integers and booleans cross the oracle compare, so
    no float-interpolation mismatch can flake. Companion to the
    rows-only ``approx_quantiles`` (the sketch values themselves); at
    100 TB the sketch replaces the exact-percentile global sort."""
    li = table(spark, sf_dir, "lineitem")
    ps = [0.5, 0.9, 0.99]
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.percentile_approx(
            "l_extendedprice", ps, 10000
        ).alias("__apx"),
        F.percentile(
            "l_extendedprice",
            F.array(*[F.lit(b) for p in ps for b in (p - 0.01, p + 0.01)]),
        ).alias("__ex"),
    )
    ok = [
        (
            (F.col("__apx")[i] >= F.col("__ex")[2 * i])
            & (F.col("__apx")[i] <= F.col("__ex")[2 * i + 1])
        ).alias(f"ok_p{int(p * 100)}")
        for i, p in enumerate(ps)
    ]
    return agg.select("l_returnflag", "n", *ok)


@register(
    "json_variant_probe",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_variant,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k_doubled
    FROM events
    """,
)
def json_variant_probe(spark, sf_dir):
    """C25 (Spark 4 VARIANT): parse_json once into a Variant column, probe
    with variant_get — the modern engine-native schemaless path (binary
    variant encoding, no re-parse per probe), exactly the reference's
    `.get()` probing model (cdc_enrichment_function.py:35-81) done right."""
    ev = table(spark, sf_dir, "events")
    wv = ev.select("event_id", F.parse_json("props").alias("v"))
    k = F.variant_get(F.col("v"), "$.k", "bigint")
    return wv.select("event_id", k.alias("k_variant"), (k * 2).alias("k_doubled"))


@register(
    "string_functions2",
    oracle="""
    SELECT p_partkey,
           starts_with(p_name, 'small') AS is_small,
           ends_with(p_type, 'O') AS type_ends_o,
           left(p_name, 4) AS name_left4,
           right(p_brand, 2) AS brand_right2,
           repeat(substr(p_name, 1, 2), 3) AS name_rep,
           chr(65 + (p_size % 26)) AS size_letter,
           CAST(ascii(p_name) AS INTEGER) AS first_code,
           translate(p_name, 'aeiou', 'AEIOU') AS name_vowels_upper
    FROM part
    """,
)
def string_functions2(spark, sf_dir):
    """C19 (second pack): predicates, slicing, translate, char codes."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_name").startswith("small").alias("is_small"),
        F.col("p_type").endswith("O").alias("type_ends_o"),
        F.substring("p_name", 1, 4).alias("name_left4"),
        F.substring(F.col("p_brand"), -2, 2).alias("brand_right2"),
        F.repeat(F.substring("p_name", 1, 2), 3).alias("name_rep"),
        F.char(F.lit(65) + F.col("p_size") % 26).alias("size_letter"),
        F.ascii("p_name").alias("first_code"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_vowels_upper"),
    )


@register(
    "safe_casts",
    oracle="""
    SELECT p_partkey,
           try_cast(p_brand AS INTEGER) AS brand_as_int,
           try_cast(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INTEGER) AS brand_num_int,
           try_cast(CAST(p_size AS VARCHAR) AS INTEGER) AS size_roundtrip,
           try_cast(p_name AS DATE) AS name_as_date,
           try_cast(p_type AS DOUBLE) AS type_as_double
    FROM part
    """,
)
def safe_casts(spark, sf_dir):
    """C22-adjacent (safe conversion): try_cast — NULL instead of error on
    malformed input, the ingestion-time counterpart of the reference's
    never-fail stance (cdc_enrichment_function.py:104-107): a bad value
    nulls one field rather than killing a 100 TB job."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_brand").try_cast("int").alias("brand_as_int"),
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1)
        .try_cast("int")
        .alias("brand_num_int"),
        F.col("p_size").cast("string").try_cast("int").alias("size_roundtrip"),
        F.col("p_name").try_cast("date").alias("name_as_date"),
        F.col("p_type").try_cast("double").alias("type_as_double"),
    )


@register(
    "string_regexp",
    oracle="""
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS name_masked,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INTEGER) AS n_vowels,
           regexp_matches(p_type, '^[a-z]+ ') AS starts_word,
           regexp_extract(p_brand, '(Brand)#([0-9]+)', 2) AS brand_digits,
           regexp_replace(p_type, '\\s+', '_', 'g') AS type_snake
    FROM part
    """,
)
def string_regexp(spark, sf_dir):
    """C19 (regexp pack): global replace, match count, anchored predicate,
    group extraction. Spark regexp_replace is global by default; DuckDB
    needs the 'g' flag — the oracle says so explicitly. regexp_count is
    mirrored as len(regexp_extract_all) in DuckDB."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", r"[aeiou]", "*").alias("name_masked"),
        F.regexp_count("p_name", F.lit(r"[aeiou]")).alias("n_vowels"),
        F.col("p_type").rlike(r"^[a-z]+ ").alias("starts_word"),
        F.regexp_extract("p_brand", r"(Brand)#([0-9]+)", 2).alias("brand_digits"),
        F.regexp_replace("p_type", r"\s+", "_").alias("type_snake"),
    )


@register(
    "date_functions3",
    oracle="""
    SELECT o_orderkey,
           (o_orderdate + INTERVAL 3 MONTH)::DATE AS plus3m,
           dayname(o_orderdate) AS weekday_name,
           monthname(o_orderdate) AS month_name,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           make_date(CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER), 1) AS month_first,
           CAST(date_trunc('month', o_orderdate) AS DATE) - 1 AS prev_month_end
    FROM orders
    """,
)
def date_functions3(spark, sf_dir):
    """C20 (third pack): month arithmetic with end-of-month clamping
    (add_months ≡ DuckDB +INTERVAL MONTH), day/month names, make_date.
    Spark dayofweek is 1-based from Sunday; DuckDB 0-based — hence +1."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(F.to_date(d), 3).alias("plus3m"),
        F.date_format(d, "EEEE").alias("weekday_name"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.dayofweek(d).alias("dow"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("month_first"),
        F.date_sub(F.to_date(F.date_trunc("month", d)), 1).alias("prev_month_end"),
    )


@register(
    "array_hof_functions",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> length(x) > 5)) AS INTEGER) AS n_long_tokens,
           CAST(list_reduce(list_prepend(0, list_transform(toks, x -> CAST(length(x) AS INTEGER))),
                            (a, b) -> a + b) AS INTEGER) AS total_chars,
           len(list_filter(toks, x -> length(x) > 8)) > 0 AS has_long,
           len(list_filter(toks, x -> length(x) = 0)) = 0 AS all_nonempty,
           CAST(list_reduce(list_prepend(0,
                  list_transform(generate_series(1, len(toks)),
                                 i -> CAST(length(toks[i]) * i AS INTEGER))),
                (a, b) -> a + b) AS INTEGER) AS pos_weighted_chars
    FROM t
    """,
)
def array_hof_functions(spark, sf_dir):
    """C23 (higher-order pack): transform/filter/exists/forall/zip_with/
    sequence/aggregate — all JVM lambda expressions, no Python. At scale
    these replace explode+groupBy re-aggregation (no shuffle: per-row array
    work stays inside whole-stage codegen). DuckDB mirrors with list
    lambdas; position weighting uses 1-based indexing in both engines."""
    docs = table(spark, sf_dir, "documents")
    # Own projection for the tokenizer so downstream lambdas don't re-split
    # the text per reference (NOTES.md failure mode #1).
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    toks = F.col("toks")
    lens = F.transform(toks, lambda x: F.length(x))
    idx = F.sequence(F.lit(1), F.size(toks))
    return t.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).alias("n_long_tokens"),
        F.aggregate(lens, F.lit(0), lambda a, b: a + b).alias("total_chars"),
        F.exists(toks, lambda x: F.length(x) > 8).alias("has_long"),
        F.forall(toks, lambda x: F.length(x) > 0).alias("all_nonempty"),
        F.aggregate(
            F.zip_with(lens, idx, lambda l, i: l * i), F.lit(0), lambda a, b: a + b
        ).alias("pos_weighted_chars"),
    )


@register(
    "date_functions2",
    oracle="""
    SELECT o_orderkey,
           CAST(week(o_orderdate) AS INTEGER) AS iso_week,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS day_of_year,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
           greatest(CAST(o_orderdate AS DATE), DATE '1997-01-01') AS clamped_date
    FROM orders
    """,
)
def date_functions2(spark, sf_dir):
    """C20 (second pack): ISO week, ordinal day, epoch seconds, quarter."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.weekofyear(d).alias("iso_week"),
        F.dayofyear(d).alias("day_of_year"),
        F.unix_seconds(d.cast("timestamp")).alias("epoch_sec"),
        F.to_date(F.date_trunc("quarter", d)).alias("quarter_start"),
        F.greatest(F.to_date(d), F.lit("1997-01-01").cast("date")).alias("clamped_date"),
    )


@register(
    "xml_functions",
    oracle="""
    WITH x AS (
      SELECT doc_id,
             '<doc id="' || doc_id || '" nc="' || n_chars || '"><lang>' || lang ||
             '</lang><src>' || source || '</src></doc>' AS xml
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(xml, '<lang>([^<]*)</lang>', 1) AS lang_x,
           regexp_extract(xml, '<src>([^<]*)</src>', 1) AS src_x,
           CAST(regexp_extract(xml, 'nc="([0-9]+)"', 1) AS BIGINT) AS n_chars_x,
           CAST(regexp_extract(xml, 'id="([0-9]+)"', 1) AS BIGINT) + 1 AS next_id
    FROM x
    """,
)
def xml_functions(spark, sf_dir):
    """C25-adjacent (semi-structured: XML): build markup from typed columns,
    then extract with REAL XPath evaluation (element text and attribute
    axes). The oracle re-derives the same fields with regexes — two
    entirely different extraction mechanisms must agree value-for-value,
    a stronger check than mirroring one function both sides. (The XML file
    source/sink round-trip lives in tests/test_formats.py; DuckDB has no
    XML reader, so the file path is test-pinned rather than oracle-backed.)
    """
    docs = table(spark, sf_dir, "documents")
    xml = F.concat(
        F.lit('<doc id="'), F.col("doc_id").cast("string"),
        F.lit('" nc="'), F.col("n_chars").cast("string"),
        F.lit('"><lang>'), F.col("lang"),
        F.lit("</lang><src>"), F.col("source"),
        F.lit("</src></doc>"),
    )
    built = docs.select("doc_id", xml.alias("__xml"))
    return built.select(
        "doc_id",
        F.xpath_string("__xml", F.lit("/doc/lang")).alias("lang_x"),
        F.xpath_string("__xml", F.lit("/doc/src")).alias("src_x"),
        F.xpath_long("__xml", F.lit("/doc/@nc")).alias("n_chars_x"),
        (F.xpath_long("__xml", F.lit("/doc/@id")) + 1).alias("next_id"),
    )


@register(
    "url_functions",
    oracle="""
    WITH u AS (
      SELECT event_id,
             'https://' || event_type || '.example.com/u/' || user_id ||
             '/p?id=' || event_id || '&lang=en' AS url
      FROM events
    )
    SELECT event_id,
           regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
           regexp_extract(url, '[?&]id=([^&]*)', 1) AS id_param,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM u
    """,
)
def url_functions(spark, sf_dir):
    """C19-adjacent (URL parsing — the crawl-pipeline staple): build URLs
    from typed columns, extract host/path/protocol/query params with
    Spark's REAL url parser (``parse_url``, java.net semantics). The
    oracle re-derives each part with regexes — two different parsing
    mechanisms must agree on every row."""
    ev = table(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://"), F.col("event_type"), F.lit(".example.com/u/"),
        F.col("user_id").cast("string"), F.lit("/p?id="),
        F.col("event_id").cast("string"), F.lit("&lang=en"),
    )
    u = ev.select("event_id", url.alias("__url"))
    return u.select(
        "event_id",
        F.parse_url("__url", F.lit("HOST")).alias("host"),
        F.parse_url("__url", F.lit("PATH")).alias("path"),
        F.parse_url("__url", F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url("__url", F.lit("QUERY"), F.lit("id")).alias("id_param"),
        F.parse_url("__url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )
