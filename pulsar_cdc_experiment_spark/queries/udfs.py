"""UDx driver queries (SURVEY.md §2 C36-C39).

UDFs are the slow path — these queries exist to prove the extension points
(row UDF, Arrow-vectorized UDF, grouped-map, grouped-agg), not to do work
built-ins could do. Oracle determinism: the grouped UDFs accumulate in
exact integer arithmetic (int64 sums of integer-valued doubles) so results
are independent of pandas/DuckDB summation order.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.rounding import rn
from ..registry import register
from ..sources.tables import table


@register(
    "udf_scalar_python",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN 'final'
                WHEN o_totalprice > 100000 THEN 'big-open'
                ELSE 'open' END AS order_class
    FROM orders
    """,
)
def udf_scalar_python(spark, sf_dir):
    """C36: row-at-a-time Python UDF (the reference's per-message model —
    kept for parity; ~10-100x slower than the expression equivalent)."""

    @F.udf(returnType=T.StringType())
    def classify(status: str, total: float) -> str:
        if status == "F":
            return "final"
        if total is not None and total > 100000:
            return "big-open"
        return "open"

    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", classify("o_orderstatus", "o_totalprice").alias("order_class")
    )


@register(
    "udf_pandas_vectorized",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.5) / 100 AS charge
    FROM lineitem
    """,
)
def udf_pandas_vectorized(spark, sf_dir):
    """C37: Arrow-batched pandas UDF — identical FP ops to the SQL oracle
    (elementwise vector math is order-independent)."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        raw = price * (1 - disc) * (1 + tax)
        return np.floor(raw * 100 + 0.5) / 100

    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@register(
    "udf_grouped_map_zscore",
    oracle="""
    WITH stats AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx2
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           CASE WHEN s.n > 1 AND (s.sx2 - s.sx * s.sx / CAST(s.n AS DOUBLE)) > 0
                THEN floor(((l.l_quantity - s.sx / CAST(s.n AS DOUBLE))
                      / sqrt((s.sx2 - s.sx * s.sx / CAST(s.n AS DOUBLE)) / (s.n - 1))) * 1000000 + 0.5) / 1000000
                END AS qty_zscore
    FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag
    """,
)
def udf_grouped_map_zscore(spark, sf_dir):
    """C38: groupBy().applyInPandas — per-group z-score of quantity.

    Moments accumulate as int64 (quantities are integer-valued), so mean and
    variance are exact and order-independent — the oracle reproduces them
    with the same two-pass-free formula.
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("qty_zscore", T.DoubleType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf["l_quantity"].to_numpy()
        qi = q.astype(np.int64)
        n = len(qi)
        sx = int(qi.sum())
        sx2 = int((qi * qi).sum())
        var_num = sx2 - sx * sx / float(n)
        if n > 1 and var_num > 0:
            mean = sx / float(n)
            std = np.sqrt(var_num / (n - 1))
            z = np.floor(((q - mean) / std) * 1_000_000 + 0.5) / 1_000_000
        else:
            z = np.full(n, np.nan)
        return pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "l_returnflag": pdf["l_returnflag"],
                "qty_zscore": z,
            }
        )

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    return li.groupBy("l_returnflag").applyInPandas(zscore, out_schema)


@register(
    "udf_grouped_agg_weighted",
    oracle="""
    SELECT l_returnflag,
           floor((CAST(sum(CAST(l_quantity AS BIGINT) * l_linenumber) AS BIGINT)
                  / CAST(CAST(sum(l_linenumber) AS BIGINT) AS DOUBLE)) * 1000000 + 0.5) / 1000000
             AS weighted_avg_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_grouped_agg_weighted(spark, sf_dir):
    """C39: UDAF via pandas_udf GROUPED_AGG — linenumber-weighted mean
    quantity, accumulated in exact int64."""
    import numpy as np

    @F.pandas_udf(T.DoubleType(), F.PandasUDFType.GROUPED_AGG)
    def wavg(qty: pd.Series, weight: pd.Series) -> float:
        qi = qty.to_numpy().astype(np.int64)
        wi = weight.to_numpy().astype(np.int64)
        num = int((qi * wi).sum())
        den = int(wi.sum())
        if den == 0:
            return None
        return float(np.floor((num / float(den)) * 1_000_000 + 0.5) / 1_000_000)

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        wavg("l_quantity", "l_linenumber").alias("weighted_avg_qty")
    )


@register(
    "udtf_chunk_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), starts AS (
      SELECT doc_id, toks, unnest(range(0, len(toks), 40)) AS s FROM t
    )
    SELECT doc_id,
           CAST(s // 40 AS INTEGER) AS chunk_idx,
           CAST(least(len(toks) - s, 50) AS INTEGER) AS n_chunk_tokens,
           array_to_string(toks[s + 1 : least(s + 50, len(toks))], ' ') AS chunk_text
    FROM starts
    """,
)
def udtf_chunk_documents(spark, sf_dir):
    """Python UDTF (Spark 4 table function): sliding-window token chunking
    — the canonical LLM training-data op (chunk_size=50, overlap=10, so
    starts step by 40). One input doc row expands to N chunk rows via a
    LATERAL table-function join; the oracle replays the identical chunking
    with generate_series over the token list. Like the scalar-UDF query,
    this exists to prove the extension point — pure-expression chunking
    (sequence + transform) is the fast path and is how shingled() works.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_chunk_tokens int, chunk_text string")
    class ChunkDoc:
        def eval(self, text: str):
            toks = text.split() if text else []
            n = len(toks)
            start = 0
            while start < n:
                chunk = toks[start : start + 50]
                yield start // 40, len(chunk), " ".join(chunk)
                start += 40

    spark.udtf.register("chunk_doc", ChunkDoc)
    docs = table(spark, sf_dir, "documents")
    docs.filter(F.length(F.trim("text")) > 0).createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_chunk_tokens, c.chunk_text
        FROM __udtf_docs d, LATERAL chunk_doc(d.text) c
        """
    )


@register(
    "udf_cogrouped_merge",
    oracle="""
    WITH p AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
             floor((sum(value)) * 100 + 0.5) / 100 AS purchase_sum
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), s AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_signups
      FROM events WHERE event_type = 'signup' GROUP BY 1
    )
    SELECT COALESCE(p.user_id, s.user_id) AS user_id,
           COALESCE(n_purchases, 0) AS n_purchases,
           COALESCE(purchase_sum, 0.0) AS purchase_sum,
           COALESCE(n_signups, 0) AS n_signups
    FROM p FULL OUTER JOIN s USING (user_id)
    """,
)
def udf_cogrouped_merge(spark, sf_dir):
    """C38 (two-sided): COGROUPED pandas map — both sides of a key arrive
    as aligned pandas frames in one function call
    (``groupBy().cogroup().applyInPandas``), the extension point for
    per-key merge logic a join can't express (custom reconciliation,
    model scoring over both feeds). One shuffle per side on the key, like
    a join. The body here computes per-user purchase/signup stats so the
    whole thing remains value-checkable against a FULL OUTER JOIN oracle.
    """
    import math

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "value"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "event_id"
    )

    def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_purchases": [len(left)],
                "purchase_sum": [
                    math.floor(float(left["value"].sum()) * 100 + 0.5) / 100
                    if len(left)
                    else 0.0
                ],
                "n_signups": [len(right)],
            }
        )

    out_schema = (
        "user_id bigint, n_purchases bigint, purchase_sum double, n_signups bigint"
    )
    return (
        purchases.groupBy("user_id")
        .cogroup(signups.groupBy("user_id"))
        .applyInPandas(merge, out_schema)
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           substr(text, 1, 8) AS prefix8
    FROM documents
    """,
)
def udf_map_in_arrow(spark, sf_dir):
    """C37 (lowest-level Python interop): ``mapInArrow`` — the function
    receives raw ``pyarrow.RecordBatch`` objects, no pandas conversion at
    all. The cheapest Python hop Spark offers: for byte-level work
    (payload stats, tokenizer FFI, model-runtime handoff) it skips the
    Arrow→pandas materialization ``mapInPandas`` pays. Byte length and an
    8-byte prefix are recomputed from the binary payload with pyarrow
    compute kernels; the oracle predicts both from the source text (ASCII
    corpus ⇒ byte slices equal character slices, as in multimodal_decode).
    """
    from collections.abc import Iterator

    import pyarrow as pa

    from ..operators.multimodal import attach_binary_payload

    def stats(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for batch in batches:
            payload = batch.column(batch.schema.get_field_index("payload"))
            n_bytes = pc.binary_length(payload).cast(pa.int64())
            prefix8 = pc.cast(pc.binary_slice(payload, 0, 8), pa.string())
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("media_id")),
                    n_bytes,
                    prefix8,
                ],
                ["media_id", "n_bytes", "prefix8"],
            )

    docs = table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, "text", "doc_id").select(
        "media_id", "payload"
    )
    return media.mapInArrow(
        stats, "media_id bigint, n_bytes bigint, prefix8 string"
    )


@register(
    "udtf_table_arg_gaps",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(gap) AS BIGINT) AS max_gap_us
    FROM g GROUP BY user_id
    """,
)
def udtf_table_arg_gaps(spark, sf_dir):
    """Python UDTF with a TABLE argument (Spark 4 polymorphic table
    function): ``gap_stats(TABLE(events) PARTITION BY user_id ORDER BY
    ts)`` — the engine hands each user's rows, time-ordered, to one UDTF
    instance, which streams them with O(1) state (previous timestamp,
    running max) and emits one summary row at partition end via
    ``terminate``. This is the sessionization/sequence-analysis
    extension point where per-row SQL windows get awkward; the gap math
    here is deliberately window-expressible so DuckDB can oracle it
    exactly (integer epoch-microsecond diffs). Partitioning contract,
    not a toy: the PARTITION BY is a real hash exchange and the per-user
    order is engine-enforced, so the same class runs unchanged at 100 TB
    (state is per-user O(1), never per-partition-buffered)."""
    from datetime import datetime, timedelta

    from pyspark.sql.functions import udtf

    _EPOCH = datetime(1970, 1, 1)
    _US = timedelta(microseconds=1)

    @udtf(returnType="user_id bigint, n_events bigint, max_gap_us bigint")
    class GapStats:
        def __init__(self):
            self.uid = None
            self.n = 0
            self.prev = None
            self.mx = None

        def eval(self, row):
            self.uid = row["user_id"]
            self.n += 1
            us = (row["ts"] - _EPOCH) // _US
            if self.prev is not None:
                g = us - self.prev
                if self.mx is None or g > self.mx:
                    self.mx = g
            self.prev = us

        def terminate(self):
            yield self.uid, self.n, self.mx

    spark.udtf.register("gap_stats", GapStats)
    table(spark, sf_dir, "events").createOrReplaceTempView("__ta_events")
    return spark.sql(
        """
        SELECT * FROM gap_stats(
          TABLE(__ta_events) PARTITION BY user_id ORDER BY (ts, event_id)
        )
        """
    )
