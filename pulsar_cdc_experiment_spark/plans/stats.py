"""Footer-only table statistics: MIN/MAX/COUNT answered from parquet
metadata, zero data pages read.

At 100 TB, "how many rows / what's the key range" must not cost a scan.
Parquet footers already store per-row-group min/max/num_rows; Spark's DSv2
parquet reader pushes whole-table MIN/MAX/COUNT aggregates down to those
footers when ``spark.sql.parquet.aggregatePushdown`` is on (plan shows
``BatchScan … PushedAggregation: [MIN(col), …]``). The V1 reader (Spark's
default, ``spark.sql.sources.useV1SourceList`` includes parquet) never
pushes aggregates, so this helper scopes BOTH confs around the query and
restores them.

Limits (inherent to footer stats, enforced by Spark): no filters, no
group-by (Spark 3.3+ supports group-by on partition columns only), no
nested/timestamp-NTZ-rebase edge columns; MIN/MAX unsupported for floating
NaN-ordering edge cases falls back to a real scan automatically — the plan
assertion in tests/test_scale_plans.py is the proof the fast path engaged.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@contextmanager
def _dsv2_agg_pushdown(spark: SparkSession):
    conf = spark.conf
    prev_push = conf.get("spark.sql.parquet.aggregatePushdown", "false")
    prev_v1 = conf.get("spark.sql.sources.useV1SourceList", None)
    conf.set("spark.sql.parquet.aggregatePushdown", "true")
    conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        yield
    finally:
        conf.set("spark.sql.parquet.aggregatePushdown", prev_push)
        if prev_v1 is None:
            conf.unset("spark.sql.sources.useV1SourceList")
        else:
            conf.set("spark.sql.sources.useV1SourceList", prev_v1)


def footer_min_max(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """One-row DataFrame of ``<col>_min`` / ``<col>_max`` for ``cols``,
    answered from parquet footers (metadata-only when pushdown engages).

    The footer query executes INSIDE the conf scope and the collected row
    is re-published as a literal one-row DataFrame (mirroring
    ``footer_count``): returning the lazy aggregate instead would let a
    caller's later action re-plan AFTER the confs are restored and
    silently pay a full scan for values that were already in hand."""
    with _dsv2_agg_pushdown(spark):
        df = spark.read.parquet(path)
        aggs = []
        for c in cols:
            aggs.append(F.min(c).alias(f"{c}_min"))
            aggs.append(F.max(c).alias(f"{c}_max"))
        out = df.agg(*aggs)
        rows = out.collect()
    from ..sources.tables import local_rows

    return local_rows(spark, rows, out.schema)


def footer_count(spark: SparkSession, path: str) -> int:
    """Row count from footer num_rows (COUNT(*) pushdown)."""
    with _dsv2_agg_pushdown(spark):
        df = spark.read.parquet(path)
        return df.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"]
