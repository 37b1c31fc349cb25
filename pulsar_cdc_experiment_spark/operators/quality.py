"""Declarative data-quality expectations: N rules checked in ONE pass.

The reference's pipeline carries per-message ``data_quality`` flags
(has_before/has_after/field_count/is_complete, reference
cdc_enrichment_function.py:60-66) — row-local quality as enrichment
output. A data platform also needs the TABLE-level contract: "event_id
is never null and unique, values are non-negative, timestamps live in
the expected range" — asserted per batch, cheaply, before data is
published downstream.

:func:`expect` evaluates every row-level rule as a conditional count
inside a single aggregate — one scan, map-side partials, no per-rule
jobs (the anti-pattern is one ``filter().count()`` per rule: R rules =
R scans = R× the I/O at 100 TB). Uniqueness rules are not row-local; they
get their own keyed aggregate and union in — two shuffles total for any
number of rules.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect(
    df: DataFrame,
    rules: Sequence[tuple[str, Column]],
    unique_keys: Sequence[tuple[str, Sequence[str]]] = (),
) -> DataFrame:
    """Evaluate quality ``rules`` (name, boolean column — True = row OK)
    and ``unique_keys`` (name, key columns) over ``df`` in one pass each.

    Returns one row per rule: ``rule``, ``n_violations``, ``n_rows``
    (rows checked), ``passed`` (zero violations). Null rule results count
    as violations — an unevaluable expectation is a failing one.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, col in rules:
        # coalesce: sum over ZERO rows is null, and an empty input has
        # zero violations, not unknown
        aggs.append(
            F.coalesce(
                F.sum(F.when(col.isNull() | ~col, 1).otherwise(0)), F.lit(0)
            ).alias(f"__v_{name}")
        )
    row = df.agg(*aggs)
    legs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__v_{name}").cast("long").alias("n_violations"),
                F.col("__n").cast("long").alias("n_rows"),
            )
            for name, _ in rules
        ]
    )
    out = row.select(F.explode(legs).alias("r")).select("r.*")
    for name, keys in unique_keys:
        dup = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(
                F.lit(name).alias("rule"),
                F.coalesce(
                    F.sum(F.when(F.col("__c") > 1, F.col("__c") - 1)), F.lit(0)
                )
                .cast("long")
                .alias("n_violations"),
                F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n_rows"),
            )
        )
        out = out.unionByName(dup)
    return out.withColumn("passed", F.col("n_violations") == 0)
