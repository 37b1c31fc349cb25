"""Driver-local bounded relations must be single-slice (round 19).

``spark.createDataFrame(list, schema)`` spreads the rows over
``defaultParallelism`` Python-RDD slices; a single-task consumer (a
``coalesce(1)`` audit write, a broadcast build) then pays one Python
worker round-trip PER SLICE, sequentially — measured 5–6 s for a 2-row
write at local[32]. ``sources.tables.local_rows`` pins the fix: same
rows, same explicit schema, exactly ONE partition. A regression here is
a performance bug even when results stay correct.
"""

from __future__ import annotations

from pulsar_cdc_experiment_spark.sources.tables import local_rows


def test_local_rows_is_single_partition(spark):
    df = local_rows(
        spark,
        [("quarantined", 3), ("dup_removed", 1)],
        "kind string, n int",
    )
    assert df.rdd.getNumPartitions() == 1


def test_local_rows_matches_createdataframe_semantics(spark):
    rows = [(1, "x", None), (2, None, 3.5), (None, "z", -0.0)]
    schema = "a int, b string, c double"
    got = local_rows(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )


def test_local_rows_empty_with_struct_schema(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    df = local_rows(spark, [], schema)
    assert df.count() == 0
    assert df.schema == schema
    assert df.rdd.getNumPartitions() == 1
