"""The deterministic sampling hash must agree with DuckDB PAST 2^32.

Round-3 advice: the naive `doc_id * 2654435761` overflows int64 once
doc_id ≳ 3.47e9 (Spark wraps, DuckDB raises) — i.e. the reproducible-
sampling primitive diverged exactly at the corpus sizes it exists for.
The split-multiply rewrite (queries/llm_ops._hash32/_hash32_sql) must be
(a) overflow-free for any int64 id, (b) equal to the naive formula below
2^32 so the existing oracles are unchanged, and (c) bit-identical between
the Spark expression and the generated DuckDB SQL at every magnitude.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from pulsar_cdc_experiment_spark.queries.llm_ops import _KNUTH, _M32, _hash32, _hash32_sql

# ids straddling every interesting boundary: tiny, the old int64-overflow
# threshold (~2^63/K ≈ 3.47e9), 2^32, and the top of the int64 range
IDS = [
    0,
    1,
    7,
    12345,
    2**31 - 1,
    2**32 - 1,
    2**32,
    2**32 + 1,
    3_470_000_000,
    3_500_000_000,
    10**12 + 7,
    2**53 + 1,
    2**62,
    2**63 - 1,
]


def _py_hash(i: int) -> int:
    return (i * _KNUTH) % _M32


def test_spark_matches_python_reference(spark):
    df = spark.createDataFrame([(i,) for i in IDS], "doc_id long")
    got = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", _hash32("doc_id").alias("h")).collect()
    }
    for i in IDS:
        assert got[i] == _py_hash(i), f"spark hash diverges at id={i}"


def test_duckdb_sql_matches_python_reference():
    con = duckdb.connect()
    ids_sql = ", ".join(f"({i})" for i in IDS)
    rows = con.execute(
        f"SELECT doc_id, {_hash32_sql('doc_id')} AS h "
        f"FROM (VALUES {ids_sql}) t(doc_id)"
    ).fetchall()
    for i, h in rows:
        assert h == _py_hash(i), f"duckdb hash diverges at id={i}"


def test_equals_naive_formula_below_2_32():
    # existing oracles were generated from the naive formula; sub-2^32 ids
    # (every test SF) must hash identically or the whole sample set shifts
    for i in [0, 1, 999, 60_000, 2**31, 2**32 - 1]:
        assert _py_hash(i) == (i * _KNUTH) % _M32
