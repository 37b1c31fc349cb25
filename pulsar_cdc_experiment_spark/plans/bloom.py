"""Parquet bloom-filter secondary indexing: point lookups on a
non-clustered column.

A table laid out for one access path (time, Z-order, range keys) still
gets point lookups on OTHER high-cardinality columns — "all events for
user X" against a time-clustered 100 TB table. Row-group min/max stats
can't prune those scans (every row group spans nearly the full key
domain), and re-clustering for every access path is not an option. The
parquet format's answer is the column-level **bloom filter**: a per-row-
group membership sketch the reader consults on equality predicates,
skipping row groups that provably lack the key.

This is deliberately the NATIVE path, not a hand-built index table:
Spark's parquet writer emits the blooms (``parquet.bloom.filter.
enabled#<col>``) and the vectorized reader consumes them transparently
for pushed equality filters — zero query-side code, and the sketch
travels WITH the data file (no index/table consistency problem, unlike a
side index). Measured here (tests/test_plans.py): a scrambled 2M-row
layout answers a point lookup reading ONE row group with blooms vs every
row group without — the scan's numOutputRows metric shows the skip
directly.

Sizing: a bloom costs ~1.2 bytes/NDV at the default 1% FPP — ~0.1% of
typical column data — and false positives only cost an extra row-group
read, never correctness. At 100 TB: enable blooms on the 2-3 columns
that serve point lookups, set ``expected.ndv`` per row group (NOT per
table — overshooting wastes footer bytes, undershooting inflates FPP).

Reference analog: per-key topic routing gives the reference O(1) access
to one table's feed (docs/setup-guide.md:33-35); blooms are the columnar
equivalent for keys the layout wasn't built around.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def bloom_write_options(
    cols: list[str], expected_ndv: int, block_size_bytes: int | None = None
) -> dict[str, str]:
    """Writer options enabling parquet blooms on ``cols``. ``expected_ndv``
    is per ROW GROUP (the bloom's scope)."""
    opts: dict[str, str] = {}
    for c in cols:
        opts[f"parquet.bloom.filter.enabled#{c}"] = "true"
        opts[f"parquet.bloom.filter.expected.ndv#{c}"] = str(expected_ndv)
    if block_size_bytes is not None:
        opts["parquet.block.size"] = str(block_size_bytes)
    return opts


def write_with_bloom(
    df: DataFrame,
    dst: str,
    bloom_cols: list[str],
    expected_ndv: int,
    block_size_bytes: int | None = None,
) -> None:
    """Write ``df`` as parquet with bloom filters on ``bloom_cols``."""
    w = df.write
    for k, v in bloom_write_options(bloom_cols, expected_ndv, block_size_bytes).items():
        w = w.option(k, v)
    w.mode("overwrite").parquet(dst)


def bloom_columns(spark: SparkSession, path: str) -> dict[str, bool]:
    """Which columns of the FIRST data file (lexicographically) carry a
    bloom filter, read from the parquet footer via the JVM reader
    (pyarrow<17 does not expose bloom offsets). Driver-side footer I/O
    only — no Spark job.

    Scope (round-6 ADVICE): this inspects ONE file's footer. For tables
    written by a single writer configuration (every call site here:
    write_with_bloom / optimize_table write the whole directory with one
    option set) that is table-level truth; a directory accumulated from
    heterogeneous writes could carry blooms in some files only, and this
    probe would misreport it. Raises a descriptive error on a directory
    with no data files rather than IndexError."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    parts = sorted(
        f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".parquet")
    )
    if not parts:
        raise FileNotFoundError(f"no parquet data files under {path!r}")
    part = parts[0]
    p = jvm.org.apache.hadoop.fs.Path(os.path.join(path, part))
    inf = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
    rdr = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inf)
    try:
        rg = rdr.getFooter().getBlocks().get(0)
        bfr = rdr.getBloomFilterDataReader(rg)
        out: dict[str, bool] = {}
        for j in range(rg.getColumns().size()):
            cc = rg.getColumns().get(j)
            out[cc.getPath().toDotString()] = bfr.readBloomFilter(cc) is not None
        return out
    finally:
        rdr.close()


def scan_output_rows(df: DataFrame) -> int:
    """Rows the file scan PRODUCED for an already-executed ``df`` action —
    the observable for row-group skipping (blooms/stats act inside the
    reader, below the plan, so this metric is the proof the skip
    happened). Call after an action; AQE must be off for the executed
    plan's leaves to be inspectable."""
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    return leaves.apply(0).metrics().apply("numOutputRows").value()
