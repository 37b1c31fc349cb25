"""Timezone-independent epoch/timestamp helpers over TIMESTAMP_NTZ.

The `events.ts` column is physically parquet TIMESTAMP(MICROS,
isAdjustedToUTC=false), which Spark reads as TIMESTAMP_NTZ and DuckDB as
its (naive) TIMESTAMP — the same local-datetime fields on both engines,
independent of any session timezone.

The hazard these helpers kill (NOTES.md round-2 "latent hazard"):
`unix_millis(ts)` requires TIMESTAMP, and casting NTZ→TIMESTAMP consults
`spark.sql.session.timeZone` — a non-UTC driver would shift every
events-derived epoch. `timestamp_diff`/`timestamp_add` over two NTZ values
is pure local-field arithmetic, bit-identical to DuckDB's `epoch_ms`/
`epoch_us` on naive timestamps in EVERY session timezone (pinned by
tests/test_timezone.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _epoch_ntz() -> Column:
    # to_timestamp_ntz(string) parses local fields directly — no timezone
    # is involved at any point (unlike F.lit(datetime) which builds a
    # session-zoned TIMESTAMP literal).
    return F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00"))


def epoch_millis(ts: Column | str) -> Column:
    """Epoch milliseconds of an NTZ timestamp == DuckDB ``epoch_ms(ts)``."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_diff("MILLISECOND", _epoch_ntz(), ts)


def epoch_micros(ts: Column | str) -> Column:
    """Epoch microseconds of an NTZ timestamp == DuckDB ``epoch_us(ts)``."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_diff("MICROSECOND", _epoch_ntz(), ts)


def ntz_from_millis(ms: Column) -> Column:
    """Epoch millis → TIMESTAMP_NTZ (inverse of epoch_millis; timezone-free,
    unlike ``timestamp_millis`` which yields session-zoned TIMESTAMP)."""
    return F.timestamp_add("MILLISECOND", ms, _epoch_ntz())


def ntz_from_micros(us: Column) -> Column:
    """Epoch micros → TIMESTAMP_NTZ."""
    return F.timestamp_add("MICROSECOND", us, _epoch_ntz())
