"""Event-time windowing operators (SURVEY.md §2 C29-C31).

Batch-first implementations of the streaming window semantics: the same
``F.window``/``F.session_window`` expressions work unchanged under
``readStream`` + watermark (streaming/ wires that); running them on a batch
DataFrame is both the correctness oracle and the backfill path.

Scale: tumbling/sliding windows are pure map-side bucket assignment followed
by one keyed aggregation — they scale like any group-by. Session windows
need per-key ordering; Spark implements them with a shuffle on the key plus
a sort within key, which is the minimal requirement for gap detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling(df: DataFrame, ts_col: str, width: str, *group_cols: str):
    """Non-overlapping event-time buckets, epoch-aligned (C29)."""
    return df.groupBy(F.window(ts_col, width), *group_cols)


def sliding(df: DataFrame, ts_col: str, width: str, slide: str, *group_cols: str):
    """Overlapping windows: each row lands in width/slide buckets (C30)."""
    return df.groupBy(F.window(ts_col, width, slide), *group_cols)


def session(df: DataFrame, ts_col: str, gap: str, *group_cols: str):
    """Gap-based session windows per key (C31): a session starts at the first
    event and ends ``gap`` after the last event within the gap."""
    return df.groupBy(F.session_window(ts_col, gap), *group_cols)


def flatten_window(grouped_agg: DataFrame, prefix: str = "w") -> DataFrame:
    """Replace the struct ``window`` column with flat start/end timestamps
    (struct columns would hash differently across engines)."""
    cols = [
        F.col("window.start").alias(f"{prefix}_start"),
        F.col("window.end").alias(f"{prefix}_end"),
    ] + [F.col(c) for c in grouped_agg.columns if c != "window"]
    return grouped_agg.select(*cols)
