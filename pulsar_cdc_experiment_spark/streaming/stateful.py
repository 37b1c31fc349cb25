"""Custom stateful streaming operators (SURVEY.md §2 C34).

Spark 4 offers both ``applyInPandasWithState`` (3.4+ API) and
``transformWithStateInPandas``; we use the former for its stable shape.
State is per-key and arbitrary — the generalization of the reference's
(stateless) function slot to stateful stream processing.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)

_STATE_SCHEMA = "n BIGINT, s DOUBLE"


def running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in keyed state.

    Emits the updated totals for every key touched in a micro-batch
    (update semantics). Batch-equivalent oracle: GROUP BY user_id.
    """

    def update(key, pdfs: Iterator, state: GroupState):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
