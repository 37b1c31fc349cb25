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


def running_totals_tws(events: DataFrame) -> DataFrame:
    """``running_totals`` on Spark 4's ``transformWithStateInPandas``.

    Same semantics as the applyInPandasWithState version below, on the
    successor API (SURVEY.md §2 C34 names both): typed ValueState handles,
    timers, and TTL-capable state. Requires the RocksDB state store
    provider (wrap the run in ``pipeline.rocksdb_state_store``) — which is
    also the right provider for large keyspaces, so the modern API and the
    scale configuration land together. Also needs ``google.protobuf``
    (pyspark's state-server protocol dependency); where that is missing the
    test suite skips this path and ``running_totals`` below is the
    supported implementation.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, s = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += int(len(pdf))
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
            )

        def close(self) -> None:
            pass

    return (
        events.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=RUNNING_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


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
