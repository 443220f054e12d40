"""Custom stateful streaming operators (``applyInPandasWithState``).

Built-in stateful ops (windowed aggs, dropDuplicates, stream joins)
cover most streaming analytics; ``applyInPandasWithState`` is the
sanctioned escape hatch when per-key state has CUSTOM transition logic.
Here: per-user lifetime counters with inactivity expiry — the "user
profile" shape every event pipeline grows eventually (reference has no
streaming state at all; engine extension per SURVEY.md §2.E).

State design for scale: state is per-key (user), a fixed-width tuple —
bounded memory per key, checkpointed by the state store (RocksDB/HDFS
on a cluster), evicted on processing-time timeout. Batches arrive as
Arrow pandas frames per key group; the transition is vectorized within
the batch.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_purchases", T.LongType()),
    ]
)

_STATE_SCHEMA = "n_events LONG, total_value DOUBLE, n_purchases LONG"


def _make_update(idle_timeout_ms: int | None):
    def _update_user_totals(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Transition: fold the batch into (n_events, total_value,
        n_purchases); emit the updated running totals once per batch."""
        if state.hasTimedOut:
            state.remove()
            return
        n, total, purchases = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            purchases += int((pdf["event_type"] == "purchase").sum())
        state.update((n, round(total, 6), purchases))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 6)],
                "n_purchases": [purchases],
            }
        )

    return _update_user_totals


def user_totals_stream(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user running totals over an event stream. Output mode: update
    (one row per user per batch with the new totals).

    ``idle_timeout_ms`` evicts state for users idle longer than the
    timeout — essential for unbounded key spaces on long-running
    clusters. Default OFF: Spark 4.1's availableNow drain runs a final
    state-CLEANUP batch whose planning NPEs under ProcessingTimeTimeout
    (internal ``PythonSQLMetrics`` bug — results are already emitted and
    correct, but the query reports failure), so scheduled-drain callers
    should leave this None and bound state by key cardinality instead.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update(idle_timeout_ms),
        outputStructType=USER_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
