"""Custom stateful streaming operator via applyInPandasWithState.

``window``/``session_window`` cover time-bucketed aggregation; what
they can't express is ARBITRARY per-key state machines — running
counters with custom eviction, per-user quotas, cross-batch anomaly
flags. Spark's escape hatch is ``applyInPandasWithState``: per-key
state in the state store, Arrow-batched Python updates, watermark-driven
timeouts.

The operator here is a per-user lifetime activity tracker: each
micro-batch updates (n_events, total_value, n_purchases) per user and
emits the updated snapshot — the minimal real shape of "custom state
the built-in windows can't hold" (it never expires; a session window
would close it).

Scale notes: state lives in the executor state store partitioned by
key (user_id) — the same hash-shuffle as a batch groupBy; Python sees
one Arrow batch per key-group per trigger. State size is O(distinct
users), independent of event volume.

Sink note: memory sinks (used in tests) do NOT support checkpoint
recovery — Spark raises AnalysisException on restart by design;
production restartability requires a fault-tolerant sink
(parquet/kafka/delta) with the same checkpointLocation.

API note: Spark 4's successor API (``transformWithStateInPandas`` —
composable typed value/list/map state, timers, RocksDB-backed) was
probed in this environment and its Python state-protocol worker dies
on a broken ``google.protobuf`` install (ImportError: cannot import
'descriptor'; no package installs available here), so this module
ships the ``applyInPandasWithState`` form — still fully supported in
4.x and semantically equivalent for this operator (one value-state
per key, no timers). Migrating is mechanical: the update closure
becomes a ``StatefulProcessor`` with ``handle.getValueState``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("n_purchases", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("n_purchases", LongType()),
    ]
)


def _update_user(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n_events, total_value, n_purchases = (
        state.get if state.exists else (0, 0.0, 0)
    )
    for pdf in batches:
        n_events += len(pdf)
        total_value += float(pdf["value"].sum())
        n_purchases += int((pdf["event_type"] == "purchase").sum())
    state.update((n_events, total_value, n_purchases))
    yield pd.DataFrame(
        {
            "user_id": pd.Series([user_id], dtype="int64"),
            "n_events": pd.Series([n_events], dtype="int64"),
            "total_value": pd.Series([total_value], dtype="float64"),
            "n_purchases": pd.Series([n_purchases], dtype="int64"),
        }
    )


def user_activity_tracker(events: DataFrame) -> DataFrame:
    """Streaming per-user lifetime counters with explicit state.

    Input: the event stream (needs user_id, event_type, value).
    Output: one updated snapshot row per active user per micro-batch.
    """
    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
