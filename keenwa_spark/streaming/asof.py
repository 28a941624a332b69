"""Streaming as-of join via applyInPandasWithState: each purchase
matched to its user's most recent prior view, across micro-batches —
the streaming face of ``operators/asof.py`` (same semantics as
``op_asof_attribution``, whose DuckDB ASOF-JOIN oracle this stream's
output must equal exactly).

State per user is the best view seen so far as EXACT integers
(epoch-micros, view id) — two longs, O(distinct keys) total. Within a
batch, rows process in (ts, side, id) order with views BEFORE
purchases at equal timestamps, mirroring the batch operator's
inclusive right.ts <= left.ts match; equal-ts duplicate views resolve
to the greatest view id (the batch operator's
lexicographically-greatest-payload rule). Micro-batches must be
event-time-ordered per key for exact batch equivalence — the same
replayable-source contract as streaming/anomaly.py, and like there,
the whole group is concatenated and sorted ONCE (never per-chunk).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

ASOF_OUTPUT_SCHEMA = StructType(
    [
        StructField("purchase_id", LongType()),
        StructField("user_id", LongType()),
        StructField("purchase_epoch_us", LongType()),
        StructField("view_id", LongType()),
        StructField("lag_us", LongType()),
    ]
)

ASOF_STATE_SCHEMA = StructType(
    [
        StructField("view_ts_us", LongType()),
        StructField("view_id", LongType()),
    ]
)


def _match_purchases(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last_ts, last_id = state.get if state.exists else (None, None)

    chunks = list(batches)
    pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
    # views (side 0) before purchases (side 1) at equal ts: the match
    # is INCLUSIVE; ascending view id thereafter realizes the
    # greatest-id tie-break by leaving the last same-ts view in state
    pdf = pdf.assign(
        __us=pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000,
        __side=(pdf["event_type"] == "purchase").astype("int8"),
    ).sort_values(["__us", "__side", "event_id"])

    out: list[tuple] = []
    for eid, et, us in zip(pdf["event_id"], pdf["event_type"], pdf["__us"]):
        if et == "view":
            last_ts, last_id = int(us), int(eid)
        elif et == "purchase":
            out.append(
                (
                    int(eid),
                    int(us),
                    last_id,
                    (int(us) - last_ts) if last_ts is not None else None,
                )
            )

    if last_ts is not None:
        state.update((last_ts, last_id))
    yield pd.DataFrame(
        {
            "purchase_id": pd.Series([r[0] for r in out], dtype="int64"),
            "user_id": pd.Series([user_id] * len(out), dtype="int64"),
            "purchase_epoch_us": pd.Series([r[1] for r in out], dtype="int64"),
            "view_id": pd.array([r[2] for r in out], dtype="Int64"),
            "lag_us": pd.array([r[3] for r in out], dtype="Int64"),
        }
    )


def asof_stream(events: DataFrame) -> DataFrame:
    """Per-purchase last-touch attribution on the event stream: emits
    (purchase_id, user_id, purchase_epoch_us, view_id, lag_us) for
    every purchase in every micro-batch; view_id/lag_us are NULL when
    the user has no prior view."""
    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _match_purchases,
            outputStructType=ASOF_OUTPUT_SCHEMA,
            stateStructType=ASOF_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
