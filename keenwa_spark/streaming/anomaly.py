"""Streaming cross-batch anomaly flags via applyInPandasWithState —
the per-key state machine the built-in windows can't hold (named as the
motivating shape in ``streaming/stateful.py``).

Each event is scored against its user's EXPANDING history (everything
seen before it, across micro-batches) with the same z-score the batch
operator uses (``operators/anomaly.py``): sample mean/variance of the
prior values, flag |z| > threshold, THEN fold the event into state. A
spike therefore never dilutes the baseline it is judged against, and
the stream's output is row-for-row equal to a batch expanding window
(``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`` ordered by
(ts, event_id)) — bit-for-bit, not approximately:

- State carries EXACT integer micro-unit sums, not running doubles:
  s1 in 1e-6 units of value, s2 (sum of squares) in 1e-12 units split
  into two longs (hi, lo base 1e18 — a single long overflows once
  ~30 events of value ~500 accumulate). Exactness is what makes the
  result independent of micro-batch boundaries AND equal to the batch
  twin's decimal window sums.
- Scoring converts the exact integers to doubles with one correctly-
  rounded division each (CPython int/int true division), then applies
  the identical formula/op-order the batch SQL uses — every step is a
  correctly-rounded IEEE op in both engines, so results match to the
  bit (tests/test_stateful_streaming.py asserts exact equality).

Scale: state is 4 longs per user — O(distinct keys), independent of
event volume; the state store shuffle is the same hash partitioning a
batch groupBy would use. Within a batch, each key group is processed
sorted by (ts, event_id); micro-batches must be event-time-ordered
per key for exact batch equivalence (file sources: stage files in
time order), the standard contract for replayable state.

Assumes values are exact 6-decimal quantities (the repo-wide
DECIMAL(18,6) convention); NULL values pass through unscored and are
not folded into state, matching COUNT(value)/SUM semantics.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_BASE = 10**18  # hi/lo split base for the exact sum of squares

ANOMALY_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("n_hist", LongType()),
        StructField("z", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)

ANOMALY_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s1_units", LongType()),
        StructField("s2_hi", LongType()),
        StructField("s2_lo", LongType()),
    ]
)


def _score_and_fold(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    min_obs: int,
    z_threshold: float,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, s1u, s2_hi, s2_lo = state.get
        s2u = s2_hi * _BASE + s2_lo
    else:
        n, s1u, s2u = 0, 0, 0

    # the group's rows arrive as an ITERATOR of Arrow chunks (capped by
    # arrow.maxRecordsPerBatch); sorting per-chunk would fold events
    # out of time order whenever a key's batch spans chunks — collect
    # the whole group, sort ONCE, then score sequentially
    chunks = list(batches)
    pdf = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]).sort_values(
        ["ts", "event_id"]
    )
    out: list[tuple] = []
    for eid, v in zip(pdf["event_id"], pdf["value"]):
        if pd.isna(v):
            out.append((int(eid), n, None, False))
            continue
        z = None
        if n >= min_obs:
            # mirror the batch SQL formula op-for-op (see module doc)
            s1 = s1u / 10**6
            s2 = s2u / 10**12
            var = (s2 - s1 * s1 / n) / (n - 1)
            if var > 0:
                z = (float(v) - s1 / n) / math.sqrt(var)
        out.append((int(eid), n, z, bool(z is not None and abs(z) > z_threshold)))
        vu = round(float(v) * 10**6)
        n += 1
        s1u += vu
        s2u += vu * vu

    state.update((n, s1u, *divmod(s2u, _BASE)))
    yield pd.DataFrame(
        {
            "user_id": pd.Series([user_id] * len(out), dtype="int64"),
            "event_id": pd.Series([r[0] for r in out], dtype="int64"),
            "n_hist": pd.Series([r[1] for r in out], dtype="int64"),
            # nullable Float64 so warm-up rows cross Arrow as NULL, not NaN
            "z": pd.array([r[2] for r in out], dtype="Float64"),
            "is_anomaly": pd.Series([r[3] for r in out], dtype="bool"),
        }
    )


def stream_zscore_anomaly(
    events: DataFrame,
    min_obs: int = 5,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-event anomaly flags against the user's expanding history.

    Emits (user_id, event_id, n_hist, z, is_anomaly) for every event in
    every micro-batch; ``n_hist`` counts prior non-null values. NULL z
    (warm-up below ``min_obs``, constant history, or NULL value) is
    never an anomaly.
    """
    if min_obs < 2:
        raise ValueError("min_obs must be >= 2 (sample variance needs n>1)")

    def fn(key, batches, state):
        return _score_and_fold(key, batches, state, min_obs, z_threshold)

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=ANOMALY_OUTPUT_SCHEMA,
            stateStructType=ANOMALY_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
