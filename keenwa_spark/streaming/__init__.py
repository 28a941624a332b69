"""Structured Streaming mirrors of the batch event operators.

keenwa has nothing here — its 'StreamingAggregate' is sort-based batch
aggregation, not stream processing (reference
src/operators/relational/physical/streaming_aggregate.rs:10; SURVEY §2
streaming note). This package is beyond-parity: the same event
analytics as ``queries/events.py``, expressed over an unbounded source
with watermarks — so a user can run one definition in both modes.

Design: sources are file streams (each micro-batch reads newly-arrived
files — the 100 TB ingest shape); aggregations use event-time windows
(``window``/``session_window``) with watermarks bounding state; tests
drive everything with ``Trigger.AvailableNow`` so results are finite
and comparable to the batch twin.
"""

from keenwa_spark.streaming.anomaly import stream_zscore_anomaly
from keenwa_spark.streaming.asof import asof_stream
from keenwa_spark.streaming.upsert import upsert_state_stream
from keenwa_spark.streaming.events import (
    dedup_stream,
    enrich_stream,
    interval_join_streams,
    ohlc_stream,
    read_event_stream,
    run_available_now,
    session_stats_stream,
    windowed_type_counts,
)

__all__ = [
    "asof_stream",
    "dedup_stream",
    "enrich_stream",
    "interval_join_streams",
    "ohlc_stream",
    "read_event_stream",
    "run_available_now",
    "session_stats_stream",
    "stream_zscore_anomaly",
    "upsert_state_stream",
    "windowed_type_counts",
]
