"""Streaming mirrors must agree with their batch twins — the strongest
correctness statement available for streaming operators (keenwa can
assert nothing here; it has no streams at all)."""

from __future__ import annotations

import os
import shutil

import pytest

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def event_dir(tmp_path_factory):
    """File-stream source dir: the events parquet split into two 'arrival'
    files (two micro-batches under AvailableNow)."""
    d = tmp_path_factory.mktemp("event_stream")
    src = os.path.join(SF_DIR, "events.parquet")
    shutil.copy(src, d / "part-000.parquet")
    return str(d)


def test_windowed_counts_match_batch(views, event_dir):
    from keenwa_spark.streaming import (
        read_event_stream,
        run_available_now,
        windowed_type_counts,
    )

    stream = read_event_stream(views, event_dir)
    out = run_available_now(windowed_type_counts(stream, window="1 day"))
    got = {
        (str(r.win_start), r.event_type): (r.n_events, r.total_value)
        for r in out.collect()
    }
    batch = views.sql(
        """
        SELECT CAST(date_trunc('day', ts) AS STRING) AS d, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS tv
        FROM events GROUP BY 1, 2
        """
    ).collect()
    assert len(got) == len(batch) > 0
    for r in batch:
        assert got[(r.d, r.event_type)] == (r.n, r.tv)


def test_session_window_matches_batch_sessionize(views, event_dir):
    from keenwa_spark.queries import load_all
    from keenwa_spark.streaming import (
        read_event_stream,
        run_available_now,
        session_stats_stream,
    )

    stream = read_event_stream(views, event_dir)
    out = run_available_now(session_stats_stream(stream, gap="30 minutes"))
    stream_sessions = sorted(
        (r.user_id, r.n_events) for r in out.collect()
    )
    batch = load_all()["ev_sessionize"].fn(views, SF_DIR)
    batch_sessions = sorted((r.user_id, r.n_events) for r in batch.collect())
    assert stream_sessions == batch_sessions


def test_streaming_plan_is_stateful(views, event_dir):
    from keenwa_spark.streaming import read_event_stream, windowed_type_counts

    df = windowed_type_counts(read_event_stream(views, event_dir))
    assert df.isStreaming
    assert "window" in df.schema.simpleString() or "win_start" in df.columns
