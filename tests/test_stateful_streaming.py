"""applyInPandasWithState operator: streaming state must equal the
batch aggregate after draining the stream."""

from __future__ import annotations

import os
import shutil

import pytest

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def event_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stateful_stream")
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), d / "part-000.parquet")
    return str(d)


def test_user_tracker_matches_batch(views, event_dir, tmp_path_factory):
    from keenwa_spark.streaming import read_event_stream
    from keenwa_spark.streaming.stateful import user_activity_tracker

    stream = user_activity_tracker(read_event_stream(views, event_dir))
    assert stream.isStreaming
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_state")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6), r.n_purchases)
        for r in views.table("user_state").collect()
    }
    batch = views.sql(
        """
        SELECT user_id, COUNT(*) AS n, ROUND(SUM(value), 6) AS tv,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS np
        FROM events GROUP BY user_id
        """
    ).collect()
    assert len(got) == len(batch) > 0
    for r in batch:
        assert got[r.user_id] == (r.n, r.tv, r.np)


def test_state_carries_across_batches(views, tmp_path_factory):
    """Two files arriving in one AvailableNow run = two micro-batches;
    the state store must accumulate across them (per-user totals equal
    the union, not the last batch)."""
    import pyspark.sql.functions as F

    from keenwa_spark.streaming import read_event_stream
    from keenwa_spark.streaming.stateful import user_activity_tracker

    d = tmp_path_factory.mktemp("two_batches")
    src = views.table("events")
    for i, half in enumerate(
        [src.filter("event_id % 2 = 0"), src.filter("event_id % 2 = 1")]
    ):
        tmp = str(d / f"w{i}")
        half.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.makedirs(d / "in", exist_ok=True)
        shutil.copy(os.path.join(tmp, part), d / "in" / f"f{i}.parquet")

    stream = user_activity_tracker(read_event_stream(views, str(d / "in")))
    ckpt = str(tmp_path_factory.mktemp("ckpt2"))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_state2")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink appends one snapshot per micro-batch;
    # keep the LAST (= max n_events) per user
    out = views.sql(
        """
        SELECT user_id, n_events FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY n_events DESC
          ) AS rn FROM user_state2
        ) WHERE rn = 1
        """
    ).collect()
    got = {r.user_id: r.n_events for r in out}
    expect = {
        r.user_id: r.n
        for r in views.sql(
            "SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id"
        ).collect()
    }
    assert got == expect
