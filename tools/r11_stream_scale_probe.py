"""Round-11 streaming-state scale probe: does the watermark actually
BOUND state at 100x input?

Streams the same staged 1x/10x/100x events corpora as the batch
probes (tools/r10_scale100_probe.py staging; 100k -> 1M -> 10M rows
over a fixed 30-day span) through two stateful operators with
Trigger.AvailableNow, and records — straight from the committed
progress metrics (stateOperators.numRowsTotal), not from prose:

1. **windowed_type_counts** (1-day tumbling windows x event_type,
   2-hour watermark): state rows must stay ~= n_windows x n_types
   (30 x 5 = ~150) at EVERY scale — input grows 100x, state does not.

2. **dropDuplicatesWithinWatermark on event_id** (2-hour watermark):
   state = keys within the watermark horizon of the max event time.
   The corpus spans 30 days at every scale, so the horizon holds a
   ~constant FRACTION of rows per scale factor — state grows with the
   horizon's row density (linear in scale factor), NOT with total
   history: the point of the eviction is that a year of history
   costs the same as a day. Recorded so the growth law is explicit.

Streaming reads use the staged files as-is (one micro-batch per file
group under AvailableNow defaults); wall includes the full drain.

Run: python tools/r11_stream_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from r10_scale100_probe import stage_events  # noqa: E402

SCHEMA = ("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
          "event_type STRING, value DOUBLE, props STRING")


def _drain_with_state(stream_df, output_mode: str, sink: str = "memory"):
    """Drain with AvailableNow; return (output rows, final state rows).

    ``sink='noop'`` discards emitted rows executor-side — REQUIRED for
    high-output operators: the memory sink materializes every emitted
    row on the driver, and at 10M rows that sink dominates the wall
    by ~40x (first run of this probe measured 460s for a dedup whose
    noop-sink wall is seconds — the sink, not the operator). Output
    rows then come from the progress sink metrics."""
    name = f"sp_{uuid.uuid4().hex[:8]}"
    w = stream_df.writeStream.outputMode(output_mode).trigger(availableNow=True)
    if sink == "memory":
        q = w.format("memory").queryName(name).start()
    else:
        q = w.format("noop").start()
    q.awaitTermination()
    spark = stream_df.sparkSession
    if sink == "memory":
        n_out = spark.table(name).count()
        spark.catalog.dropTempView(name)
    else:
        n_out = sum(
            int((p.get("sink") or {}).get("numOutputRows") or 0)
            for p in q.recentProgress
        )
    state_rows = None
    for p in reversed(q.recentProgress):
        ops = p.get("stateOperators") or []
        if ops and ops[0].get("numRowsTotal") is not None:
            state_rows = ops[0]["numRowsTotal"]
            break
    return n_out, state_rows


def main() -> None:
    from keenwa_spark.session import get_spark
    from keenwa_spark.streaming import dedup_stream, windowed_type_counts

    spark = get_spark("r11_stream_scale_probe")
    print("## streaming state at scale (1x/10x/100x = 100k/1M/10M events, 30-day span)")
    for factor in (1, 10, 100):
        path = stage_events(spark, factor)

        src = spark.readStream.schema(SCHEMA).parquet(path)
        t0 = time.time()
        out = windowed_type_counts(src, window="1 day", watermark="2 hours")
        n_out, st = _drain_with_state(out, "complete")
        w_wall = time.time() - t0

        src2 = spark.readStream.schema(SCHEMA).parquet(path)
        t0 = time.time()
        ded = dedup_stream(src2, keys=["event_id"], watermark="2 hours")
        n_dd, st_dd = _drain_with_state(ded, "append", sink="noop")
        d_wall = time.time() - t0

        print(
            f"{factor}x: windowed wall {w_wall:.2f}s out_rows {n_out} "
            f"state_rows {st} | dedup wall {d_wall:.2f}s out_rows {n_dd} "
            f"state_rows {st_dd}"
        )


if __name__ == "__main__":
    main()
