"""r14 streaming micro-bench (VERDICT r13 item 4): replay all 15 st_*
operators over the time-ordered chunked event stream at two
micro-batch rates and record sec/batch + state-store size per
operator. Writes STREAM_MICROBENCH_r14.json at the repo root.

Untimed-by-default: nothing here touches bench.py's timed region; the
numbers exist so streaming optimization claims become checkable.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/r14_stream_microbench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from keenwa_spark.session import get_spark
from keenwa_spark.streaming.microbench import (
    ALL_OPERATORS,
    check_bound,
    run_operator,
    state_bounds,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RATES = (4, 16)  # chunk counts -> ~n/4 and ~n/16 rows per micro-batch
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "STREAM_MICROBENCH_r14.json")


def main() -> None:
    spark = get_spark("r14_stream_microbench")
    bounds = state_bounds(spark, SF_DIR)
    result: dict = {"sf_dir": SF_DIR, "rates_chunks": list(RATES),
                    "bounds": bounds, "operators": {}}
    for name in ALL_OPERATORS:
        row: dict = {}
        for n_chunks in RATES:
            spark.sparkContext.setJobDescription(f"{name} @ {n_chunks} chunks")
            t0 = time.monotonic()
            m = run_operator(spark, name, SF_DIR, n_chunks)
            m["wall_sec"] = round(time.monotonic() - t0, 3)
            ok, limit = check_bound(m, bounds)
            m["state_bound"] = limit
            m["state_bound_ok"] = ok
            row[f"chunks_{n_chunks}"] = m
            print(
                f"{name:22s} chunks={n_chunks:2d} "
                f"batches={m['n_batches']:2d} "
                f"rows/batch={m['rows_per_batch']:6d} "
                f"sec/batch={m['sec_per_batch_median']} "
                f"state_rows={m.get('store_rows', m['state_rows'])} "
                f"bound={limit} ok={ok}"
            )
        result["operators"][name] = row
    spark.sparkContext.setJobDescription(None)
    bad = [
        n for n, r in result["operators"].items()
        if not all(v["state_bound_ok"] for v in r.values())
    ]
    result["all_bounds_ok"] = not bad
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(f"\nwrote {OUT}; bounds {'ALL OK' if not bad else 'VIOLATED: ' + str(bad)}")
    spark.stop()
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
