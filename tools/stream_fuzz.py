"""Wide STREAMING fuzz sweep (keenwa_spark/stream_fuzz.py — random
micro-batch boundaries, out-of-order event time, at-least-once batch
replays, and watermark-late data over the st_* streaming operators;
stream == batch == oracle, with a bounds law for the one-sided
late-data contract).

Usage:
    python tools/stream_fuzz.py [n_per_seed] [seed seed ...]
    python tools/stream_fuzz.py --family=ck [n_per_seed] [seed ...]
        # dedicated sweep of one family prefix (e.g. the kill-restart
        # recovery family "ck") — the generator stays seed-
        # deterministic; non-matching draws are skipped, not run.

Defaults: 100 cases per seed, seeds 1-5. Exit 1 on any mismatch.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import duckdb

    from keenwa_spark.session import get_spark
    from keenwa_spark.stream_fuzz import run_stream_fuzz

    args = sys.argv[1:]
    family = None
    if args and args[0].startswith("--family="):
        family = args.pop(0).split("=", 1)[1]
    n = int(args[0]) if args else 100
    seeds = [int(s) for s in args[1:]] or [1, 2, 3, 4, 5]
    spark = get_spark("stream_fuzz")
    duck = duckdb.connect()
    total_bad = 0
    for seed in seeds:
        mis = run_stream_fuzz(spark, duck, seed=seed, n=n,
                              only_prefix=family)
        print(f"seed {seed}: {n} cases, {len(mis)} mismatches", flush=True)
        for m in mis:
            print(json.dumps(m, default=str)[:900])
        total_bad += len(mis)
    print(f"TOTAL: {len(seeds) * n} cases, {total_bad} mismatches")
    sys.exit(1 if total_bad else 0)


if __name__ == "__main__":
    main()
