"""Time EVERY registry query at sf0.1 — the long tail the headline
bench doesn't watch. Finds scale landmines hiding in non-headline
operators (a quadratic candidate set, an unbroadcast dim, a driver
collect) before a user does.

Prints per-query seconds sorted slowest-first, plus a summary line.

Usage: python tools/registry_bench.py  [SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1]
       SKIP=st_ python tools/registry_bench.py   # comma-separated prefixes
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SKIP = tuple(p for p in os.environ.get("SKIP", "").split(",") if p)


def main() -> None:
    from keenwa_spark.queries import load_all
    from keenwa_spark.session import get_spark

    registry = load_all()
    spark = get_spark("registry_bench")
    registry["get_scan"].fn(spark, SF_DIR).count()  # warm

    times: dict[str, float] = {}
    failed: list[str] = []
    for name, spec in registry.items():
        if SKIP and name.startswith(SKIP):
            continue
        t0 = time.time()
        try:
            spec.fn(spark, SF_DIR).count()
            times[name] = time.time() - t0
        except Exception as e:  # keep sweeping; report at the end
            failed.append(f"{name}: {type(e).__name__}: {e}")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{t:8.2f}s  {name}")
    if times:
        print(
            f"\n# {len(times)} queries, total {sum(times.values()):.1f}s, "
            f"slowest {max(times, key=times.get)} "
            f"{max(times.values()):.2f}s, failed {len(failed)}"
        )
    else:
        print(f"\n# 0 queries timed, failed {len(failed)}")
    for f in failed:
        print("FAILED", f)


if __name__ == "__main__":
    main()
