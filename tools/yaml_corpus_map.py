"""Run the executed sweep of the reference's YAML test corpus and
write the committed mapping table (YAML_MAP.md).

Usage:
    python tools/yaml_corpus_map.py            # sweep + write map
    REGIME_SEED=1 python tools/yaml_corpus_map.py
        # run the whole sweep under one seeded optimizer regime
        # (same AQE x CBO x broadcast grid as tools/check_correctness
        # and tests/test_conf_regimes.py) — every lane must hold under
        # every physical-plan regime, not just the session defaults.
        # The map file is NOT rewritten under a regime (results only).
Exit 1 if any case fails its lane (so the sweep is a gate, like
tools/check_correctness.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from keenwa_spark.session import get_spark
    from keenwa_spark.yaml_sweep import load_reference_cases, run_sweep, write_map

    spark = get_spark()
    regime_seed = os.environ.get("REGIME_SEED")
    if regime_seed:
        import itertools
        import random

        grid = [
            {
                "spark.sql.adaptive.enabled": str(aqe).lower(),
                "spark.sql.cbo.enabled": str(cbo).lower(),
                "spark.sql.autoBroadcastJoinThreshold": bcast,
            }
            for aqe, cbo, bcast in itertools.product(
                (True, False), (True, False), ("-1", "10485760")
            )
        ]
        regime = random.Random(int(regime_seed)).choice(grid)
        for k, v in regime.items():
            spark.conf.set(k, v)
        print(f"# regime (seed {regime_seed}): {regime}")
    cases = load_reference_cases()
    results = run_sweep(spark)
    if not regime_seed:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "YAML_MAP.md")
        write_map(results, cases, path)
    fails = [r for r in results if r.status != "pass"]
    lanes: dict[str, int] = {}
    for r in results:
        lanes[r.lane] = lanes.get(r.lane, 0) + 1
    print(f"{len(results)} cases: " + ", ".join(f"{k}={v}" for k, v in sorted(lanes.items())))
    for r in fails:
        print(f"FAIL {r.uid} [{r.lane}] {r.detail}")
    if regime_seed:
        print(f"regime sweep: {len(fails)} failing (map not rewritten)")
    else:
        print(f"wrote {path}; {len(fails)} failing")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
