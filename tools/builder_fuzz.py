"""Wide cross-engine BUILDER-program fuzz sweep
(keenwa_spark/builder_fuzz.py — VERDICT r09 item 4).

Usage:
    python tools/builder_fuzz.py [n_per_seed] [seed seed ...]

Defaults: 200 programs per seed, seeds 1-5. Exit 1 on any mismatch,
printing each offending program (builder-call trace + equivalent SQL)
with both engines' heads.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from keenwa_spark import conformance as cf
    from keenwa_spark.builder_fuzz import run_builder_fuzz
    from keenwa_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seeds = [int(s) for s in sys.argv[2:]] or [1, 2, 3, 4, 5]
    spark = get_spark("builder_fuzz")
    if os.environ.get("REGIME_SEED"):
        # compose with the optimizer-regime axis: same AQE x CBO x
        # broadcast grid as tests/test_conf_regimes.py / sql_fuzz.py
        import itertools
        import random as _random

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
        regime = _random.Random(int(os.environ["REGIME_SEED"])).choice(grid)
        for k, v in regime.items():
            spark.conf.set(k, v)
        print(f"# regime (seed {os.environ['REGIME_SEED']}): {regime}")
    cf.register_mini_catalog(spark)
    duck = cf.duckdb_mini_catalog()
    total_bad = 0
    for seed in seeds:
        mis = run_builder_fuzz(spark, duck, seed=seed, n=n)
        print(f"seed {seed}: {n} programs, {len(mis)} mismatches")
        for m in mis:
            print(json.dumps(m, default=str)[:900])
        total_bad += len(mis)
    print(f"TOTAL: {len(seeds) * n} programs, {total_bad} mismatches")
    sys.exit(1 if total_bad else 0)


if __name__ == "__main__":
    main()
