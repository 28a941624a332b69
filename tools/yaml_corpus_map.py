"""Run the executed sweep of the reference's YAML test corpus and
write the committed mapping table (YAML_MAP.md).

Usage:
    python tools/yaml_corpus_map.py            # sweep + write map
    python tools/yaml_corpus_map.py --all-regimes
        # run the FULL 328-case sweep under every one of the 8
        # optimizer regimes (AQE x CBO x broadcast grid — the same
        # grid check_correctness.py and tests/test_conf_regimes.py
        # sample from), then a final default-regime pass that writes
        # the map with the all-regimes record in its header (VERDICT
        # r11 item 6: widen the regime coverage 3 -> 8, deterministic
        # enumeration instead of seed sampling).
    REGIME_SEED=1 python tools/yaml_corpus_map.py
        # legacy single-regime mode: one seed-sampled regime, map not
        # rewritten (results only).
Exit 1 if any case fails its lane (so the sweep is a gate, like
tools/check_correctness.py).
"""

from __future__ import annotations

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the full 2x2x2 grid, in a fixed order so "--all-regimes" is an
#: enumeration, not a sample.
REGIME_GRID = [
    {
        "spark.sql.adaptive.enabled": str(aqe).lower(),
        "spark.sql.cbo.enabled": str(cbo).lower(),
        "spark.sql.autoBroadcastJoinThreshold": bcast,
    }
    for aqe, cbo, bcast in itertools.product(
        (True, False), (True, False), ("-1", "10485760")
    )
]


def _apply(spark, regime: dict) -> None:
    for k, v in regime.items():
        spark.conf.set(k, v)


def main() -> int:
    from keenwa_spark.session import get_spark
    from keenwa_spark.yaml_sweep import load_reference_cases, run_sweep, write_map

    spark = get_spark()
    map_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "YAML_MAP.md")
    cases = load_reference_cases()

    if "--all-regimes" in sys.argv:
        defaults = {k: spark.conf.get(k) for k in REGIME_GRID[0]}
        regime_fails = 0
        for i, regime in enumerate(REGIME_GRID):
            _apply(spark, regime)
            results = run_sweep(spark)
            fails = [r for r in results if r.status != "pass"]
            regime_fails += len(fails)
            tag = ",".join(f"{k.rsplit('.', 2)[-1]}={v}" for k, v in regime.items())
            print(f"regime {i + 1}/8 [{tag}]: {len(results)} cases, {len(fails)} failing")
            for r in fails:
                print(f"  FAIL {r.uid} [{r.lane}] {r.detail}")
        _apply(spark, defaults)
        results = run_sweep(spark)
        fails = [r for r in results if r.status != "pass"]
        note = (
            f"All-regimes record: the full {len(results)}-case sweep re-ran under "
            f"every one of the 8 optimizer regimes (AQE x CBO x broadcast "
            f"off/default — `tools/yaml_corpus_map.py --all-regimes`): "
            + ("0 failures under all 8 regimes plus the default session."
               if not (regime_fails or fails)
               else f"{regime_fails} regime failures, {len(fails)} default failures."))
        write_map(results, cases, map_path, regimes_note=note)
        print(f"wrote {map_path}; default pass {len(fails)} failing, "
              f"regime passes {regime_fails} failing")
        return 1 if (fails or regime_fails) else 0

    regime_seed = os.environ.get("REGIME_SEED")
    if regime_seed:
        import random

        regime = random.Random(int(regime_seed)).choice(REGIME_GRID)
        _apply(spark, regime)
        print(f"# regime (seed {regime_seed}): {regime}")
    results = run_sweep(spark)
    if not regime_seed:
        write_map(results, cases, map_path)
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
        print(f"wrote {map_path}; {len(fails)} failing")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
