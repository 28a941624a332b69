"""Wide sweep of the strict-mode 3VL IN-projection rewrite
(keenwa_spark/in3vl_fuzz.py): random projected IN-subqueries through
Engine(strict=True) — validate + rewrite_strict + Catalyst — compared
against DuckDB running the ORIGINAL text (native standard 3VL).

Usage:
    python tools/in3vl_fuzz.py [--nested] [n_per_seed] [seed seed ...]

Defaults: 100 cases per seed, seeds 1-5. Exit 1 on any mismatch.
``--nested`` switches to the nested-projected-IN grammar (IN inside
another projected IN's subquery body / lhs — VERDICT r12 item 1).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from keenwa_spark.conformance import duckdb_mini_catalog
    from keenwa_spark.in3vl_fuzz import run_in3vl_fuzz
    from keenwa_spark.session import get_spark

    argv = sys.argv[1:]
    nested = "--nested" in argv
    argv = [a for a in argv if a != "--nested"]
    n = int(argv[0]) if argv else 100
    seeds = [int(s) for s in argv[1:]] or [1, 2, 3, 4, 5]
    spark = get_spark("in3vl_fuzz")
    duck = duckdb_mini_catalog()
    total_bad = 0
    for seed in seeds:
        mis = run_in3vl_fuzz(spark, duck, seed=seed, n=n, nested=nested)
        print(f"seed {seed}: {n} cases, {len(mis)} mismatches", flush=True)
        for m in mis:
            print(json.dumps(m, default=str)[:600])
        total_bad += len(mis)
    print(f"TOTAL: {len(seeds) * n} cases, {total_bad} mismatches")
    sys.exit(1 if total_bad else 0)


if __name__ == "__main__":
    main()
