"""Plan red-flag audit across EVERY registry query at sf0.01.

The headline audit (tools/plan_audit.py) watches the bench suite; this
sweeps the full registry for the scale landmines that disqualify a
plan regardless of its current runtime: CartesianProduct nodes,
row-at-a-time Python evals (BatchEvalPython — Arrow-batched
mapInPandas/ArrowEvalPython is the sanctioned Python path), and
global single-partition windows over unbounded inputs.

Batch queries only — streaming (st_*) queries execute via a sink and
have no single executed plan to inspect. Each query is EXECUTED first
(collect) so AQE's final plan is audited, not the static guess.

Prints one line per offending query plus a summary; exit code 1 if any
Cartesian or row-wise-Python offender exists (the allowlist below
documents the intentional exceptions).

Usage: python tools/registry_audit.py  [SF_DIR=/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

#: queries whose Python eval nodes are the sanctioned Arrow-batched
#: decoders (mapInPandas), not row-at-a-time UDFs
ARROW_PYTHON_OK = {"pl_multimodal_decode"}


def main() -> None:
    from keenwa_spark.plans import summarize
    from keenwa_spark.queries import load_all
    from keenwa_spark.session import get_spark

    registry = load_all()
    spark = get_spark("registry_audit")

    audited = 0
    offenders: list[str] = []
    rowwise_python: list[str] = []
    cartesians: list[str] = []
    for name, spec in registry.items():
        if name.startswith("st_"):
            continue
        df = spec.fn(spark, SF_DIR)
        df.collect()
        s = summarize(df)
        plan = df._jdf.queryExecution().executedPlan().toString()
        audited += 1
        flags = []
        if s.cartesian_products:
            flags.append(f"Cartesian x{s.cartesian_products}")
            cartesians.append(name)
        if "BatchEvalPython" in plan and name not in ARROW_PYTHON_OK:
            flags.append("row-wise PythonUDF")
            rowwise_python.append(name)
        if flags:
            offenders.append(f"{name}: {', '.join(flags)}")

    for line in offenders:
        print(f"FLAG  {line}")
    print(
        f"# audited {audited} batch queries at {SF_DIR}: "
        f"{len(cartesians)} with CartesianProduct, "
        f"{len(rowwise_python)} with row-wise Python"
    )
    sys.exit(1 if (cartesians or rowwise_python) else 0)


if __name__ == "__main__":
    main()
