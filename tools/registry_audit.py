"""Plan red-flag audit across EVERY registry query at sf0.01.

The headline audit (tools/plan_audit.py) watches the bench suite; this
sweeps the full registry for the scale landmines that disqualify a
plan regardless of its current runtime: CartesianProduct nodes,
row-at-a-time Python evals (BatchEvalPython — Arrow-batched
mapInPandas/ArrowEvalPython is the sanctioned Python path), and
global single-partition windows (a Window with an empty partition
spec funnels its whole input through ONE task) over inputs that are
not provably bounded.

Batch queries only — streaming (st_*) queries execute via a sink and
have no single executed plan to inspect. Each query is EXECUTED first
(collect) so AQE's final plan is audited, not the static guess.

Prints one line per offending query plus a summary; exit code 1 if any
Cartesian, row-wise-Python, or unallowlisted global-window offender
exists. The allowlists below document the intentional exceptions —
every global-window entry must name WHY its window input is bounded.

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

#: queries whose partitionless Window runs over a PROVABLY BOUNDED
#: input — name -> why the window input cannot grow with the corpus.
#: Anything not listed here that shows an empty partition spec fails
#: the audit (VERDICT r05 item 5: the check the docstring promised).
GLOBAL_WINDOW_OK: dict[str, str] = {}


def audit_flags(plan: str, name: str) -> list[str]:
    """Red flags for one executed-plan text (importable for tests)."""
    from keenwa_spark.plans import partitionless_windows

    flags = []
    if "CartesianProduct" in plan:
        flags.append(f"Cartesian x{plan.count('CartesianProduct')}")
    if "BatchEvalPython" in plan and name not in ARROW_PYTHON_OK:
        flags.append("row-wise PythonUDF")
    pw = partitionless_windows(plan)
    if pw and name not in GLOBAL_WINDOW_OK:
        flags.append(f"global single-partition Window x{len(pw)}")
    return flags


def main() -> None:
    from keenwa_spark.queries import load_all
    from keenwa_spark.session import get_spark

    registry = load_all()
    spark = get_spark("registry_audit")

    audited = 0
    offenders: list[str] = []
    for name, spec in registry.items():
        if name.startswith("st_"):
            continue
        df = spec.fn(spark, SF_DIR)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        audited += 1
        flags = audit_flags(plan, name)
        if flags:
            offenders.append(f"{name}: {', '.join(flags)}")

    for line in offenders:
        print(f"FLAG  {line}")
    print(
        f"# audited {audited} batch queries at {SF_DIR}: "
        f"{len(offenders)} flagged "
        f"(allowlists: {len(ARROW_PYTHON_OK)} python, "
        f"{len(GLOBAL_WINDOW_OK)} bounded-window)"
    )
    sys.exit(1 if offenders else 0)


if __name__ == "__main__":
    main()
