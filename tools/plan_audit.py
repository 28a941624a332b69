"""Refresh the plan-audit table in SCALE.md: executed-plan audit of
the bench headline suite at sf0.1.

Run: python tools/plan_audit.py   (replaces ONLY the audit table
in-place — the narrative sections of SCALE.md are hand-maintained and
preserved).

Each query is EXECUTED (collect) so the AQE-final plan is audited; the
GW column counts unbounded single-partition windows (plans.py
``partitionless_windows`` — limit-bounded global windows are exempt),
the same check the full-registry audit enforces.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLE_HEAD = "| query | BHJ | SMJ | NLJ | Cart | Exch | PyEval | GW | Pushed |"
OLD_HEAD = "| query | BHJ | SMJ | NLJ | Cart | Exch | PyEval | Pushed |"


def main() -> None:
    from bench import HEADLINE

    from keenwa_spark.plans import (
        executed_plan_text,
        partitionless_windows,
        summarize,
    )
    from keenwa_spark.queries import load_all
    from keenwa_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_audit")
    registry = load_all()

    rows = []
    for name in HEADLINE:
        df = registry[name].fn(spark, sf_dir)
        df.collect()
        s = summarize(df)
        gw = len(partitionless_windows(executed_plan_text(df)))
        rows.append(
            f"| {name} | {s.broadcast_joins} | {s.sort_merge_joins} | "
            f"{s.nested_loop_joins} | {s.cartesian_products} | {s.exchanges} | "
            f"{s.python_evals} | {gw} | {'yes' if s.pushed_filters else 'no'} |"
        )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"
    )
    text = open(path).read()
    head = TABLE_HEAD if TABLE_HEAD in text else OLD_HEAD
    start = text.index(head)
    end = text.index("\n\n", start)
    table = TABLE_HEAD + "\n|---|---|---|---|---|---|---|---|---|\n" + "\n".join(rows)
    with open(path, "w") as f:
        f.write(text[:start] + table + text[end:])
    print(f"updated audit table in {path} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
