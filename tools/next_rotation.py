"""Print the next round's DRIVER_PREFIX rotation block.

The driver's correctness gate witnesses exactly the first 50 registry
entries each round (keenwa_spark/queries/__init__.py DRIVER_PREFIX).
This tool computes which entries have NEVER appeared in any committed
CORRECTNESS_r*.json and emits a ready-to-paste prefix block: the 5
standing sentinels followed by up to 45 never-witnessed names (assuming
the CURRENT prefix gets witnessed by this round's driver run), then —
when the tail no longer fills the block — the least-recently-witnessed
entries, so coverage keeps cycling instead of freezing.

STALENESS MODE (VERDICT r12 item 4): once the never-witnessed tail is
closed (r12 — every registry entry holds >=1 driver-file row), the
fallback IS the policy: all 45 non-sentinel slots re-witness the
oldest-last-witness entries first, ties broken by registry order, so
the maximum witness age across the registry shrinks every round. The
header line reports which mode filled the block.

Usage:
    python tools/next_rotation.py          # names + counts
    python tools/next_rotation.py --block  # paste-ready python tuple body
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SENTINELS = (
    "flagship_top_customers",
    "join_inner",
    "agg_group_having",
    "win_topn_per_group",
    "q6_forecast_revenue",
)


def main() -> None:
    from keenwa_spark.queries import DRIVER_PREFIX, load_all

    last_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnum = int("".join(ch for ch in os.path.basename(path) if ch.isdigit()))
        for name in json.load(open(path)):
            last_round[name] = max(last_round.get(name, 0), rnum)
    cur_round = max(last_round.values(), default=0) + 1
    # assume the CURRENT prefix is witnessed by this round's driver run
    for name in DRIVER_PREFIX:
        last_round[name] = max(last_round.get(name, 0), cur_round)

    names = list(load_all())
    never = [n for n in names if n not in last_round and n not in SENTINELS]
    slots = 50 - len(SENTINELS)
    pick = never[:slots]
    if len(pick) < slots:
        stale = sorted(
            (n for n in names if n in last_round and n not in SENTINELS
             and n not in pick),
            key=lambda n: (last_round[n], names.index(n)),
        )
        pick += stale[: slots - len(pick)]

    if "--block" in sys.argv:
        for s in SENTINELS:
            print(f'    "{s}",')
        for n in pick:
            print(f'    "{n}",')
    else:
        mode = ("staleness (tail closed — oldest last-witness first)"
                if not never else "never-witnessed tail")
        print(f"registry {len(names)}; never-witnessed after the pending "
              f"round-{cur_round} driver run: {len(never)}; mode: {mode}")
        print(f"next rotation ({len(pick)} non-sentinel slots):")
        for n in pick:
            tag = "NEVER" if n in never else f"last r{last_round[n]}"
            print(f"  {n}  [{tag}]")


if __name__ == "__main__":
    main()
