"""Degenerate-input sweep: generate adversarial twins of the testdata
tables and run the FULL registry oracle gate over each.

Twins (from BASE, default /root/testdata/sf0.001):
- empty: 0-row parquet, same schemas — empty-input semantics
  (super-aggregates, fold inits, trainer behavior on nothing);
- one:   first row of every table — n=1 statistics (sample variance,
  1xk contingency, one-sided splits), under-filled sketches;
- nulls: every non-key column NULL (join keys kept real) — NULL
  propagation through UDFs, null-unsafe joins, NULL-group handling,
  cross-engine NULL-quirk parity (split_part, list_sum, string_agg);
- dup:   every row twice with FRESH ids for id-keyed tables
  (duplicate CONTENT, preserving the documented id-uniqueness
  preconditions) — dedup paths, tie-breaks, accumulation shapes.

Expected failures are pinned below: the known Spark grouping-sets
empty-input divergence (tests/test_fuzz.py pin) and the IVF trainer's
documented loud error on an empty/all-NULL corpus. Anything else is a
regression and exits 1. Round-7 first run of this axis found 30+ real
issues (see COVERAGE.md "Degenerate-input sweeps").

Usage:
    python tools/degenerate_sweep.py [empty one nulls dup]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("DEGEN_BASE", "/root/testdata/sf0.001")
STAGE = "/tmp/keenwa_degen"

#: id column per table for the dup twin (None = leave table as-is)
IDS = {
    "events": "event_id", "documents": "doc_id", "embeddings": "vec_id",
    "orders": "o_orderkey", "customer": "c_custkey",
    "supplier": "s_suppkey", "part": "p_partkey",
    "nation": None, "region": None, "lineitem": None,
}
#: join/key columns kept real in the nulls twin
KEEP = {
    "region": ["r_regionkey"], "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"], "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    "events": ["event_id", "user_id"], "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: (twin -> {query: reason}) — failures that ARE the documented contract
EXPECTED = {
    "empty": {
        "agg_grouping_sets": "pinned Spark bug: () set dropped on empty",
        "agg_rollup_hierarchy": "pinned Spark bug: () set dropped on empty",
        "agg_cube_grouping_id": "pinned Spark bug: () set dropped on empty",
        "pl_ann_ivf_topk": "documented loud trainer error on empty corpus",
        "pl_ann_pq_adc_topk": "documented loud trainer error on empty corpus",
        "pl_ann_pq_refined_topk": "documented loud trainer error on empty corpus",
        "pl_ann_ivfpq_topk": "documented loud trainer error on empty corpus",
        "pl_ann_ivfpq_refined_topk": "documented loud trainer error on empty corpus",
        "pl_ann_lopq_topk": "documented loud trainer error on empty corpus",
        "pl_ann_lopq_refined_topk": "documented loud trainer error on empty corpus",
    },
    "one": {
        "agg_rollup_hierarchy": "pinned Spark bug via join-emptied input",
    },
    "nulls": {
        "pl_ann_ivf_topk": "documented loud trainer error (all vectors NULL)",
        "pl_ann_pq_adc_topk": "documented loud trainer error (all vectors NULL)",
        "pl_ann_pq_refined_topk": "documented loud trainer error (all vectors NULL)",
        "pl_ann_ivfpq_topk": "documented loud trainer error (all vectors NULL)",
        "pl_ann_ivfpq_refined_topk": "documented loud trainer error (all vectors NULL)",
        "pl_ann_lopq_topk": "documented loud trainer error (all vectors NULL)",
        "pl_ann_lopq_refined_topk": "documented loud trainer error (all vectors NULL)",
    },
    "dup": {},
}


def make_twin(kind: str) -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    dst = os.path.join(STAGE, kind)
    os.makedirs(dst, exist_ok=True)
    for f in sorted(os.listdir(BASE)):
        if not f.endswith(".parquet"):
            continue
        name = f[:-8]
        t = pq.read_table(os.path.join(BASE, f))
        if kind == "empty":
            out = t.schema.empty_table()
        elif kind == "one":
            out = t.slice(0, 1)
        elif kind == "nulls":
            cols = [
                t.column(i)
                if fld.name in KEEP.get(name, [])
                else pa.nulls(len(t), type=fld.type)
                for i, fld in enumerate(t.schema)
            ]
            out = pa.table(cols, schema=t.schema)
        elif kind == "dup":
            idc = IDS.get(name)
            if idc is None:
                out = t
            else:
                cols = [
                    pc.add(t.column(i), 10_000_000)
                    if fld.name == idc
                    else t.column(i)
                    for i, fld in enumerate(t.schema)
                ]
                out = pa.concat_tables([t, pa.table(cols, schema=t.schema)])
        else:
            raise ValueError(kind)
        pq.write_table(out, os.path.join(dst, f))
    return dst


def main() -> int:
    kinds = sys.argv[1:] or ["empty", "one", "nulls", "dup"]
    bad = 0
    for kind in kinds:
        sf_dir = make_twin(kind)
        proc = subprocess.run(
            [sys.executable, "tools/check_correctness.py"],
            env={**os.environ, "SF_DIR": sf_dir},
            capture_output=True, text=True,
        )
        last = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
        m = re.search(r"FAILED(?::\s*(.*))?$", last)
        failed = set((m.group(1) or "").split()) if m else set()
        expected = set(EXPECTED[kind])
        unexpected = failed - expected
        missing = expected - failed
        status = "OK" if not unexpected and not missing else "REGRESSION"
        print(f"{kind}: {last}  [{status}]")
        if unexpected:
            print(f"  UNEXPECTED failures: {sorted(unexpected)}")
            bad += 1
        if missing:
            print(f"  expected-but-absent (contract changed?): {sorted(missing)}")
            bad += 1
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
