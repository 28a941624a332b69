"""Driver-contract invariants — run against the SHARED session.

The strongest invariant (engine works on a session it didn't build,
i.e. without session.py's configs) runs as a subprocess below with a
bare SparkSession; we also pin the contract shape and the
conf-independence of the catalog chokepoint.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys


def test_contract_shape(views):
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert "flagship_top_customers" in q
    # zero rows-only entries: everything is oracle-checked
    assert len(o) == len(q)


def test_catalog_sets_nanos_conf(views):
    from keenwa_spark.catalog import Catalog

    views.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    import os

    Catalog(views).register_dir(os.environ.get("SF_DIR", "/root/testdata/sf0.001"))
    assert views.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert views.table("events").count() > 0


def test_vanilla_session_subprocess():
    """Full driver simulation: a fresh process builds a BARE SparkSession
    (no engine configs) and runs entry + an events-touching query."""
    code = """
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
assert len(e.entry(spark).collect()) == 10
n = e.queries()["ev_type_rollup"](spark, "/root/testdata/sf0.001").count()
assert n == 5, n
print("DRIVER_SIM_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert "DRIVER_SIM_OK" in out.stdout, out.stderr[-2000:]


def test_registry_prefix_is_the_declared_rotation():
    """The driver's correctness gate records a bounded PREFIX of the
    registry (r2: first 50 entries). Since round 9 those slots are the
    EXPLICIT ``DRIVER_PREFIX`` tuple (sentinels + the round's
    never-witnessed rotation — VERDICT r08 item 2); pin the window to
    it exactly so a stray registration or import-order change can
    never silently evict a slot, and require that the bulk of the
    window is spent on entries WITHOUT a prior driver-file row."""
    import json

    from keenwa_spark.queries import DRIVER_PREFIX, load_all

    reg = load_all()
    names = list(reg)[:50]
    assert len(DRIVER_PREFIX) == 50
    assert len(set(DRIVER_PREFIX)) == 50
    assert names == list(DRIVER_PREFIX)
    # sentinels: one per §2 macro-family, every round (the TPC-H
    # sentinel may rotate among the r1-r8-witnessed q1/q3/q5/q10/q18
    # plus the in-window q6 — any full TPC-H row qualifies)
    for sentinel in ("flagship_top_customers", "join_inner",
                     "agg_group_having", "win_topn_per_group"):
        assert sentinel in names
    assert any(n.startswith("q") and n[1].isdigit() for n in names)
    # rotation discipline: >= 40 of the 50 slots go to entries with no
    # prior CORRECTNESS_r*.json row (falls back gracefully when the
    # witness files aren't checked out, e.g. a bare clone)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    witnessed: set[str] = set()
    for p in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(p) as f:
                witnessed |= set(json.load(f))
        except (OSError, ValueError):
            continue
    if witnessed:
        fresh = [n for n in DRIVER_PREFIX if n not in witnessed]
        # NOTE: this round's own CORRECTNESS file lands at round end
        # and makes every prefix entry "witnessed" — the discipline
        # check is meaningful only while rotating, so gate on it
        if len(fresh) > 0:
            assert len(fresh) >= 40, (
                f"only {len(fresh)} never-witnessed entries in the "
                "50-slot window — rotate harder (VERDICT r08 item 2)"
            )
