"""Driver-contract invariants — run against the SHARED session.

The strongest invariant (engine works on a session it didn't build,
i.e. without session.py's configs) runs as a subprocess below with a
bare SparkSession; we also pin the contract shape and the
conf-independence of the catalog chokepoint.
"""

from __future__ import annotations

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


def test_registry_prefix_is_survey_core_plus_rotation():
    """The driver's correctness gate records a bounded PREFIX of the
    registry (r2: first 50 entries). Guard the invariant that those
    slots hold the SURVEY §2 core PLUS the family-representative
    rotation (VERDICT r05 item 4: one TPC-H, one dedup, one ANN, one
    streaming twin, the headline rewrite, the builder scalar
    subquery) — a stray registration in a core module (or an
    import-order change) would silently evict conformance
    centerpieces from the driver window."""
    from keenwa_spark.queries import DRIVER_PREFIX_ROTATION, load_all

    names = list(load_all())[:50]
    core_prefixes = ("join_", "subq_", "win_", "expr_array", "bld_exists")
    core_exact = {
        "get_scan", "filter_select", "projection_exprs", "agg_group_having",
        "agg_global", "union_all_distinct", "intersect_all_distinct",
        "except_all_distinct", "distinct_plain", "distinct_on",
        "limit_offset", "order_mixed_dirs",
        "values_inline_join", "select_no_from", "cte_reuse", "derived_table",
        "wildcard_qualified", "flagship_top_customers", "subq_in_nulls_outer",
    } | set(DRIVER_PREFIX_ROTATION)
    for n in names:
        assert n in core_exact or n.startswith(core_prefixes), (
            f"non-core query {n!r} inside the driver's 50-entry window"
        )
    # the §2a join variants that remain in-window after the r8
    # rotation (join_right/join_using/natural moved out — each has an
    # in-window sibling on the same code path and r1-r7 driver rows)
    for required in ("join_inner", "join_left", "join_full",
                     "join_cross", "join_left_semi", "join_right_semi",
                     "join_anti"):
        assert required in names
    # the prefix-pattern check above can't catch a new win_*/subq_*
    # registration in a core module silently evicting the tail — pin
    # the exact last slots (the rotation block; 13 entries since r8
    # hoisted the six never-witnessed families)
    assert names[50 - len(DRIVER_PREFIX_ROTATION):50] == list(
        DRIVER_PREFIX_ROTATION
    )
