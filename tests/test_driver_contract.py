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
