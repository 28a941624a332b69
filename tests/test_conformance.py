"""Executable conformance corpus — the reference's golden-test layer,
upgraded from plan-text assertions to actual cross-engine execution.

Reference model: 17 YAML files of ok/error cases over the tiny catalog
``a, b, c, ab`` (src/sql/mod.rs:1432-1443; runner.rs:9-80). Keenwa can
only assert plan text; we run every ok-case on BOTH Spark and DuckDB
and compare canonicalized results, and assert every error-case is
rejected by the analyzer (error CLASS, not message text — SURVEY §7
risk 6).
"""

from __future__ import annotations

import pytest

from keenwa_spark import conformance as cf
from keenwa_spark import dialect
from keenwa_spark.errors import NotSupportedError


@pytest.fixture(scope="module")
def mini(spark):
    cf.register_mini_catalog(spark)
    return spark


@pytest.fixture(scope="module")
def duck():
    con = cf.duckdb_mini_catalog()
    yield con
    con.close()


@pytest.mark.parametrize("case", cf.CORPUS, ids=[c.id for c in cf.CORPUS])
def test_corpus_cross_engine(mini, duck, case):
    got, want = cf.run_case(mini, duck, case)
    assert got == want, f"{case.id}: spark={got[:5]}... duck={want[:5]}..."


@pytest.mark.parametrize(
    "case",
    [c for c in cf.CORPUS if c.strict],
    ids=[c.id for c in cf.CORPUS if c.strict],
)
def test_corpus_strict_cases_pass_dialect_gate(case):
    """Every strict-marked corpus query is inside keenwa's dialect
    (reference accept matrix) — the strict validator must accept it."""
    if case.sql.upper().startswith(("VALUES", "TABLE")):
        pytest.skip("bare VALUES/TABLE statement forms are Spark-side entry points")
    dialect.validate(case.sql, strict=True)


@pytest.mark.parametrize("case", cf.ERROR_CORPUS, ids=[c.id for c in cf.ERROR_CORPUS])
def test_error_corpus_rejected(mini, case):
    """Reference error-cases through the ENGINE entry point (VERDICT
    r06 missing item 1): a strict Engine.sql must reject every case —
    gate=True cases with the dialect's NotSupportedError (keenwa
    rejects at build time; Spark would accept), everything else with
    Spark's AnalysisException. We assert the error class, never
    message text (SURVEY §7 risk 6)."""
    from pyspark.errors import AnalysisException

    from keenwa_spark.engine import Engine

    eng = Engine(mini, strict=True)
    exc = NotSupportedError if case.gate else AnalysisException
    with pytest.raises(exc):
        eng.sql(case.sql).collect()


def test_error_corpus_covers_reference_rejection_families():
    """≥1 executable error row per reference rejection family
    (src/sql/mod.rs rejection sites; VERDICT r06 done-criterion:
    ≥12 dialect error cases)."""
    ids = {c.id for c in cf.ERROR_CORPUS}
    assert ids >= {
        "err_recursive_cte", "err_grouping_sets", "err_group_by_cube",
        "err_group_by_rollup", "err_lateral", "err_unnest",
        "err_fetch_first", "err_nulls_first", "err_named_window",
        "err_window_frame", "err_window_order_by",
        "err_compound_identifier", "err_within_group",
        "err_slice_stride", "err_dml_insert", "err_ddl_create",
        "err_cte_dml_bypass",
    }
    assert len([c for c in cf.ERROR_CORPUS if c.family == "dialect"]) >= 12


def test_corpus_covers_every_reference_family():
    """The corpus spans every reference YAML family (SURVEY §5.1)."""
    families = {c.family for c in cf.CORPUS}
    assert families >= {
        "basic",
        "aggregate",
        "window",
        "joins",
        "setops",
        "cte",
        "subq",
        "expr",
        "interval",
        "values",
    }
    assert len(cf.CORPUS) >= 90
