"""Pinned-seed cross-engine fuzz corpus (keenwa_spark/fuzz.py): every
generated query in the shared exact dialect must return identical
multisets on Spark and DuckDB — the executable upgrade of the
reference's seeded rule-order shuffle (src/testing.rs:57). Wider
sweeps: tools/sql_fuzz.py."""

from __future__ import annotations

import pytest

from keenwa_spark import conformance as cf
from keenwa_spark.fuzz import QueryGen, run_fuzz


@pytest.fixture(scope="module")
def mini(spark):
    cf.register_mini_catalog(spark)
    return spark


@pytest.fixture(scope="module")
def duck():
    con = cf.duckdb_mini_catalog()
    yield con
    con.close()


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fuzz_corpus_cross_engine(mini, duck, seed):
    mis = run_fuzz(mini, duck, seed=seed, n=60)
    assert mis == [], mis[:3]


def test_generator_is_deterministic():
    a = [QueryGen(7).query() for _ in range(20)]
    b = [QueryGen(7).query() for _ in range(20)]
    assert a == b


def test_generator_covers_major_shapes():
    """The grammar actually emits joins, grouping, set ops and
    subqueries (a generator silently collapsing to trivial selects
    would make the clean sweeps vacuous)."""
    gen = QueryGen(11)
    text = " ".join(gen.query() for _ in range(300))
    for shape in ("JOIN", "GROUP BY", "HAVING", "UNION", "EXISTS",
                  " IN (SELECT", "CASE WHEN", "BETWEEN", "DISTINCT"):
        assert shape in text, shape
