"""Dialect accept/reject matrix — mirrors the reference's error-case
YAML corpus (reference src/sql/basic_tests.yaml:47-57 pattern and the
rejection list in src/sql/mod.rs). Per SURVEY §7 risk 6 we assert the
error CLASS, never exact message text.
"""

from __future__ import annotations

import pytest

from keenwa_spark import dialect
from keenwa_spark.errors import NotSupportedError

ACCEPT = [
    "SELECT 1",
    "SELECT a1 FROM a WHERE a1 > 1",
    "WITH t AS (SELECT 1 AS x) SELECT x FROM t",
    "SELECT * FROM (VALUES (1, 2)) AS t(a, b)",
    "VALUES (1), (2)",
    "SELECT a1 FROM a UNION ALL SELECT b1 FROM b",
    "SELECT count(*) FROM a GROUP BY a1 HAVING count(*) > 1",
    "SELECT row_number() OVER (PARTITION BY a1 ORDER BY a2) FROM a",
    "-- leading comment\nSELECT 1",
    "SELECT 'INSERT INTO literal is fine'",
]

REJECT_ALWAYS = [
    # statement-level (reference build_statement, sql/mod.rs:102-144)
    "INSERT INTO t VALUES (1)",
    "UPDATE t SET x = 1",
    "DELETE FROM t WHERE x = 1",
    "MERGE INTO t USING s ON t.id = s.id WHEN MATCHED THEN DELETE",
    "CREATE TABLE t (x INT)",
    "DROP TABLE t",
    "ALTER TABLE t ADD COLUMN y INT",
    "TRUNCATE TABLE t",
    "SET spark.sql.shuffle.partitions = 1",
    "SHOW TABLES",
    "DESCRIBE t",
    "ANALYZE TABLE t COMPUTE STATISTICS",
    "EXPLAIN SELECT 1",
    "CALL proc()",
    # recursive CTE (reference sql/mod.rs:210)
    "WITH RECURSIVE r AS (SELECT 1) SELECT * FROM r",
    # CTE-prefixed DML bypass (ADVICE r01)
    "WITH t AS (SELECT 1) INSERT INTO tgt SELECT * FROM t",
    "WITH t AS (SELECT 1) DELETE FROM tgt",
    # garbage head
    "FROB the database",
    "",
    "   ",
]

REJECT_STRICT = [
    # reference rejections inside SELECT (SURVEY §2c notable rejections)
    ("SELECT a1 FROM a GROUP BY GROUPING SETS ((a1))", "grouping sets"),
    ("SELECT a1 FROM a GROUP BY CUBE (a1)", "cube"),
    ("SELECT a1 FROM a GROUP BY ROLLUP (a1)", "rollup"),
    ("SELECT * FROM a, LATERAL (SELECT a1) t", "lateral"),
    ("SELECT * FROM UNNEST(ARRAY[1,2])", "unnest"),
    ("SELECT a1 FROM a FETCH FIRST 5 ROWS ONLY", "fetch"),
    ("SELECT a1 FROM a ORDER BY a1 NULLS FIRST", "nulls first"),
    ("SELECT sum(a1) OVER w FROM a WINDOW w AS (PARTITION BY a2)", "named window"),
    (
        "SELECT sum(a1) OVER (ORDER BY a2 ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM a",
        "frame",
    ),
    # window ORDER BY without a frame (reference sql/mod.rs:1339 — only
    # OVER (PARTITION BY ...) is accepted)
    ("SELECT sum(a1) OVER (PARTITION BY a2 ORDER BY a3) FROM a", "window order by"),
    # 3+-part compound identifier expression (reference sql/mod.rs:610)
    ("SELECT cat.schema1.a1 FROM a", "compound identifier"),
    # WITHIN GROUP ordered-set aggregate (reference sql/mod.rs:1230)
    (
        "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY a1) FROM a",
        "within group",
    ),
    # array slice with stride (reference scalar/expr.rs:93-98): Spark's
    # slice() has no stride — explicit strict rejection, not silence
    (
        "SELECT arr[1:10:2] FROM a",
        "stride",
    ),
]


@pytest.mark.parametrize("sql", ACCEPT)
def test_accept(sql):
    dialect.validate(sql)  # must not raise
    dialect.validate(sql, strict=True) if "OVER (PARTITION" not in sql else None


@pytest.mark.parametrize("sql", REJECT_ALWAYS)
def test_reject_always(sql):
    with pytest.raises(NotSupportedError):
        dialect.validate(sql)


@pytest.mark.parametrize("sql,label", REJECT_STRICT)
def test_reject_strict_only(sql, label):
    with pytest.raises(NotSupportedError):
        dialect.validate(sql, strict=True)
    # default (non-strict) mode ACCEPTS the Spark-native superset
    dialect.validate(sql)


def test_literals_do_not_false_trigger():
    dialect.validate("SELECT 'WITH RECURSIVE inside a string' AS s")
    dialect.validate("SELECT 'GROUPING SETS' AS s", strict=True)
    dialect.validate("/* INSERT INTO comment */ SELECT 1")


def test_backslash_escaped_literals_do_not_leak(views):
    """Spark accepts backslash-escaped quotes by default; a literal like
    'don\\'t INSERT INTO t' must not terminate the literal early and
    leak its tail into the keyword scan (ADVICE r02) — and the doubled
    form must keep working too."""
    dialect.validate("SELECT 'don\\'t INSERT INTO t' AS s")
    dialect.validate("SELECT 'don''t INSERT INTO t' AS s")
    dialect.validate("SELECT 'a\\\\' AS s, 'INSERT literal' AS t")
    # the two escape conventions agree with Spark's own parser
    assert views.sql("SELECT 'don\\'t' AS s").collect()[0].s == "don't"
    # real DML after a backslash-escaped literal is still caught
    with pytest.raises(NotSupportedError):
        dialect.validate("WITH t AS (SELECT 'don\\'t' AS s) INSERT INTO tgt SELECT * FROM t")


# ---------------------------------------------------------------------------
# Strict-mode 3VL rewrite for SELECT-list IN-subqueries (VERDICT r11 item 5)
# ---------------------------------------------------------------------------


def test_rewrite_strict_targets_only_projected_in_subqueries():
    # WHERE/HAVING/ON context: Spark already plans standard null-aware
    # joins — text must come back byte-identical.
    for sql in [
        "SELECT a1 FROM a WHERE a1 IN (SELECT b1 FROM b)",
        "SELECT a1 FROM a WHERE a1 NOT IN (SELECT b1 FROM b)",
        "SELECT a1, sum(a3) AS s FROM a GROUP BY a1 HAVING sum(a3) IN (SELECT b3 FROM b)",
        "SELECT a.a1 FROM a JOIN b ON a.a1 = b.b1 AND b.b2 IN (SELECT c2 FROM c)",
        "SELECT a1, a2 IN (1, 2, 3) AS x FROM a",        # IN-list, not subquery
        "SELECT 'a2 IN (SELECT 1)' AS s FROM a",          # inside a literal
    ]:
        assert dialect.rewrite_strict(sql) == sql, sql
    # projected IN-subquery gets the CASE expansion (both polarities)
    out = dialect.rewrite_strict("SELECT a2 IN (SELECT b2 FROM b) AS i FROM a")
    assert "CASE WHEN (a2) IN (SELECT b2 FROM b) THEN true" in out
    assert "CAST(NULL AS BOOLEAN)" in out
    out = dialect.rewrite_strict("SELECT a2 NOT IN (SELECT b2 FROM b) AS i FROM a")
    assert "THEN false" in out and "ELSE true END)" in out
    # a subquery's own WHERE-IN stays raw even when the subquery is projected
    sql = ("SELECT a1, (SELECT count(*) FROM b WHERE b1 IN (SELECT c1 FROM c)) AS n "
           "FROM a")
    assert dialect.rewrite_strict(sql) == sql


def test_rewrite_strict_rejects_ambiguous_operand_chains():
    with pytest.raises(NotSupportedError, match="parenthesize"):
        dialect.rewrite_strict("SELECT a1 + a2 IN (SELECT b2 FROM b) AS x FROM a")
    # parenthesized form is fine
    out = dialect.rewrite_strict("SELECT (a1 + a2) IN (SELECT b2 FROM b) AS x FROM a")
    assert "CASE WHEN ((a1 + a2)) IN" in out
    # a bare CASE lhs would backward-scan to just "END" and splice
    # garbage (same corruption class as the r12 nested-edit bug) —
    # must hit the documented parenthesize-it rejection instead
    with pytest.raises(NotSupportedError, match="parenthesize"):
        dialect.rewrite_strict(
            "SELECT CASE WHEN a1 = 1 THEN a2 END IN (SELECT b2 FROM b) "
            "AS x FROM a")
    out = dialect.rewrite_strict(
        "SELECT (CASE WHEN a1 = 1 THEN a2 END) IN (SELECT b2 FROM b) "
        "AS x FROM a")
    assert "CASE WHEN ((CASE WHEN a1 = 1 THEN a2 END)) IN" in out


def test_strict_engine_in_projection_matches_duckdb_without_oracle_rewrite(views):
    """The VERDICT r11 item-5 'done' criterion: the pinned conformance
    divergence (SUBQ — Spark FALSE for NULL lhs / NULL-in-list
    no-match) passes cross-engine in strict mode with the PLAIN DuckDB
    text as oracle. Raw Spark default stays pinned in conformance.py."""
    from keenwa_spark import conformance as cf
    from keenwa_spark.engine import Engine

    cf.register_mini_catalog(views)
    duck = cf.duckdb_mini_catalog()
    eng = Engine(views, strict=True)
    for sql in [
        "SELECT a1, a2 IN (SELECT b2 FROM b) AS inb FROM a",
        "SELECT a1, a2 NOT IN (SELECT b2 FROM b) AS nb FROM a",
        "SELECT a1, a2 IN (SELECT b2 FROM b WHERE 1 = 0) AS inb FROM a",
        "SELECT a1, a2 IN (SELECT CASE WHEN b1 = 1 THEN NULL ELSE b2 END FROM b) AS inb FROM a",
        "SELECT a1, a2 NOT IN (SELECT CASE WHEN b1 = 1 THEN NULL ELSE b2 END FROM b) AS nb FROM a",
        "SELECT a1, coalesce(a2 IN (SELECT b2 FROM b), false) AS c FROM a",
    ]:
        got = cf.canon_rows([tuple(r) for r in eng.sql(sql).collect()], False)
        want = cf.canon_rows(duck.execute(sql).fetchall(), False)
        assert got == want, sql


@pytest.mark.parametrize("seed", [1, 2])
def test_in3vl_rewrite_fuzz_corpus(views, seed):
    """Seeded shape-coverage fuzz of the strict 3VL IN-projection
    rewrite (keenwa_spark/in3vl_fuzz.py): random lhs forms (qualified
    names, function calls, parenthesized arithmetic, NULL casts),
    polarity, nesting (COALESCE/CASE/multiple-IN/IS NULL observers),
    empty / NULL-bearing / correlated subqueries, plus WHERE-context
    INs that must stay untouched — strict Engine == DuckDB on the
    original text, exactly. Wide sweeps: tools/in3vl_fuzz.py."""
    import duckdb

    from keenwa_spark.conformance import duckdb_mini_catalog
    from keenwa_spark.in3vl_fuzz import run_in3vl_fuzz

    duck = duckdb_mini_catalog()
    mis = run_in3vl_fuzz(views, duck, seed=seed, n=25)
    assert mis == [], mis[:3]


def test_rewrite_strict_nested_projected_in_is_balanced():
    """VERDICT r12 What's-wrong #1: a projected IN nested inside
    another's subquery body used to be spliced against stale offsets,
    producing unbalanced garbage. Now only outermost edits splice and
    their captured lhs/q text is rewritten recursively."""
    repro = "SELECT a1 IN (SELECT b1 IN (SELECT c1 FROM c) FROM b) AS v FROM a"
    out = dialect.rewrite_strict(repro)
    assert out.count("(") == out.count(")")
    # both levels expanded: outer over the rewritten body, inner inside
    assert out.count("CASE WHEN") >= 4 and "__kw_q(__kw_c)" in out
    # triple nesting and lhs-side nesting stay balanced too
    for sql in [
        "SELECT a1 NOT IN (SELECT b1 IN (SELECT c1 IN (SELECT 1) FROM c) "
        "FROM b) AS v FROM a",
        "SELECT (SELECT (min(b1) = 2) IN (SELECT c1 = 3 FROM c) FROM b) "
        "IN (SELECT b1 = 1 FROM b) AS v FROM a",
    ]:
        out = dialect.rewrite_strict(sql)
        assert out.count("(") == out.count(")"), sql


def test_strict_engine_nested_projected_in_matches_duckdb(views):
    """The judge's r12 repro (boolean-typed so values compare) must
    return DuckDB's standard-3VL answer under Engine(strict=True)."""
    from keenwa_spark import conformance as cf
    from keenwa_spark.engine import Engine

    cf.register_mini_catalog(views)
    duck = cf.duckdb_mini_catalog()
    eng = Engine(views, strict=True)
    for sql in [
        # the judge's shape, boolean lhs at each level
        "SELECT a1, (a1 = 1) IN (SELECT (b1 = 2) IN (SELECT c1 = 3 FROM c) "
        "FROM b) AS v FROM a",
        # NULL-bearing at both levels, outer negated
        "SELECT a1, CAST(NULL AS BOOLEAN) NOT IN "
        "(SELECT (b1 = 6) IN (SELECT CASE WHEN c1 IS NULL THEN NULL "
        "ELSE c1 = 1 END FROM c) FROM b) AS v FROM a",
        # inner negated, empty innermost
        "SELECT a1, (a2 > 15) IN (SELECT (b3 > 20) NOT IN "
        "(SELECT c1 = 3 FROM c WHERE 1 = 0) FROM b) AS v FROM a",
        # lhs-side nesting: scalar subquery projecting an IN
        "SELECT a1, (SELECT (min(b1) = 2) IN (SELECT c1 = 3 FROM c) FROM b) "
        "IN (SELECT b1 = 1 FROM b) AS v FROM a",
        # three levels deep, mixed polarity, NULL-bearing innermost
        "SELECT a1, (a1 = 1) IN (SELECT (b1 = 2) NOT IN "
        "(SELECT (c1 = 3) IN (SELECT CASE WHEN ab.a1 = 8 THEN NULL "
        "ELSE ab.b2 = 10 END FROM ab) FROM c) FROM b) AS v FROM a",
    ]:
        got = cf.canon_rows([tuple(r) for r in eng.sql(sql).collect()], False)
        want = cf.canon_rows(duck.execute(sql).fetchall(), False)
        assert got == want, sql


@pytest.mark.parametrize("seed", [11, 12])
def test_in3vl_nested_fuzz_corpus(views, seed):
    """Pinned slice of the nested-projected-IN fuzz grammar (VERDICT
    r12 item 1): IN inside another projected IN's subquery body at 1-2
    levels, lhs-side scalar-subquery INs, both polarities everywhere.
    Wide sweeps: tools/in3vl_fuzz.py --nested."""
    from keenwa_spark.conformance import duckdb_mini_catalog
    from keenwa_spark.in3vl_fuzz import run_in3vl_fuzz

    duck = duckdb_mini_catalog()
    mis = run_in3vl_fuzz(views, duck, seed=seed, n=25, nested=True)
    assert mis == [], mis[:3]
