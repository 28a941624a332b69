"""Executed sweep of the reference's ENTIRE YAML test corpus.

The reference proves its SQL frontend with 17 YAML files of golden
plan-text cases (harness ``src/sql/testing/runner.rs:9-80``, catalog
``src/sql/mod.rs:1432-1443``); it has no executor, so an "ok" there is
a plan shape and an "error" is a validator rejection. This module
upgrades every one of those cases to an EXECUTED check (VERDICT r10
item 2): each YAML query is loaded from the reference tree at runtime,
classified into a lane, and run against Spark — with a DuckDB value
compare wherever the query (or a mechanical per-case translation of
it) is expressible on both engines.

Lanes
-----
- ``verbatim``  — reference-ok; the text runs unchanged on Spark AND
  DuckDB; canonical multisets must match.
- ``reject``    — reference-error; the strict engine must also reject
  (dialect gate or Spark analyzer — error CLASS, never message text).
- ``translated``— reference-ok, but the exact text is outside Spark's
  dialect (ARRAY[..] literal syntax, windows without ORDER BY, VALUES
  default column names). A mechanical per-case translation executes
  the same SHAPE on both engines; the map records the delta.
- ``superset``  — reference-error that this engine deliberately
  ACCEPTS (Spark-native superset: lateral column aliases, implicit
  casts, joins without ON, multi-arg COUNT, looser interval bounds).
  Executed accept, value-compared where a DuckDB spelling exists.
- ``we_reject`` — reference-ok that this engine deliberately REJECTS
  (DISTINCT ON, partial alias lists, TIME casts, correlated shapes
  Spark's decorrelator refuses, scalar subqueries that only error at
  RUNTIME under real multi-row data). Executed rejection, plus the
  registry/conformance artifact that pins our supported alternative.

The queries executed here are loaded from the reference tree at
runtime, never vendored as fixtures; the committed deliverable is the
mapping
(YAML_MAP.md, written by tools/yaml_corpus_map.py) plus this
adjudication table. Interval literals (expr_interval_tests.yaml, 80
cases) get a computed oracle instead of a hand table: a local parser
decomposes each literal into (months, days, seconds), the expected
anchor timestamp is derived in pure Python, and DuckDB re-derives it
independently via to_months/to_days/to_seconds arithmetic.
"""

from __future__ import annotations

import datetime
import glob
import os
import re
from dataclasses import dataclass, field

from keenwa_spark.conformance import canon_rows

REFERENCE_SQL_DIR = "/root/reference/src/sql"

#: files whose queries are bare scalar expressions (reference runs them
#: through run_sql_expression_tests — src/sql/mod.rs:1455,1467), with
#: an optional ``FROM test`` over test(i int32, b bool, s string).
EXPR_FILES = {"expr_basic", "expr_case", "expr_interval"}

TEST_TABLE_ROWS = [(1, True, "aBc"), (2, False, "xY"), (None, None, None)]

ANCHOR = datetime.datetime(2000, 1, 1)
ANCHOR_SQL = "TIMESTAMP '2000-01-01 00:00:00'"


@dataclass(frozen=True)
class RefCase:
    uid: str          # "<file>:<idx>"
    file: str         # yaml stem, e.g. "basic"
    idx: int
    kind: str         # "ok" | "error"
    text: str         # whitespace-normalized query text, no trailing ';'


@dataclass
class SweepResult:
    uid: str
    kind: str
    lane: str
    status: str       # "pass" | "FAIL"
    detail: str = ""
    note: str = ""
    artifact: str = ""


def _norm(text: str) -> str:
    return " ".join(str(text).split()).rstrip(";")


def load_reference_cases(root: str = REFERENCE_SQL_DIR) -> list[RefCase]:
    """Parse every YAML doc of every *_tests.yaml into individual cases.

    A doc contributes one case per ``query``/``queries`` entry; its kind
    is "ok" iff the doc has an ``ok`` key, else "error" (the harness
    format in reference runner.rs — ``error:`` with no value means "any
    error")."""
    import yaml

    out: list[RefCase] = []
    for path in sorted(glob.glob(os.path.join(root, "*_tests.yaml"))):
        stem = os.path.basename(path).replace("_tests.yaml", "")
        idx = 0
        with open(path) as fh:
            for doc in yaml.safe_load_all(fh):
                if not doc or ("query" not in doc and "queries" not in doc):
                    continue
                kind = "ok" if "ok" in doc else "error"
                texts = [doc["query"]] if "query" in doc else list(doc["queries"])
                for t in texts:
                    out.append(RefCase(f"{stem}:{idx:03d}", stem, idx, kind, _norm(t)))
                    idx += 1
    return out


# ---------------------------------------------------------------------------
# Interval-literal oracle (expr_interval_tests.yaml, 80 cases)
# ---------------------------------------------------------------------------

_IVL = re.compile(r"^INTERVAL\s+'([^']*)'\s+([A-Z ]+)$", re.IGNORECASE)

#: reference-error literals this engine deliberately ACCEPTS — Spark's
#: interval bounds are wider than the reference's (years beyond 10000,
#: days beyond 1000000, MONTH >= 12 normalized, 1-digit minute/second
#: fields). Keyed by normalized literal text.
INTERVAL_SUPERSET = {
    "INTERVAL '10001' YEAR",
    "INTERVAL '-10001' YEAR",
    "INTERVAL '12' MONTH",
    "INTERVAL '1000000' DAY",
    "INTERVAL '-1000000' DAY",
    "INTERVAL '1000000 0' DAY TO HOUR",
    "INTERVAL '-1000000 0' DAY TO HOUR",
    "INTERVAL '2 11:0:00' DAY TO SECOND",
    "INTERVAL '2 11:00:0' DAY TO SECOND",
    "INTERVAL '2 11:0:0' DAY TO SECOND",
}

#: anchor results outside datetime's year range (1..9999) — Spark's
#: CAST..AS STRING spelling, verified against DuckDB's BC/astronomical
#: year convention (e.g. Spark -0738 == DuckDB 0739 (BC)).
INTERVAL_FAR_EXPECTED = {
    "INTERVAL '10001' YEAR": "+12001-01-01 00:00:00",
    "INTERVAL '-10001' YEAR": "-8001-01-01 00:00:00",
    "INTERVAL '9999-11' YEAR TO MONTH": "+11999-12-01 00:00:00",
    "INTERVAL '-9999-11' YEAR TO MONTH": "-8000-02-01 00:00:00",
    "INTERVAL '-1000000' DAY": "-0738-02-03 00:00:00",
    "INTERVAL '-1000000 0' DAY TO HOUR": "-0738-02-03 00:00:00",
    "INTERVAL '-999999 23' DAY TO HOUR": "-0738-02-03 01:00:00",
}


def parse_interval_literal(text: str) -> tuple[int, int, int] | None:
    """Decompose a reference interval literal into (months, days,
    seconds), or None if the literal is malformed under the reference's
    own grammar (value.rs:45-100: sign applies to the whole literal;
    DAY TO X bodies are 'D H[:M[:S]]'; YEAR TO MONTH is 'Y-M')."""
    m = _IVL.match(text)
    if not m:
        return None
    body, unit = m.group(1), " ".join(m.group(2).upper().split())
    sign = 1
    if body.startswith("-"):
        sign, body = -1, body[1:]
    try:
        if unit == "YEAR":
            return (sign * int(body) * 12, 0, 0)
        if unit == "MONTH":
            return (sign * int(body), 0, 0)
        if unit == "YEAR TO MONTH":
            y, mo = body.split("-")
            return (sign * (int(y) * 12 + int(mo)), 0, 0)
        if unit == "DAY":
            return (0, sign * int(body), 0)
        if unit in ("DAY TO HOUR", "DAY TO MINUTE", "DAY TO SECOND"):
            d, hms = body.split(" ")
            parts = [int(p) for p in hms.split(":")]
            want = {"DAY TO HOUR": 1, "DAY TO MINUTE": 2, "DAY TO SECOND": 3}[unit]
            if len(parts) != want:
                return None
            parts += [0] * (3 - len(parts))
            h, mi, s = parts
            if h > 23 or mi > 59 or s > 59:
                return None
            return (0, sign * int(d), sign * (h * 3600 + mi * 60 + s))
    except ValueError:
        return None
    return None


def interval_expected(months: int, days: int, secs: int) -> str | None:
    """Anchor + decomposition, Spark CAST..AS STRING spelling; None if
    the result year falls outside datetime's 1..9999 (callers use the
    probe-verified INTERVAL_FAR_EXPECTED table instead)."""
    total = (ANCHOR.year * 12 + ANCHOR.month - 1) + months
    y, mo = divmod(total, 12)
    if not (1 <= y <= 9999):
        return None
    ts = datetime.datetime(y, mo + 1, 1)
    try:
        ts = ts + datetime.timedelta(days=days, seconds=secs)
    except OverflowError:
        return None
    if not (1 <= ts.year <= 9999):
        return None
    return ts.strftime("%Y-%m-%d %H:%M:%S")


# ---------------------------------------------------------------------------
# Adjudications for the non-interval files. Keyed by (file, normalized
# query text). Anything not listed runs the default lane for its kind.
# ---------------------------------------------------------------------------

def T(spark: str, duck: str | None = None, note: str = "") -> dict:
    return {"lane": "translated", "spark": spark, "duck": duck, "note": note}


def SUP(duck: str | None = None, note: str = "") -> dict:
    return {"lane": "superset", "duck": duck, "note": note}


def REV(note: str, artifact: str = "", runtime: bool = False) -> dict:
    return {"lane": "we_reject", "note": note, "artifact": artifact,
            "runtime": runtime}


_WIN = "window functions without ORDER BY are reference-only (its frontend rejects window ORDER BY, sql/mod.rs:1339); Spark REQUIRES it for ranking — executed with a deterministic tie-break added on BOTH engines (SURVEY §7 risk 3)"
_ARR = "ARRAY[..] literal syntax translated to array(..); reference indexes 0-based (SURVEY §7 risk 4) so index n maps to 1-based element_at(n+1); DuckDB runs the bracket form natively"
_VALCOLS = "VALUES default column names diverge: reference column1.., Spark col1.., DuckDB col0.. — translated to each engine's spelling"

ADJUDICATIONS: dict[tuple[str, str], dict] = {
    # ---- aggregate --------------------------------------------------
    ("aggregate", "SELECT sum(a1) as x FROM a GROUP BY a1 HAVING x > 100"): SUP(
        note="Spark resolves SELECT aliases in HAVING (lateral alias resolution); DuckDB agrees — reference requires the bare aggregate"),
    ("aggregate", "SELECT count(*, a1) FROM a"): SUP(
        duck="SELECT count(CASE WHEN a1 IS NOT NULL AND a2 IS NOT NULL AND a3 IS NOT NULL AND a4 IS NOT NULL THEN 1 END) FROM a",
        note="Spark count is multi-arg (counts rows where every argument is non-null; * expands to all columns) — DuckDB oracle spells the same predicate explicitly"),
    ("aggregate", "SELECT count(a1, *) FROM a"): SUP(
        duck="SELECT count(CASE WHEN a1 IS NOT NULL AND a2 IS NOT NULL AND a3 IS NOT NULL AND a4 IS NOT NULL THEN 1 END) FROM a",
        note="same multi-arg count superset as count(*, a1)"),
    ("aggregate", "SELECT count(DISTINCT *) FROM a"): SUP(
        duck="SELECT count(DISTINCT (a1, a2, a3, a4)) FILTER (WHERE a1 IS NOT NULL AND a2 IS NOT NULL AND a3 IS NOT NULL AND a4 IS NOT NULL) FROM a",
        note="Spark accepts COUNT(DISTINCT *) as distinct-complete-rows (null-free rows only)"),
    # ---- basic ------------------------------------------------------
    ("basic", "SELECT 1 as x, x FROM a"): SUP(
        note="lateral column alias — Spark 3.4+ resolves x to the preceding select item; DuckDB agrees; the reference rejects"),
    ("basic", "SELECT 1 as a, a + 1"): SUP(
        note="lateral column alias, no FROM — Spark superset, DuckDB agrees"),
    ("basic", "SELECT * FROM (VALUES(1, 2, 3))"): SUP(
        note="derived VALUES without an alias — Spark names it implicitly; the reference requires an alias"),
    ("basic", "SELECT y, x FROM A as a1(x, y)"): REV(
        note="partial alias column lists (2 names for a 4-column table) are a reference/Postgres-ism; Spark requires full arity — our executed rejection is pinned by ERROR_CORPUS err_alias_arity",
        artifact="conformance:err_alias_arity"),
    ("basic", "SELECT DISTINCT ON (a1+a2) a1, a2, a3 FROM a"): REV(
        note="Spark has no DISTINCT ON; the engine's supported spelling is the deterministic row_number()=1 window (registry distinct_on_expr, value-checked against DuckDB's native DISTINCT ON)",
        artifact="registry:distinct_on_expr"),
    ("basic", "SELECT DISTINCT ON (a1) a1, a2, a3 FROM a"): REV(
        note="same DISTINCT ON divergence", artifact="registry:distinct_on"),
    ("basic", "SELECT DISTINCT on (a1) a1, a2, a3 FROM a"): REV(
        note="same DISTINCT ON divergence (case-insensitive keyword)",
        artifact="registry:distinct_on"),
    ("basic", "SELECT column1, t.column2 FROM (VALUES (1, 2 + 2, 3)) t"): T(
        "SELECT col1, t.col2 FROM (VALUES (1, 2 + 2, 3)) t",
        "SELECT col0, t.col1 FROM (VALUES (1, 2 + 2, 3)) t", _VALCOLS),
    ("basic", "SELECT column1, t.column2 FROM (VALUES (1, 2, 3), (4, 5, 6) ) t"): T(
        "SELECT col1, t.col2 FROM (VALUES (1, 2, 3), (4, 5, 6)) t",
        "SELECT col0, t.col1 FROM (VALUES (1, 2, 3), (4, 5, 6)) t", _VALCOLS),
    ("basic", "SELECT (SELECT t.column1 FROM (VALUES (a.a1, 2, 3)) t) FROM a"): REV(
        note="outer column references inside an inline VALUES table — Spark requires inline tables to be constant-foldable (INVALID_INLINE_TABLE), DuckDB also rejects; the correlated-scalar shape is covered by the subq family",
        artifact="conformance:subq_03"),
    # ---- cte --------------------------------------------------------
    ("cte", "WITH a1_vals(a1, a2) AS ( SELECT a1, a2, a3 FROM a WHERE a1 > 10 ) SELECT * FROM a1_vals"): REV(
        note="CTE column-alias lists with FEWER names than the subquery's columns are a reference-ism; Spark requires matching arity (ASSIGNMENT_ARITY_MISMATCH) — full-arity CTE aliases are executed in the cte family",
        artifact="conformance:cte_01"),
    ("cte", "SELECT 1, (WITH a1_val AS (SELECT t1, t2) SELECT t1 + t2 FROM a1_val) FROM a as t(t1, t2)"): REV(
        note="outer-correlated columns inside a CTE body nested in a scalar subquery — Spark's decorrelator does not support correlation through WITH; the same correlation without the CTE wrapper executes (subqueries:006/007 run verbatim)",
        artifact="yaml:subqueries:006"),
    ("cte", "SELECT 1, (WITH a1_val AS (SELECT t1) SELECT t1 + t2 FROM a1_val) FROM a as t(t1, t2)"): REV(
        note="same correlated-CTE-in-subquery shape", artifact="yaml:subqueries:006"),
    # ---- expr_basic -------------------------------------------------
    ("expr_basic", "CAST('12:11:53.021' as Time)"): REV(
        note="Spark 4.x has a TIME literal but no CAST-to-TIME (UNSUPPORTED_TIME_TYPE); time-of-day values route through TIMESTAMP; the TIME literal itself executes (expr_basic:053/054 run verbatim)",
        artifact="yaml:expr_basic:053", runtime=False),
    ("expr_basic", "lower(i) FROM test"): SUP(
        duck="SELECT (lower(CAST(i AS VARCHAR))) AS v FROM test",
        note="implicit int->string cast in string functions — Spark coerces, the reference has no lower(Int32)"),
    ("expr_basic", "lower(123)"): SUP(
        duck="SELECT (lower(CAST(123 AS VARCHAR))) AS v",
        note="same implicit-cast superset"),
    ("expr_basic", "ARRAY[1, 2, 3]"): T(
        "SELECT array(1, 2, 3) AS v", "SELECT ARRAY[1, 2, 3] AS v", _ARR),
    ("expr_basic", "[1, 2, 3]"): T(
        "SELECT array(1, 2, 3) AS v", "SELECT [1, 2, 3] AS v", _ARR),
    ("expr_basic", "[NULL, 2, 3]"): T(
        "SELECT array(NULL, 2, 3) AS v", "SELECT [NULL, 2, 3] AS v", _ARR),
    ("expr_basic", "[1, NULL, 3]"): T(
        "SELECT array(1, NULL, 3) AS v", "SELECT [1, NULL, 3] AS v", _ARR),
    ("expr_basic", "ARRAY[[1, 2], [3, 4]] [0] [1]"): T(
        "SELECT element_at(element_at(array(array(1, 2), array(3, 4)), 1), 2) AS v",
        "SELECT (ARRAY[[1, 2], [3, 4]][1])[2] AS v", _ARR),
    ("expr_basic", "ARRAY[[1, 2, 3], [4, 5, 6]]"): T(
        "SELECT array(array(1, 2, 3), array(4, 5, 6)) AS v",
        "SELECT ARRAY[[1, 2, 3], [4, 5, 6]] AS v", _ARR),
    ("expr_basic", "ARRAY[1, 2, 3, 4, 5, 6, 7][1:3]"): T(
        "SELECT slice(array(1, 2, 3, 4, 5, 6, 7), 2, 2) AS v",
        "SELECT (ARRAY[1, 2, 3, 4, 5, 6, 7])[2:3] AS v",
        _ARR + "; reference slice [1:3] under 0-based indexing = elements 2..3 in 1-based terms"),
    ("expr_basic", "ARRAY[1, 2, 3, 4, 5, 6, 7][1:6:2]"): REV(
        note="slice strides are rejected by this engine's dialect gate (no Spark equivalent; ERROR_CORPUS err_slice_stride) — the reference plans them but cannot execute them either",
        artifact="conformance:err_slice_stride"),
    ("expr_basic", "ARRAY[i, 1] FROM test"): T(
        "SELECT array(i, 1) AS v FROM test",
        "SELECT ARRAY[i, 1] AS v FROM test", _ARR),
    ("expr_basic", "ARRAY[[1,2,3], [4,5,6]][1][3]"): T(
        "SELECT try_element_at(try_element_at(array(array(1, 2, 3), array(4, 5, 6)), 2), 4) AS v",
        "SELECT (ARRAY[[1,2,3], [4,5,6]][2])[4] AS v",
        _ARR + "; index [3] of a 3-element array is out of range -> NULL on both engines (try_element_at)"),
    # ---- set_operator ----------------------------------------------
    ("set_operator", "SELECT (SELECT a1 UNION SELECT 1) FROM a"): REV(
        note="a scalar subquery whose UNION yields >1 row: the reference only PLANS it; executing is a runtime error by SQL semantics (Spark SCALAR_SUBQUERY_TOO_MANY_ROWS; DuckDB silently takes an arbitrary row) — single-row scalar set-op subqueries execute fine (set_operator:006/009 run verbatim)",
        artifact="yaml:set_operator:006", runtime=True),
    # ---- subqueries -------------------------------------------------
    ("subqueries", "SELECT a1, (SELECT sum(b1 + a1) FROM b) FROM a"): REV(
        note="an aggregate mixing outer and local references inside a scalar subquery — Spark's decorrelator rejects (UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY); the supported spelling hoists the outer term: sum(b1) + count(*) * a1",
        artifact="conformance:subq_03"),
    ("subqueries", "SELECT a1, (SELECT sum(b1 + a1) FROM b GROUP BY a1) FROM a"): REV(
        note="same mixed-reference aggregate restriction", artifact="conformance:subq_03"),
    ("subqueries", "SELECT (SELECT count(a1) FROM a) FROM a GROUP BY (SELECT count(b2) FROM b GROUP BY a1)"): REV(
        note="correlated scalar subquery as a GROUP BY key — Spark requires correlated scalar subqueries to be aggregated without correlated grouping (MUST_AGGREGATE_CORRELATED_SCALAR_SUBQUERY)",
        artifact="conformance:subq_02"),
    ("subqueries", "SELECT (SELECT DISTINCT ON (a1) b1 FROM b LIMIT 1 OFFSET 2) FROM a"): REV(
        note="DISTINCT ON divergence (see basic:026-028) inside a scalar subquery",
        artifact="registry:distinct_on"),
    ("subqueries", "SELECT (SELECT 1 FROM (SELECT a.* FROM b LIMIT 1) tmp1) tmp2 FROM a"): T(
        "SELECT (SELECT 1 FROM (SELECT a.* FROM b LIMIT 1) tmp1) AS tmp2 FROM a",
        "SELECT 1 AS tmp2 FROM a",
        "outer-table star inside a nested derived table: Spark resolves a.* as outer-scope correlation and yields 1 per outer row; DuckDB cannot reference the outer table there, so the oracle is the reduced equivalent"),
    # ---- window_aggregate ------------------------------------------
    ("window_aggregate", "SELECT row_number() OVER (PARTITION BY a1) FROM a"): T(
        "SELECT row_number() OVER (PARTITION BY a1 ORDER BY a4) AS rn FROM a",
        None, _WIN),
    ("window_aggregate", "SELECT row_number() OVER (PARTITION BY a1) as row_number FROM a"): T(
        "SELECT row_number() OVER (PARTITION BY a1 ORDER BY a4) AS row_number FROM a",
        None, _WIN),
    ("window_aggregate", "SELECT a2, rank() OVER (PARTITION BY a1) FROM a"): T(
        "SELECT a2, rank() OVER (PARTITION BY a1 ORDER BY a2) AS r FROM a",
        None, _WIN),
    ("window_aggregate", "SELECT row_number() OVER(), a2, rank() OVER (PARTITION BY a1) FROM a"): T(
        "SELECT row_number() OVER (ORDER BY a4) AS rn, a2, rank() OVER (PARTITION BY a1 ORDER BY a2) AS r FROM a",
        None, _WIN + "; two windows with different partitioning in one SELECT (the reference nests LogicalWindowAggregate)"),
    ("window_aggregate", "SELECT rank() OVER (PARTITION BY a1,a2), row_number() OVER(), a2, rank() OVER (PARTITION BY a1) FROM a"): T(
        "SELECT rank() OVER (PARTITION BY a1, a2 ORDER BY a4) AS r1, row_number() OVER (ORDER BY a4) AS rn, a2, rank() OVER (PARTITION BY a1 ORDER BY a2) AS r2 FROM a",
        None, _WIN + "; THREE windows, three distinct partitionings (reference window_aggregate_tests.yaml:35-46 triple-nested form)"),
    ("window_aggregate", "SELECT rank() OVER (), row_number() OVER (PARTITION BY a1), row_number() OVER (PARTITION BY a1) FROM a"): T(
        "SELECT rank() OVER (ORDER BY a4) AS r, row_number() OVER (PARTITION BY a1 ORDER BY a4) AS rn1, row_number() OVER (PARTITION BY a1 ORDER BY a4) AS rn2 FROM a",
        None, _WIN + "; duplicate window specs share one Window node"),
    ("window_aggregate", "SELECT count(1), rank() OVER () FROM a"): T(
        "SELECT count(1) AS n, rank() OVER (ORDER BY count(1)) AS r FROM a",
        None, _WIN + "; window evaluated OVER the global-aggregate output row"),
    ("window_aggregate", "SELECT count(1), rank() OVER (PARTITION BY a1) FROM a GROUP BY a1"): T(
        "SELECT count(1) AS n, rank() OVER (PARTITION BY a1 ORDER BY count(1)) AS r FROM a GROUP BY a1",
        None, _WIN + "; window over grouped-aggregate output"),
    ("window_aggregate", "SELECT count(a1), rank() OVER () FROM a"): T(
        "SELECT count(a1) AS n, rank() OVER (ORDER BY count(a1)) AS r FROM a",
        None, _WIN),
    ("window_aggregate", "select count(1), rank() OVER (PARTITION BY a1) from a group by a1"): T(
        "SELECT count(1) AS n, rank() OVER (PARTITION BY a1 ORDER BY count(1)) AS r FROM a GROUP BY a1",
        None, _WIN),
    # join-without-ON family: Spark parses these as condition-less
    # joins (inner/left/right/full all degenerate to the cartesian
    # product on this data since every pair "matches")
    ("join_inner", "SELECT * FROM a JOIN b"): SUP(
        duck="SELECT * FROM a CROSS JOIN b",
        note="JOIN without ON — Spark superset (condition-less inner join == cross); the reference requires ON"),
    ("join_inner", "SELECT * FROM a INNER JOIN b"): SUP(
        duck="SELECT * FROM a CROSS JOIN b", note="same condition-less join superset"),
    ("join_left", "SELECT * FROM a LEFT JOIN b"): SUP(
        duck="SELECT * FROM a CROSS JOIN b",
        note="LEFT JOIN without ON: every left row matches every right row, degenerating to the cross product"),
    ("join_right", "SELECT * FROM a RIGHT JOIN b"): SUP(
        duck="SELECT * FROM a CROSS JOIN b", note="same condition-less join superset"),
    ("join_full", "SELECT * FROM a FULL JOIN b"): SUP(
        duck="SELECT * FROM a CROSS JOIN b", note="same condition-less join superset"),
    ("join_cross", "SELECT * FROM a CROSS JOIN b on a1 = b1"): SUP(
        duck="SELECT * FROM a JOIN b ON a1 = b1",
        note="CROSS JOIN with an ON clause — Spark's parser accepts and treats it as an inner join; the reference (and DuckDB) reject the combination"),
    ("join_cross", "SELECT * FROM a CROSS JOIN AB USING (a1)"): SUP(
        duck="SELECT * FROM a JOIN ab USING (a1)",
        note="CROSS JOIN with USING — same parser superset"),
}


# ---------------------------------------------------------------------------
# Runner
# ---------------------------------------------------------------------------

def register_sweep_catalog(spark, duck) -> None:
    """Mini catalog (a, b, c, ab — conformance.MINI_TABLES) plus the
    expression-file table test(i, b, s) on both engines."""
    from keenwa_spark.conformance import register_mini_catalog

    register_mini_catalog(spark)
    spark.sql(
        "SELECT CAST(c0 AS INT) AS i, CAST(c1 AS BOOLEAN) AS b, CAST(c2 AS STRING) AS s "
        "FROM (VALUES (1, true, 'aBc'), (2, false, 'xY'), (NULL, NULL, NULL)) v(c0, c1, c2)"
    ).createOrReplaceTempView("test")
    duck.execute("CREATE TABLE IF NOT EXISTS test (i INT, b BOOLEAN, s VARCHAR)")
    if duck.execute("SELECT count(*) FROM test").fetchone()[0] == 0:
        duck.executemany("INSERT INTO test VALUES (?, ?, ?)", TEST_TABLE_ROWS)


#: Allowlist gate for query text loaded from the UNTRUSTED reference
#: tree (ADVICE r11, medium). The accepted lanes execute raw case text
#: on Spark and DuckDB; without a gate, Spark's ``format.`/path```
#: relation syntax or DuckDB's read_csv/read_text table functions (or
#: its bare ``FROM '/path'`` string relations) would let a crafted
#: case in the public reference tree read arbitrary local files — and
#: mismatch details flow into the committed YAML_MAP.md. Only
#: read-only SELECT/WITH/VALUES/TABLE shapes over the registered mini
#: catalog may reach either engine.
_SAFE_START_RE = re.compile(r"^\s*(?:\(|SELECT\b|WITH\b|VALUES\b|TABLE\b)", re.IGNORECASE)
_PATH_TVF_RE = re.compile(
    r"\b(?:read_\w+|parquet_scan|parquet_metadata|glob|sniff_csv|getenv"
    r"|install|load_extension|attach|copy|export|pragma|duckdb_settings"
    r"|inline|java_method|reflect)\b",
    re.IGNORECASE,
)
# No whitespace REQUIRED after FROM/JOIN: SQL tokenizes FROM'/path'
# without a space (ADVICE r12 medium), and DuckDB's replacement scans
# also accept a double-quoted path-like identifier as a relation — the
# mask keeps quote characters, so FROM'' / FROM"" still match.
_STRING_RELATION_RE = re.compile(r"\b(?:FROM|JOIN)\s*['\"]", re.IGNORECASE)


def assert_sweep_safe(sql: str) -> None:
    """Raise before any engine sees untrusted text that could touch
    the filesystem or session state. Raising inside a reject lane
    still records the correct outcome (we refused to run it).

    Content checks run on a copy masked by the comment-AND-literal-
    aware scanner (dialect._mask_literals_keep_len: handles ``--``,
    ``/* */``, doubled-quote escapes, and double-quoted identifiers in
    true lexing order), so ``WHERE s = 'from it'`` can't
    false-positive AND an apostrophe inside a ``--`` comment can't
    open a phantom literal that swallows live code — the naive
    quoted-literal regex let ``SELECT * -- x'\\nFROM read_csv(...)``
    through exactly that way (ADVICE r12 high). A path can only reach
    an engine as a RELATION, never as a plain literal."""
    from keenwa_spark.dialect import _mask_literals_keep_len

    if not _SAFE_START_RE.match(sql):
        raise ValueError(f"sweep gate: non-query statement blocked: {sql[:60]!r}")
    stripped = _mask_literals_keep_len(sql)
    if "`" in stripped:
        raise ValueError(
            "sweep gate: backtick relation blocked (Spark `format`.`path` reads files)")
    if ";" in stripped.rstrip().rstrip(";"):
        raise ValueError("sweep gate: multi-statement text blocked")
    if _PATH_TVF_RE.search(stripped):
        raise ValueError("sweep gate: path-capable/session table function blocked")
    if _STRING_RELATION_RE.search(stripped):
        raise ValueError(
            "sweep gate: string-literal relation blocked (DuckDB reads files by path)")


def _clip(v: object, n: int = 80) -> str:
    """Bound live row values before they reach a committed artifact
    (ADVICE r11: FAIL details are written into YAML_MAP.md)."""
    s = repr(v)
    return s if len(s) <= n else s[:n] + "..."


def _wrap_expr(case: RefCase) -> str:
    """Bare expressions run as SELECT (expr) AS v [FROM test]."""
    text = case.text
    if re.search(r"\sFROM\s+test$", text, re.IGNORECASE):
        expr = re.sub(r"\sFROM\s+test$", "", text, flags=re.IGNORECASE)
        return f"SELECT ({expr}) AS v FROM test"
    if text.upper().startswith(("SELECT ", "VALUES", "TABLE ", "WITH ")):
        return text
    return f"SELECT ({text}) AS v"


def _spark_rows(spark, sql: str):
    assert_sweep_safe(sql)
    return canon_rows([tuple(r) for r in spark.sql(sql).collect()], False)


def _duck_rows(duck, sql: str):
    assert_sweep_safe(sql)
    return canon_rows(duck.execute(sql).fetchall(), False)


def _run_interval_case(spark, duck, case: RefCase) -> SweepResult:
    lit = case.text
    probe = f"SELECT CAST({ANCHOR_SQL} + ({lit}) AS STRING) AS v"
    decomp = parse_interval_literal(lit)
    if case.kind == "error" and lit not in INTERVAL_SUPERSET:
        try:
            assert_sweep_safe(probe)
            spark.sql(probe).collect()
        except Exception:
            return SweepResult(case.uid, case.kind, "reject", "pass")
        return SweepResult(case.uid, case.kind, "reject", "FAIL",
                           detail="Spark accepted a literal both grammars reject")
    # accepted path (reference-ok, or our documented superset)
    lane = "superset" if case.kind == "error" else "verbatim"
    note = ("interval bounds/format superset: Spark's grammar is wider "
            "than the reference's value.rs ranges" if lane == "superset" else "")
    if decomp is None:
        return SweepResult(case.uid, case.kind, lane, "FAIL",
                           detail=f"local parser cannot decompose {lit!r}", note=note)
    mo, d, s = decomp
    expected = interval_expected(mo, d, s) or INTERVAL_FAR_EXPECTED.get(lit)
    try:
        assert_sweep_safe(probe)
        got = spark.sql(probe).collect()[0][0]
    except Exception as e:
        return SweepResult(case.uid, case.kind, lane, "FAIL",
                           detail=f"Spark rejected: {str(e)[:120]}", note=note)
    if expected is None or got != expected:
        return SweepResult(case.uid, case.kind, lane, "FAIL",
                           detail=f"anchor mismatch: spark={got!r} expected={expected!r}",
                           note=note)
    # independent DuckDB derivation, in-range values only
    if lit not in INTERVAL_FAR_EXPECTED:
        dv = duck.execute(
            f"SELECT CAST({ANCHOR_SQL} + to_months({mo}) + to_days({d}) "
            f"+ to_seconds({s}) AS VARCHAR)").fetchone()[0]
        if dv != expected:
            return SweepResult(case.uid, case.kind, lane, "FAIL",
                               detail=f"duck derivation {dv!r} != {expected!r}", note=note)
    return SweepResult(case.uid, case.kind, lane, "pass", note=note)


def run_case(spark, duck, engine, case: RefCase) -> SweepResult:
    """Execute one reference case in its lane. ``engine`` is a strict
    keenwa_spark.engine.Engine over the same Spark session (used for
    rejection lanes so the dialect gate is part of the check)."""
    if case.file == "expr_interval":
        return _run_interval_case(spark, duck, case)

    adj = ADJUDICATIONS.get((case.file, case.text))
    lane = adj["lane"] if adj else ("verbatim" if case.kind == "ok" else "reject")
    note = adj.get("note", "") if adj else ""
    artifact = adj.get("artifact", "") if adj else ""

    if lane == "reject":
        try:
            assert_sweep_safe(case.text)
            engine.sql(case.text).collect()
        except Exception:
            return SweepResult(case.uid, case.kind, lane, "pass")
        return SweepResult(case.uid, case.kind, lane, "FAIL",
                           detail="strict engine accepted a reference-error case")

    if lane == "we_reject":
        try:
            assert_sweep_safe(case.text)
            engine.sql(case.text).collect()
        except Exception:
            return SweepResult(case.uid, case.kind, lane, "pass",
                               note=note, artifact=artifact)
        return SweepResult(case.uid, case.kind, lane, "FAIL",
                           detail="expected a documented rejection but the query ran",
                           note=note, artifact=artifact)

    if lane == "verbatim":
        sql = _wrap_expr(case)
        try:
            srows = _spark_rows(spark, sql)
            drows = _duck_rows(duck, sql)
        except Exception as e:
            return SweepResult(case.uid, case.kind, lane, "FAIL",
                               detail=str(e).replace("\n", " ")[:160])
        ok = srows == drows
        return SweepResult(case.uid, case.kind, lane, "pass" if ok else "FAIL",
                           detail="" if ok else f"value mismatch: {_clip(srows[:2])} vs {_clip(drows[:2])}")

    if lane == "translated":
        s_sql, d_sql = adj["spark"], adj["duck"] or adj["spark"]
        try:
            srows = _spark_rows(spark, s_sql)
            drows = _duck_rows(duck, d_sql)
        except Exception as e:
            return SweepResult(case.uid, case.kind, lane, "FAIL",
                               detail=str(e).replace("\n", " ")[:160], note=note)
        ok = srows == drows
        return SweepResult(case.uid, case.kind, lane, "pass" if ok else "FAIL",
                           detail="" if ok else f"value mismatch: {_clip(srows[:2])} vs {_clip(drows[:2])}",
                           note=note)

    if lane == "superset":
        sql = _wrap_expr(case)
        try:
            srows = _spark_rows(spark, sql)
        except Exception as e:
            return SweepResult(case.uid, case.kind, lane, "FAIL",
                               detail=f"expected superset-accept, Spark rejected: {str(e)[:120]}",
                               note=note)
        d_sql = adj.get("duck")
        if d_sql is None:
            d_sql = sql  # DuckDB agrees with the superset verbatim
        try:
            drows = _duck_rows(duck, d_sql)
        except Exception as e:
            return SweepResult(case.uid, case.kind, lane, "FAIL",
                               detail=f"duck oracle failed: {str(e)[:120]}", note=note)
        ok = srows == drows
        return SweepResult(case.uid, case.kind, lane, "pass" if ok else "FAIL",
                           detail="" if ok else f"value mismatch: {_clip(srows[:2])} vs {_clip(drows[:2])}",
                           note=note)

    raise ValueError(f"unknown lane {lane!r} for {case.uid}")


def run_sweep(spark, duck=None) -> list[SweepResult]:
    """Run every reference YAML case; returns one result per case."""
    from keenwa_spark.conformance import duckdb_mini_catalog
    from keenwa_spark.engine import Engine

    if duck is None:
        duck = duckdb_mini_catalog()
    register_sweep_catalog(spark, duck)
    engine = Engine(spark, strict=True)
    return [run_case(spark, duck, engine, c) for c in load_reference_cases()]


def write_map(results: list[SweepResult], cases: list[RefCase], path: str,
              regimes_note: str = "") -> None:
    """Emit the committed mapping table (YAML_MAP.md). ``regimes_note``
    (one line) records an all-regimes re-run in the header."""
    by_uid = {c.uid: c for c in cases}
    lanes: dict[str, int] = {}
    for r in results:
        lanes[r.lane] = lanes.get(r.lane, 0) + 1
    n_fail = sum(1 for r in results if r.status != "pass")
    lines = [
        "# Reference YAML corpus — executed mapping",
        "",
        "Generated by `tools/yaml_corpus_map.py` (logic in",
        "`keenwa_spark/yaml_sweep.py`); regenerate, never hand-edit.",
        "Every ok/error case of the reference's 17 `src/sql/*_tests.yaml`",
        "files (golden plan-text tests — the reference has no executor) is",
        "EXECUTED here: on Spark, and on DuckDB whenever the text or a",
        "mechanical translation of it is expressible on both engines.",
        "The sweep loads the query texts from the reference tree at",
        "runtime (they are not vendored as test fixtures); this table",
        "quotes each case so the mapping is auditable line by line.",
        "",
        f"**{len(results)} cases, {n_fail} failing.** Lanes: "
        + ", ".join(f"{k} {v}" for k, v in sorted(lanes.items())) + ".",
        *( [ "", regimes_note ] if regimes_note else [] ),
        "",
        "| lane | meaning |",
        "|---|---|",
        "| verbatim | reference-ok; ran unchanged on Spark AND DuckDB, values equal |",
        "| reject | reference-error; the strict engine also rejects (dialect gate or analyzer) |",
        "| translated | reference-ok; same shape executed through a mechanical per-case translation (noted) |",
        "| superset | reference-error this engine deliberately accepts (documented Spark superset; value-checked) |",
        "| we_reject | reference-ok this engine deliberately rejects (documented divergence + supported alternative) |",
        "",
        "| case | kind | lane | status | maps to / note |",
        "|---|---|---|---|---|",
    ]
    for r in results:
        c = by_uid[r.uid]
        info = r.artifact
        if r.note:
            info = (info + " — " if info else "") + r.note
        if r.detail:
            info = (info + " — " if info else "") + "**" + r.detail + "**"
        q = c.text if len(c.text) <= 90 else c.text[:87] + "..."
        q = q.replace("|", "\\|")
        info = info.replace("|", "\\|")
        lines.append(
            f"| `{r.uid}` | {r.kind} | {r.lane} | {r.status} | `{q}`"
            + (f" — {info}" if info else "") + " |")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
