"""Golden plan-text tests for the keenwa-style plan presentation
(keenwa_spark/presentation.py) — the analog of the reference's YAML
plan corpus (src/sql/*.yaml: query + expected operator tree), pinned
against this repo's Spark version.

These freeze the RENDERED LOGICAL SHAPE of one query per major plan
family. A diff here means either the renderer or Catalyst's analysis
changed — both worth a human look.
"""

from __future__ import annotations

import pytest

from keenwa_spark.presentation import render_plan

GOLDEN = {
    "scan_filter_project": (
        "SELECT n_name FROM nation WHERE n_regionkey = 1",
        """\
LogicalProjection exprs: [n_name]
  input: LogicalSelect filter=(n_regionkey = 1)
    input: LogicalGet nation cols=[n_nationkey, n_name, n_regionkey]""",
    ),
    "join_agg_sort_limit": (
        "SELECT r_name, count(*) AS cnt FROM nation "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name ORDER BY cnt DESC LIMIT 3",
        """\
LogicalLimit rows=3
  input: LogicalSort ordering=[cnt DESC NULLS LAST]
    input: LogicalAggregate groups=[r_name] aggrs=[r_name, count(1) AS cnt]
      input: LogicalJoin type=Inner on=(n_regionkey = r_regionkey)
        left: LogicalGet nation cols=[n_nationkey, n_name, n_regionkey]
        right: LogicalGet region cols=[r_regionkey, r_name]""",
    ),
    "left_outer_join": (
        "SELECT n_name, r_name FROM nation "
        "LEFT JOIN region ON n_regionkey = r_regionkey",
        """\
LogicalProjection exprs: [n_name, r_name]
  input: LogicalJoin type=LeftOuter on=(n_regionkey = r_regionkey)
    left: LogicalGet nation cols=[n_nationkey, n_name, n_regionkey]
    right: LogicalGet region cols=[r_regionkey, r_name]""",
    ),
    "semi_join": (
        "SELECT n_name FROM nation "
        "LEFT SEMI JOIN region ON n_regionkey = r_regionkey",
        """\
LogicalProjection exprs: [n_name]
  input: LogicalJoin type=LeftSemi on=(n_regionkey = r_regionkey)
    left: LogicalGet nation cols=[n_nationkey, n_name, n_regionkey]
    right: LogicalGet region cols=[r_regionkey, r_name]""",
    ),
    "anti_join": (
        "SELECT n_name FROM nation "
        "LEFT ANTI JOIN region ON n_regionkey = r_regionkey",
        """\
LogicalProjection exprs: [n_name]
  input: LogicalJoin type=LeftAnti on=(n_regionkey = r_regionkey)
    left: LogicalGet nation cols=[n_nationkey, n_name, n_regionkey]
    right: LogicalGet region cols=[r_regionkey, r_name]""",
    ),
    "union_distinct": (
        "SELECT n_regionkey FROM nation UNION SELECT r_regionkey FROM region",
        """\
LogicalUnion all=false
  input[0]: LogicalProjection exprs: [n_regionkey]
    input: LogicalGet nation cols=[n_nationkey, n_name, n_regionkey]
  input[1]: LogicalProjection exprs: [r_regionkey]
    input: LogicalGet region cols=[r_regionkey, r_name]""",
    ),
    "except_all": (
        "SELECT n_regionkey FROM nation EXCEPT ALL "
        "SELECT r_regionkey FROM region",
        """\
LogicalExcept all=true
  input[0]: LogicalProjection exprs: [n_regionkey]
    input: LogicalGet nation cols=[n_nationkey, n_name, n_regionkey]
  input[1]: LogicalProjection exprs: [r_regionkey]
    input: LogicalGet region cols=[r_regionkey, r_name]""",
    ),
    "select_without_from": (
        "SELECT 1 AS x",
        """\
LogicalProjection exprs: [1 AS x]
  input: LogicalEmpty return_one_row=true""",
    ),
    "values_list": (
        "SELECT * FROM VALUES (1, 'a'), (2, 'b') AS t(id, name)",
        """\
LogicalProjection exprs: [id, name]
  input: LogicalValues t cols=[id, name]""",
    ),
    "limit_offset": (
        "SELECT n_name FROM nation ORDER BY n_name LIMIT 5 OFFSET 2",
        """\
LogicalLimit rows=5
  input: LogicalOffset rows=2
    input: LogicalSort ordering=[n_name ASC NULLS FIRST]
      input: LogicalProjection exprs: [n_name]
        input: LogicalGet nation cols=[n_nationkey, n_name, n_regionkey]""",
    ),
    "group_having": (
        "SELECT n_regionkey, count(*) AS c FROM nation "
        "GROUP BY n_regionkey HAVING count(*) > 3",
        """\
LogicalSelect filter=(c > cast(3 as bigint))
  input: LogicalAggregate groups=[n_regionkey] aggrs=[n_regionkey, count(1) AS c]
    input: LogicalGet nation cols=[n_nationkey, n_name, n_regionkey]""",
    ),
}


@pytest.mark.parametrize("case", sorted(GOLDEN))
def test_golden_plan_text(views, case):
    sql, expected = GOLDEN[case]
    assert render_plan(views.sql(sql)) == expected


def test_window_renders_as_window_aggregate(views):
    text = render_plan(
        views.sql(
            "SELECT o_custkey, row_number() OVER "
            "(PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rn "
            "FROM orders"
        )
    )
    assert "LogicalWindowAggregate" in text
    assert "partition=[o_custkey]" in text
    assert "order=[o_totalprice DESC NULLS LAST]" in text


def test_subquery_renders_as_subtree(views):
    """Subquery plans render as labeled sub-trees (the reference's
    SubQueriesFormatter presentation), with correlation visible as
    outer(...)."""
    text = render_plan(
        views.sql(
            "SELECT c_name FROM customer WHERE EXISTS "
            "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
        )
    )
    assert "subquery[0]: LogicalProjection" in text
    assert "outer(c_custkey)" in text
    # the subquery tree is indented under the filter that owns it
    filter_line = next(l for l in text.split("\n") if "LogicalSelect" in l)
    sub_line = next(l for l in text.split("\n") if "subquery[0]" in l)
    assert len(sub_line) - len(sub_line.lstrip()) > len(filter_line) - len(
        filter_line.lstrip()
    )


def test_cte_renders_def_and_ref(views):
    text = render_plan(
        views.sql(
            "WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 1000) "
            "SELECT count(*) AS n FROM big"
        )
    )
    assert text.startswith("LogicalWithCTE")
    assert "CTEDef id=0" in text
    assert "CTERef id=0 cols=[o_custkey]" in text
    assert "groups=[] aggrs=[count(1) AS n]" in text


def test_engine_explain_keenwa(engine):
    """The Engine surface renders keenwa-style text for SQL strings
    (dialect-gated) and for built DataFrames."""
    text = engine.explain_keenwa("SELECT n_name FROM nation WHERE n_regionkey = 1")
    assert text.startswith("LogicalProjection")
    assert "LogicalGet nation" in text
    df_text = engine.explain_keenwa(engine.table("region"))
    assert df_text.startswith("LogicalGet region")


def test_no_expr_ids_leak(views):
    """Catalyst #id suffixes must never reach the rendered text."""
    import re

    text = render_plan(
        views.sql("SELECT c_name FROM customer JOIN orders ON c_custkey = o_custkey")
    )
    assert not re.search(r"#\d", text), text


def test_cte_ids_are_per_plan_not_session_global(views):
    """Catalyst numbers CTERelationDefs with a session-global counter;
    the renderer must normalize to per-plan indices so the text is
    independent of how many CTE queries ran earlier in the session
    (this failed order-dependently in the full suite before r5)."""
    q = (
        "WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 1000) "
        "SELECT count(*) AS n FROM big"
    )
    views.sql(q).collect()  # burn a global CTE id
    text = render_plan(views.sql(q))
    assert "CTEDef id=0" in text
    assert "CTERef id=0" in text
    two = render_plan(
        views.sql(
            "WITH a AS (SELECT o_custkey FROM orders), "
            "b AS (SELECT c_custkey FROM customer) "
            "SELECT (SELECT count(*) FROM a) AS na, "
            "(SELECT count(*) FROM b) AS nb"
        )
    )
    assert "CTEDef id=0" in two and "CTEDef id=1" in two


def test_new_operator_plans_render(views):
    """The keenwa-style renderer must handle the round-5 operator
    plans (full-outer CDC joins, island windows, interval coalesce)
    without leaking Catalyst ids or crashing — structural smoke, not
    brittle full-text goldens."""
    from pyspark.sql import functions as F

    from keenwa_spark.operators import gaps_islands, snapshot_diff

    ev = views.table("events")
    a = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    b = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    diff_text = render_plan(snapshot_diff(a, b, keys=["user_id"]))
    assert "LogicalJoin" in diff_text and "full" in diff_text.lower()
    assert "LogicalAggregate" in diff_text

    days = ev.select(
        "user_id", F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("d")
    ).distinct()
    isl_text = render_plan(gaps_islands(days, keys=["user_id"], seq_col="d"))
    assert "LogicalWindowAggregate" in isl_text
    assert "LogicalAggregate" in isl_text

    import re

    for text in (diff_text, isl_text):
        assert not re.search(r"#\d", text), text[:300]
