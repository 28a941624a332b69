"""Builder-API subquery queries — SURVEY.md §2 rows 36-38, builder side.

VERDICT r02 item 5: the SQL surface covers EXISTS/IN subqueries, but
the reference ALSO exposes them as builder entry points
(``sub_query_builder``/``new_relation_builder``, reference
src/operators/builder/mod.rs:696-737, decorrelated in
builder/subqueries.rs:186-367). These two queries prove
``PlanBuilder.exists`` / ``.in_subquery`` (+ their NOT variants, which
compose the same code path) against plain-SQL DuckDB oracles. They
register directly after the windows module so they land inside the
driver-checked registry prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from keenwa_spark.queries import df_query


@df_query(
    "bld_exists",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
    )
      AND NOT EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_suppkey = s.s_suppkey
        AND l2.l_discount > 0.09 AND l2.l_quantity >= 45
    )
    """,
    doc="PlanBuilder.exists + .not_exists chained (reference EXISTS "
    "decorrelation entry points, builder/subqueries.rs:186-277): "
    "suppliers who shipped a near-full-quantity item but never a big "
    "max-discount one. NON-empty at sf0.01 (5 rows) and each predicate "
    "alone yields a different row set — neither side is vacuous.",
    tags=("builder", "subquery"),
)
def bld_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.builder import PlanBuilder

    b = PlanBuilder(spark)
    big = b.new_query().from_("lineitem").select("l_quantity >= 49")
    discounted = b.new_query().from_("lineitem").select(
        "l_discount > 0.09 AND l_quantity >= 45"
    )
    return (
        b.from_("supplier")
        .exists(big, "s_suppkey = l_suppkey")
        .not_exists(discounted, "s_suppkey = l_suppkey")
        .project(["s_suppkey", "s_name", "s_acctbal"])
        .build()
    )


@df_query(
    "bld_in_subquery",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE c_nationkey IN (
      SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 1)
    )
      AND c_custkey NOT IN (
      SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    )
    """,
    doc="PlanBuilder.in_subquery + .not_in_subquery chained (reference IN "
    "decorrelation, builder/subqueries.rs:281-366): customers in regions "
    "0/1 who never placed a >300k order. The NOT IN subquery column "
    "(o_custkey) is NULL-free, so anti-join semantics equal standard "
    "NOT IN here (the nullable case is pinned SQL-side by "
    "subq_not_in_nulls).",
    tags=("builder", "subquery"),
)
def bld_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.builder import PlanBuilder

    b = PlanBuilder(spark)
    regions01 = (
        b.new_query().from_("nation").select("n_regionkey IN (0, 1)")
    )
    big_orders = (
        b.new_query().from_("orders").select("o_totalprice > 300000")
    )
    return (
        b.from_("customer")
        .in_subquery("c_nationkey", regions01, "n_nationkey")
        .not_in_subquery("c_custkey", big_orders, "o_custkey")
        .project(["c_custkey", "c_name", "c_nationkey"])
        .build()
    )


@df_query(
    "bld_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal, avg_bal,
           c_acctbal / avg_bal AS bal_ratio
    FROM customer,
         (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS avg_bal
          FROM customer)
    WHERE c_acctbal > avg_bal
    """,
    doc="PlanBuilder.scalar_subquery (VERDICT r05 missing item 1 — the "
    "builder face of the reference's Expr::SubQuery scalar expression, "
    "scalar/expr.rs:148 + sub_query_builder, builder/mod.rs:696-737): "
    "the global average account balance attached as a scalar column, "
    "used BOTH in the filter (c_acctbal > avg_bal) and in a projected "
    "expression (the ratio). The average is an exact decimal SUM plus "
    "a COUNT with ONE cast to double before the division, so the "
    "scalar is partition-order-independent and hash-matches DuckDB.",
    tags=("builder", "subquery", "scalar"),
)
def bld_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.builder import PlanBuilder

    b = PlanBuilder(spark)
    avg_bal = (
        b.sub_query_builder()
        .from_("customer")
        .aggregate_builder()
        .add_func("sum", "CAST(c_acctbal AS DECIMAL(18,2))", alias="s")
        .add_func("count", "*", alias="n")
        .build()
        .project(["CAST(s AS DOUBLE) / n AS avg_bal"])
    )
    return (
        b.from_("customer")
        .scalar_subquery(avg_bal, "avg_bal")
        .select("c_acctbal > avg_bal")
        .project(
            ["c_custkey", "c_acctbal", "avg_bal",
             "c_acctbal / avg_bal AS bal_ratio"]
        )
        .build()
    )
