"""Correctness-proving queries built with the PlanBuilder fluent API.

VERDICT r01 item 9: the builder is only 'done' when builder-built
queries appear in the oracle-checked inventory. These three cover the
builder's main method families (scan/filter/join/aggregate/order/limit,
set ops, DISTINCT ON + window), each against a plain-SQL DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from keenwa_spark.queries import df_query


@df_query(
    "bld_star_join_topk",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    HAVING COUNT(*) > 50
    ORDER BY revenue DESC, n_name
    LIMIT 5
    """,
    doc="PlanBuilder end-to-end: from->select->join_on x2->"
    "aggregate_builder(having)->order_by->limit (reference "
    "OperatorBuilder chain, builder/mod.rs:263-769).",
    tags=("builder",),
)
def bld_star_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.builder import PlanBuilder

    b = PlanBuilder(spark)
    return (
        b.from_("orders")
        .select("o_orderstatus = 'F'")
        .join_on(b.new_query().from_("customer"), "inner", "o_custkey = c_custkey")
        .join_on(b.new_query().from_("nation"), "inner", "c_nationkey = n_nationkey")
        .aggregate_builder()
        .add_column("n_name")
        .add_func("count", "*", alias="n_orders")
        .add_func(
            "CAST", "SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE", alias="revenue"
        )
        .having("n_orders > 50")
        .build()
        .order_by("revenue", "n_name", descending=[True, False])
        .limit(5)
        .build()
    )


@df_query(
    "bld_setops_semi",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    EXCEPT
    SELECT n_nationkey AS nationkey FROM nation WHERE n_regionkey = 4
    """,
    doc="PlanBuilder set-operator chain: intersect -> except_ (reference "
    "union/except/intersect family, builder/mod.rs:591-621).",
    tags=("builder", "setop"),
)
def bld_setops_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.builder import PlanBuilder

    b = PlanBuilder(spark)
    rich_cust = (
        b.from_("customer")
        .select("c_acctbal > 9500")
        .project(["c_nationkey AS nationkey"])
    )
    supp = b.new_query().from_("supplier").project(["s_nationkey AS nationkey"])
    region4 = (
        b.new_query()
        .from_("nation")
        .select("n_regionkey = 4")
        .project(["n_nationkey AS nationkey"])
    )
    return rich_cust.intersect(supp).except_(region4).build()


@df_query(
    "bld_distinct_on_window",
    oracle="""
    WITH latest AS (
      SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
      FROM orders
      ORDER BY o_custkey, o_orderdate DESC, o_orderkey
    )
    SELECT * FROM (
      SELECT l.o_custkey, l.o_orderkey, l.o_totalprice,
             CAST(ROW_NUMBER() OVER (ORDER BY l.o_totalprice DESC, l.o_orderkey)
                  AS BIGINT) AS price_rank
      FROM latest l
      WHERE l.o_totalprice > 400000
    ) WHERE price_rank <= 100
    """,
    doc="PlanBuilder distinct(on=...) (deterministic row_number DISTINCT "
    "ON emulation, SURVEY §7 risk 1) composed with window_aggregate — "
    "DuckDB oracle uses native DISTINCT ON. The global ranking is "
    "top-k-bounded (rank <= 100), so Spark plans a distributed "
    "TakeOrderedAndProject under the window: the single-partition "
    "window only ever sees 100 rows at any corpus size.",
    tags=("builder", "distinct", "window"),
)
def bld_distinct_on_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.builder import PlanBuilder

    b = PlanBuilder(spark)
    return (
        b.from_("orders")
        .distinct(
            on="o_custkey",
            order_by=["o_orderdate", "o_orderkey"],
            descending=[True, False],
        )
        .project(["o_custkey", "o_orderkey", "o_totalprice"])
        .select("o_totalprice > 400000")
        .window_aggregate(
            "ROW_NUMBER()",
            partition_by=[],
            order_by=["o_totalprice", "o_orderkey"],
            descending=[True, False],
            alias="price_rank",
        )
        .select("price_rank <= 100")
        .project(
            ["o_custkey", "o_orderkey", "o_totalprice",
             "CAST(price_rank AS BIGINT) AS price_rank"]
        )
        .build()
    )
