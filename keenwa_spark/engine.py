"""Engine: the top-level entry point (SQL + builder + catalog).

Plays the role of keenwa's OperatorFromSqlBuilder + Optimizer wiring
(reference examples/sql.rs:15-49, src/sql/mod.rs:38-83): given a query
and a catalog, produce an optimized executable plan. Here parsing,
name resolution, typing, and cost-based physical planning are all
Catalyst; the engine adds the dialect gate, the catalog/statistics
layer, and the fluent builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from keenwa_spark import dialect
from keenwa_spark.catalog import Catalog

class Engine:
    """SQL + DataFrame-builder frontend over Spark SQL.

    >>> eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    >>> eng.sql("SELECT count(*) AS n FROM lineitem").show()
    """

    def __init__(self, spark: SparkSession, sf_dir: str | None = None, strict: bool = False):
        self.spark = spark
        self.catalog = Catalog(spark)
        self.strict = strict
        if sf_dir:
            self.catalog.register_dir(sf_dir)

    # -- SQL entry point (reference src/sql/mod.rs:85-100 parse + build) --
    def sql(self, query: str) -> DataFrame:
        """Validate against the dialect then plan+execute via Catalyst.

        Under ``strict=True`` the query also goes through the 3VL
        shim for SELECT-list IN-subqueries (dialect.rewrite_strict,
        VERDICT r11 item 5): standard NULL results instead of Spark's
        ListQuery FALSE. The default lane keeps raw Spark behavior
        (pinned in conformance.py SUBQ)."""
        dialect.validate(query, strict=self.strict)
        if self.strict:
            query = dialect.rewrite_strict(query)
        return self.spark.sql(query)

    def explain(self, query: str, mode: str = "formatted") -> str:
        """Text physical plan — the analog of keenwa's plan formatter
        (reference src/operators/format.rs). Uses the documented
        ExplainMode path, not the private PythonSQLUtils bridge."""
        df = self.sql(query)
        jvm = self.spark._jvm  # type: ignore[attr-defined]
        explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        return df._jdf.queryExecution().explainString(explain_mode)  # type: ignore[attr-defined]

    def explain_df(self, df: DataFrame, mode: str = "formatted") -> str:
        """Plan text for an already-built DataFrame (builder output)."""
        jvm = self.spark._jvm  # type: ignore[attr-defined]
        explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        return df._jdf.queryExecution().explainString(explain_mode)  # type: ignore[attr-defined]

    def explain_keenwa(self, query_or_df: str | DataFrame) -> str:
        """The logical plan in keenwa's own plan-text vocabulary
        (LogicalProjection/LogicalSelect/LogicalJoin... — the format a
        reference user reads; keenwa_spark/presentation.py). Takes a
        SQL string (dialect-gated) or a built DataFrame."""
        from keenwa_spark.presentation import render_plan

        df = (
            self.sql(query_or_df)
            if isinstance(query_or_df, str)
            else query_or_df
        )
        return render_plan(df)

    # -- programmatic builder (reference src/operators/builder/mod.rs) --
    def builder(self):
        from keenwa_spark.builder import PlanBuilder

        return PlanBuilder(self.spark)

    def table(self, name: str) -> DataFrame:
        return self.catalog.table(name)
