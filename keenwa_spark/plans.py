"""Plan inspection — the analog of keenwa's plan formatter + the
plan-shape assertions this repo's scale discipline depends on.

keenwa renders its chosen physical plan as text (reference
src/operators/format.rs, 660 LoC) and its tests assert plan shape
(reference src/tests/mod.rs golden plans). Catalyst's plans are richer;
these helpers expose them uniformly and turn the scale rules
("dimensions broadcast", "no cartesians", "filters reach the scan")
into one-line assertions usable from tests AND notebooks.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    """Plan text via the documented ExplainMode path."""
    jvm = df.sparkSession._jvm  # type: ignore[attr-defined]
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(explain_mode)  # type: ignore[attr-defined]


def executed_plan_text(df: DataFrame) -> str:
    """Post-AQE executed plan (requires an action to have run for the
    final plan; otherwise shows the initial plan)."""
    return df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]


@dataclass
class PlanSummary:
    broadcast_joins: int
    sort_merge_joins: int
    nested_loop_joins: int
    cartesian_products: int
    exchanges: int
    python_evals: int
    pushed_filters: bool

    @property
    def is_star_join_shaped(self) -> bool:
        """The shape the scale rules want for dimension joins."""
        return (
            self.broadcast_joins > 0
            and self.sort_merge_joins == 0
            and self.cartesian_products == 0
        )


def summarize(df: DataFrame) -> PlanSummary:
    plan = explain_text(df)
    return PlanSummary(
        broadcast_joins=plan.count("BroadcastHashJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        nested_loop_joins=plan.count("BroadcastNestedLoopJoin"),
        cartesian_products=plan.count("CartesianProduct"),
        exchanges=plan.count("Exchange"),
        python_evals=(
            plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython")
            # deliberate Arrow-batch crossings (mapInPandas operators)
            # count too — a plan audit that hides them would claim
            # pure-JVM for plans that are not
            + plan.count("MapInPandas")
        ),
        pushed_filters="PushedFilters: [" in plan,
    )


def assert_scale_shape(
    df: DataFrame,
    broadcast_only_joins: bool = True,
    no_python: bool = True,
    pushed_filters: bool | None = None,
) -> PlanSummary:
    """Raise AssertionError (with the summary) when a plan violates the
    scale rules; returns the summary otherwise."""
    s = summarize(df)
    problems = []
    if broadcast_only_joins and (s.sort_merge_joins or s.cartesian_products):
        problems.append(f"non-broadcast joins: smj={s.sort_merge_joins} cart={s.cartesian_products}")
    if no_python and s.python_evals:
        problems.append(f"python eval nodes: {s.python_evals}")
    if pushed_filters and not s.pushed_filters:
        problems.append("no pushed filters reached the scan")
    if problems:
        raise AssertionError(f"plan violates scale shape: {'; '.join(problems)} ({s})")
    return s
