"""Inline observed metrics: data-quality counters collected ON THE
SIDE of a pass the job is already making — Spark's ``observe`` API
wrapped for pipeline use.

At 100 TB the difference between "metrics from a second aggregation
pass" and "metrics observed during the write" is an entire extra scan
of the dataset. ``Observation`` attaches accumulator-style aggregates
to a plan node: they ride the action that materializes the DataFrame
(a write, a count) and cost nothing beyond the per-row accumulator
updates. Constraints inherited from Spark: aggregates only (no
distinct, no sort-dependent), one result per action, batch DataFrames
(streaming uses the listener's observed-metrics events instead).

Typical use::

    df2, obs = with_observed_stats(df, rows=F.count(F.lit(1)),
                                   null_keys=F.sum(F.col("k").isNull().cast("long")))
    df2.write.parquet(path)     # the pass that was happening anyway
    stats = obs.get             # {'rows': ..., 'null_keys': ...}
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def with_observed_stats(
    df: DataFrame, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate ``metrics`` to ``df``; returns the
    instrumented DataFrame (same rows) and the ``Observation`` whose
    ``.get`` yields the metric dict after the next action runs."""
    if not metrics:
        raise ValueError("at least one metric expression is required")
    obs = Observation()
    named = [c.alias(n) for n, c in metrics.items()]
    return df.observe(obs, *named), obs
