"""Skyline (Pareto-front) operator — the multi-criteria dominance
filter from the DB literature (Börzsönyi/Kossmann/Stocker, ICDE 2001);
beyond-reference surface (keenwa has no preference operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    maximize_col: str,
    minimize_col: str,
) -> DataFrame:
    """2-D skyline (Pareto front): the distinct (maximize, minimize)
    pairs not DOMINATED by any other — b dominates a when
    b.maximize >= a.maximize AND b.minimize <= a.minimize with at
    least one strict. The multi-criteria shortlist operator
    ("highest value, earliest date — show only the trade-off
    frontier").

    Linear sort-filter plan, never the quadratic NOT-EXISTS self-join:
    process distinct pairs in (maximize DESC, minimize ASC) order and
    keep a pair iff its minimize value beats the running minimum of
    everything before it — every dropped row is provably dominated by
    an earlier kept one. ONE global window over DISTINCT pairs
    (value-domain cardinality, not row count; partition by a coarse
    maximize-bucket first if the distinct domain itself is huge).
    """
    pairs = df.select(
        F.col(maximize_col).alias("mx"), F.col(minimize_col).alias("mn")
    ).distinct()
    w = Window.orderBy(F.col("mx").desc(), F.col("mn").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev_min = F.min("mn").over(w)
    return (
        pairs.withColumn("__pm", prev_min)
        .where(F.col("__pm").isNull() | (F.col("mn") < F.col("__pm")))
        .select(
            F.col("mx").alias(maximize_col),
            F.col("mn").alias(minimize_col),
        )
    )
