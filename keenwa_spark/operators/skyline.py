"""Skyline (Pareto-front) operator — the multi-criteria dominance
filter from the DB literature (Börzsönyi/Kossmann/Stocker, ICDE 2001);
beyond-reference surface (keenwa has no preference operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from keenwa_spark.operators.ordered import with_global_prev_min

#: types with an order-preserving double shadow for tie bucketing
_CASTABLE = {"byte", "short", "integer", "long", "float", "double", "decimal"}


def _numeric_shadow(col: str, dtype) -> "F.Column":
    """Order-preserving double shadow of ``col`` (epoch for temporal
    types, plain cast for numerics, NULL otherwise — a NULL shadow just
    disables tie-splitting, it never affects results)."""
    name = dtype.typeName()
    if name in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(F.col(col)).cast("double")
    if name == "date":
        return F.datediff(F.col(col), F.to_date(F.lit("1970-01-01"))).cast("double")
    if name in _CASTABLE:
        return F.col(col).cast("double")
    return F.lit(None).cast("double")


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
    an earlier kept one. The running minimum is the TWO-PASS
    range-bucketed prefix-min (operators/ordered.py): per-bucket local
    windows in parallel plus broadcast exclusive bucket prefixes — no
    single-partition global window, so the plan survives an unbounded
    distinct (mx, mn) domain at 100 TB.

    Rows with a NULL measure on either axis are excluded up front:
    NULL never dominates and is never on a frontier (ADVICE r05 —
    previously a NULL minimize value could leak through the running
    min as a spurious frontier point).
    """
    pairs = (
        df.select(
            F.col(maximize_col).alias("mx"), F.col(minimize_col).alias("mn")
        )
        .where(F.col(maximize_col).isNotNull() & F.col(minimize_col).isNotNull())
        .distinct()
        # numeric shadow of mx for quantile bucketing (monotone, so
        # bucket order follows the mx DESC scan order; ties unsplit)
        .withColumn("__mxd", F.col("mx").cast("double"))
        # numeric shadow of mn so a heavy mx value (one maximize value
        # with a huge frontier of distinct mn) can tie-split instead of
        # becoming a single window partition
        .withColumn("__mnd", _numeric_shadow("mn", df.schema[minimize_col].dataType))
    )
    ranked = with_global_prev_min(
        pairs,
        order_by=["mx", "mn"],
        bucket_col="__mxd",
        min_of="mn",
        out_col="__pm",
        descending=True,
        tie_bucket_col="__mnd",
    )
    return (
        ranked.where(F.col("__pm").isNull() | (F.col("mn") < F.col("__pm")))
        .select(
            F.col("mx").alias(maximize_col),
            F.col("mn").alias(minimize_col),
        )
    )
