"""Hypertable-style time rollup: one pass over the raw data at the
finest grain, then coarser grains re-aggregated from the fine-grain
PARTIALS — the TimescaleDB continuous-aggregate / materialized-rollup
pattern.

Beyond-reference surface (keenwa has no time-series operators —
SURVEY.md §2 streaming note).

Scale design: at 100 TB the raw-data scan dominates everything, so it
must happen exactly once. Aggregating each grain directly from raw
(`GROUP BY date_trunc(g, ts)` per grain) scans the fact table G times;
here grain g+1 re-aggregates grain g's output, whose cardinality is
``n_keys x buckets(g)`` — a few orders of magnitude smaller than the
raw data. Partials are decomposable: COUNT re-sums, SUM re-sums, MIN/
MAX re-min/max, AVG is carried as (sum, count) and finalized per grain.
The coarse re-aggs are near-free map-side combines over tiny inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ordered fine -> coarse; each entry re-aggregates from the previous
_GRAIN_ORDER = ["minute", "hour", "day", "week", "month", "year"]


def time_rollup(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    grains: list[str] = ["hour", "day"],
    materialize: bool = True,
) -> DataFrame:
    """Multi-grain rollup of ``value_col`` per ``key_cols``: COUNT,
    decimal-exact SUM, MIN, MAX, and AVG (finalized from sum/count
    partials) at every grain in ``grains``, unioned with a ``grain``
    discriminator column and the bucket start as ``bucket_ts``.

    ``grains`` must be a subset of minute/hour/day/week/month/year in
    fine-to-coarse order; the finest is computed from ``df`` (the only
    full scan), each coarser one from the previous grain's partials.
    """
    order = [g for g in _GRAIN_ORDER if g in grains]
    if order != list(grains) or not grains:
        raise ValueError(
            f"grains must be fine-to-coarse from {_GRAIN_ORDER}, got {grains}"
        )
    if grains[0] == "week" and len(grains) > 1:
        raise ValueError("'week' cannot be the cascade base for coarser grains")

    fine = grains[0]
    # Lazy DAGs don't share subtrees: without materializing the fine
    # partial, every grain's Union branch would re-derive it and
    # re-SCAN THE RAW DATA once per grain. Caching the partial is the
    # in-session analog of the persisted continuous-aggregate table
    # (at 100 TB you'd write it to parquet instead); it is key-by-
    # bucket sized, orders of magnitude smaller than raw.
    partial = (
        df.groupBy(
            *key_cols, F.date_trunc(fine, F.col(ts_col)).alias("bucket_ts")
        ).agg(
            F.count(value_col).alias("__n"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__sum"),
            F.min(value_col).alias("__min"),
            F.max(value_col).alias("__max"),
        )
    )
    if materialize and len(grains) > 1:
        partial = partial.cache()

    # Weeks cross month boundaries: 'week' can re-aggregate FROM
    # minute/hour/day but nothing may re-aggregate from it, so it never
    # becomes the cascade base.
    levels = {fine: partial}
    base = partial
    for g in grains[1:]:
        prev = base
        levels[g] = (
            prev.groupBy(
                *key_cols, F.date_trunc(g, F.col("bucket_ts")).alias("bucket_ts2")
            )
            .agg(
                F.sum("__n").alias("__n"),
                F.sum("__sum").alias("__sum"),
                F.min("__min").alias("__min"),
                F.max("__max").alias("__max"),
            )
            .withColumnRenamed("bucket_ts2", "bucket_ts")
        )
        if g != "week":
            base = levels[g]

    finalized = [
        lv.select(
            F.lit(g).alias("grain"),
            *key_cols,
            "bucket_ts",
            F.col("__n").alias("n"),
            F.col("__sum").cast("double").alias("total"),
            F.col("__min").alias("vmin"),
            F.col("__max").alias("vmax"),
            (F.col("__sum").cast("double") / F.col("__n")).alias("vavg"),
        )
        for g, lv in levels.items()
    ]
    out = finalized[0]
    for f in finalized[1:]:
        out = out.unionByName(f)
    return out


def rollup_partials(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    grain: str = "hour",
) -> DataFrame:
    """The STORED form of a continuous aggregate: decomposable partials
    (__n, __sum decimal, __min, __max) per (keys, bucket_ts) at one
    grain — what you persist to parquet so later refreshes and coarser
    grains never rescan raw history."""
    if grain not in _GRAIN_ORDER:
        raise ValueError(f"grain must be one of {_GRAIN_ORDER}, got {grain}")
    return df.groupBy(
        *key_cols, F.date_trunc(grain, F.col(ts_col)).alias("bucket_ts")
    ).agg(
        F.count(value_col).alias("__n"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__sum"),
        F.min(value_col).alias("__min"),
        F.max(value_col).alias("__max"),
    )


def rollup_merge(stored: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental continuous-aggregate refresh: merge a new batch's
    partials into the stored partials — COUNT/SUM re-sum, MIN/MAX
    re-min/max — producing exactly the partials a full recompute over
    (history + delta) would.

    The 100 TB point: refresh cost is O(|delta| + |touched buckets|),
    never a rescan of history. Both sides are partials from
    ``rollup_partials`` (same keys/grain); the merge is one union +
    one map-side-combinable aggregate on the bucket key. Decimal __sum
    keeps the merge order-independent (bit-equal to recompute), so
    'merged == recomputed' is oracle-checkable, not just plausible."""
    keys = [c for c in stored.columns if not c.startswith("__")]
    return (
        stored.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("__n").alias("__n"),
            F.sum("__sum").alias("__sum"),
            F.min("__min").alias("__min"),
            F.max("__max").alias("__max"),
        )
    )


def finalize_rollup(partials: DataFrame, grain: str) -> DataFrame:
    """Partials -> the presented rollup row shape of time_rollup."""
    keys = [c for c in partials.columns if not c.startswith("__")]
    return partials.select(
        F.lit(grain).alias("grain"),
        *keys,
        F.col("__n").alias("n"),
        F.col("__sum").cast("double").alias("total"),
        F.col("__min").alias("vmin"),
        F.col("__max").alias("vmax"),
        (F.col("__sum").cast("double") / F.col("__n")).alias("vavg"),
    )
