"""Gaps-and-islands and SCD2 run compression over keyed sequences.

Beyond-reference surface (keenwa has no time-series operators —
SURVEY.md §2 streaming note). Two classic warehouse temporal idioms:

- ``gaps_islands``: collapse a per-key integer sequence (e.g. active
  day numbers) into maximal consecutive runs — streak/retention
  analysis.
- ``scd2_compress``: collapse a per-key ordered attribute series into
  validity intervals ``[valid_from, valid_to)`` that change only when
  the attribute changes — building a slowly-changing-dimension type-2
  table from periodic snapshots or an event log.

Scale design (100 TB): both are window-only plans over a single
``(key)`` hash partitioning — ONE shuffle total, because every window
in the chain uses the same partition keys, so Catalyst inserts one
Exchange and reuses the sort. No joins, no self-joins (the naive
SQL-textbook formulation of islands is a self-join; the row_number
difference trick used here is linear). State per key is bounded by
that key's row count; pathological single-key skew is the same story
as any window (pre-split by coarse time range if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gaps_islands(
    df: DataFrame,
    keys: list[str],
    seq_col: str,
) -> DataFrame:
    """Maximal consecutive runs of the integer ``seq_col`` per key.

    Input rows must be distinct on (keys, seq_col) — call
    ``.distinct()`` first if they are not. Returns one row per island:
    the key columns, ``island_start``, ``island_end`` (inclusive), and
    ``island_len``.

    The difference ``seq - row_number()`` is constant exactly within a
    consecutive run, so grouping on it identifies islands without any
    self-join.
    """
    w = Window.partitionBy(*keys).orderBy(seq_col)
    grp = (F.col(seq_col) - F.row_number().over(w)).alias("__grp")
    return (
        df.select(*keys, seq_col, grp)
        .groupBy(*keys, "__grp")
        .agg(
            F.min(seq_col).alias("island_start"),
            F.max(seq_col).alias("island_end"),
            F.count(F.lit(1)).alias("island_len"),
        )
        .drop("__grp")
    )


def scd2_compress(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Compress a per-key ordered attribute series into SCD2 intervals.

    Input: one row per (keys, ts) observation of ``attr_cols`` (e.g. a
    daily snapshot, or the per-period winner of an event aggregation).
    Output: one row per maximal run of unchanged attributes —
    ``valid_from`` (first observation of the run), ``valid_to`` (start
    of the next run, NULL for the current/open run), ``n_obs``
    (observations in the run), and the attribute columns.

    Change detection is null-safe (a NULL→value transition opens a new
    interval). Three window passes, all over the same (keys → ts)
    partitioning: change flag (lag), run id (running sum), next-run
    start (lead) — one Exchange in the physical plan.
    """
    w = Window.partitionBy(*keys).orderBy(ts_col)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    # first row per key: lag is NULL on every attr → eqNullSafe false
    # only if the attr itself is non-null; force the first row to open
    # a run explicitly so all-NULL first attributes still start one.
    first = F.row_number().over(w) == 1
    flag = F.when(first | changed, F.lit(1)).otherwise(F.lit(0))
    runs = df.select(
        *keys, ts_col, *attr_cols, F.sum(flag).over(w).alias("__run")
    )
    per_run = runs.groupBy(*keys, "__run", *attr_cols).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    w_run = Window.partitionBy(*keys).orderBy("valid_from")
    return per_run.select(
        *keys,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(w_run).alias("valid_to"),
        "n_obs",
    )


def interval_coalesce(
    df: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping or touching intervals per key into maximal
    disjoint intervals (interval UNION — the continuous-time cousin of
    ``gaps_islands``): downtime windows that overlap collapse to one
    outage, per-session activity spans merge into coverage spans.

    Intervals are half-open [start, end); an interval starting exactly
    at another's end TOUCHES it and merges. Returns one row per merged
    interval: keys, ``merged_start``, ``merged_end``, ``n_intervals``.

    One key shuffle: order by (start, end), flag rows whose start
    exceeds the running max of all previous ends (a strictly new
    interval), running-sum the flags into group ids, aggregate. The
    running max makes containment cases correct — a short interval
    inside a long one must not split the group when the long one's end
    is still ahead.
    """
    s_us = F.unix_micros(F.col(start_col))
    e_us = F.unix_micros(F.col(end_col))
    w = Window.partitionBy(*keys).orderBy(s_us, e_us)
    prev_max_end = F.max(e_us).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_grp = F.when(
        prev_max_end.isNull() | (s_us > prev_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    grouped = df.select(
        *keys,
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
        F.sum(new_grp).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__grp"),
    )
    return (
        grouped.groupBy(*keys, "__grp")
        .agg(
            F.min("__s").alias("merged_start"),
            F.max("__e").alias("merged_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        )
        .drop("__grp")
    )
