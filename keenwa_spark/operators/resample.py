"""Time-series resampling: project irregular observations onto a
regular per-key time grid, carrying the last observation forward into
empty buckets.

The operator every metrics/feature pipeline needs before joining
series of different cadences (downsample ticks to minutes, upsample
sparse telemetry to a dense training grid). Spark has window() for
aggregation but nothing that EMITS the empty buckets; the grid here is
generated per key with sequence() so gaps exist to be filled.

Scale design — all work stays keyed by the series key:
- per-key [min, max] bounds: one tiny partial-aggregated shuffle;
- the grid is sequence()+explode off those bounds — rows = span/step
  per key, generated distributed, never on the driver;
- per-bucket "last observation" reduces via MAX(struct(ts, id, value))
  — a plain partial-aggregable MAX under struct lexicographic order,
  deterministic because (ts, id) is total; no window needed here;
- grid LEFT JOIN buckets is co-keyed (key, bucket) — with both sides
  hashed on the same key this is a local join after one shuffle each;
- the forward fill is ONE growing-frame IGNORE NULLS window per key,
  reusing the key partitioning.

Pick ``step_seconds`` so span/step per key stays sane (a 10-year
series at 1s steps is 300M grid rows per key — that's a usage error,
not an operator limitation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    id_col: str,
) -> DataFrame:
    """Regular grid per key from its first to last observation
    (bucket = floor(epoch/step)*step), with each bucket carrying the
    LAST observation in it (deterministic under (ts, id) order) and
    empty buckets forward-filled from the previous bucket.

    NULL-valued observations supply neither a bucket value nor an
    n_obs count (pandas ``resample().last()`` NaN semantics), so
    ``n_obs > 0`` always means ``value`` came from inside the bucket,
    never a forward-fill masked by a NULL last row. The GRID EXTENT,
    however, is computed from ALL observations — pandas keeps the
    index span through NaN rows — so leading/trailing NULL-only
    buckets are still emitted (as gaps), and a key whose observations
    are all NULL-valued yields its full grid of n_obs=0 rows with
    NULL values.

    Output: (key, bucket_ts TIMESTAMP, value DOUBLE, n_obs BIGINT) —
    n_obs = value-bearing observations inside the bucket (0 for
    filled gaps).
    """
    step = int(step_seconds)
    if step <= 0:
        raise ValueError(f"step_seconds must be positive, got {step}")
    step_us = step * 1_000_000

    all_bucketed = df.select(
        F.col(key_col),
        (F.floor(F.unix_micros(F.col(ts_col)) / step_us) * step_us).alias(
            "__bucket_us"
        ),
        F.col(ts_col),
        F.col(id_col),
        F.col(value_col).cast("double").alias("__v"),
    )
    bucketed = all_bucketed.where(F.col("__v").isNotNull())
    # last observation per bucket: MAX over (ts, id, value) structs —
    # lexicographic, total because (ts, id) is unique
    per_bucket = bucketed.groupBy(key_col, "__bucket_us").agg(
        F.max(F.struct(ts_col, id_col, "__v"))["__v"].alias("__last_v"),
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
    )
    # extent from ALL observations, value-bearing or not
    bounds = all_bucketed.groupBy(key_col).agg(
        F.min("__bucket_us").alias("__lo"), F.max("__bucket_us").alias("__hi")
    )
    grid = bounds.select(
        F.col(key_col),
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step_us))
        ).alias("__bucket_us"),
    )
    joined = grid.join(per_bucket, [key_col, "__bucket_us"], "left")
    from pyspark.sql.window import Window

    win = (
        Window.partitionBy(key_col)
        .orderBy("__bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(key_col),
        F.timestamp_micros(F.col("__bucket_us")).alias("bucket_ts"),
        F.last("__last_v", ignorenulls=True).over(win).alias("value"),
        F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
    )


def time_resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    id_col: str,
) -> DataFrame:
    """Regular grid per key with LINEAR interpolation across gaps —
    the TimescaleDB ``interpolate`` counterpart to ``time_resample``'s
    LOCF fill: an interior empty bucket gets the straight line between
    the previous and next OBSERVED bucket values (weighted by bucket
    distance); leading/trailing gaps stay NULL (nothing to anchor one
    end). ``src`` labels each row 'obs' | 'interp' | 'edge'.

    Same plan family as time_resample (grid spine + one key window
    pass — the four prev/next anchors all share one partitioning);
    interpolation is fixed-order double arithmetic on exact integer
    bucket positions, cross-engine deterministic.
    """
    step = int(step_seconds)
    if step <= 0:
        raise ValueError(f"step_seconds must be positive, got {step}")
    step_us = step * 1_000_000

    all_bucketed = df.select(
        F.col(key_col),
        (F.floor(F.unix_micros(F.col(ts_col)) / step_us) * step_us).alias(
            "__bucket_us"
        ),
        F.col(ts_col),
        F.col(id_col),
        F.col(value_col).cast("double").alias("__v"),
    )
    bucketed = all_bucketed.where(F.col("__v").isNotNull())
    per_bucket = bucketed.groupBy(key_col, "__bucket_us").agg(
        F.max(F.struct(ts_col, id_col, "__v"))["__v"].alias("__last_v"),
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
    )
    bounds = all_bucketed.groupBy(key_col).agg(
        F.min("__bucket_us").alias("__lo"), F.max("__bucket_us").alias("__hi")
    )
    grid = bounds.select(
        F.col(key_col),
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step_us))
        ).alias("__bucket_us"),
    )
    joined = grid.join(per_bucket, [key_col, "__bucket_us"], "left")

    from pyspark.sql.window import Window

    wprev = (
        Window.partitionBy(key_col)
        .orderBy("__bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wnext = (
        Window.partitionBy(key_col)
        .orderBy("__bucket_us")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # anchors as paired NULL-masked columns (v and x masked by the
    # SAME condition, so each pair comes from the same anchor row)
    masked_x = F.when(
        F.col("__last_v").isNotNull(), F.col("__bucket_us")
    )
    prev_v = F.last("__last_v", ignorenulls=True).over(wprev)
    prev_x = F.last(masked_x, ignorenulls=True).over(wprev)
    next_v = F.first("__last_v", ignorenulls=True).over(wnext)
    next_x = F.first(masked_x, ignorenulls=True).over(wnext)
    interp = prev_v + (next_v - prev_v) * (
        (F.col("__bucket_us") - prev_x).cast("double")
        / (next_x - prev_x).cast("double")
    )
    value = F.when(F.col("__last_v").isNotNull(), F.col("__last_v")).otherwise(
        F.when(prev_v.isNotNull() & next_v.isNotNull(), interp)
    )
    src = (
        F.when(F.col("__last_v").isNotNull(), F.lit("obs"))
        .when(prev_v.isNotNull() & next_v.isNotNull(), F.lit("interp"))
        .otherwise(F.lit("edge"))
    )
    return joined.select(
        F.col(key_col),
        F.timestamp_micros(F.col("__bucket_us")).alias("bucket_ts"),
        value.alias("value"),
        F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
        src.alias("src"),
    )
