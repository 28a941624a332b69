"""Rolling z-score anomaly detection over keyed time series.

Beyond-reference surface (keenwa has no time-series operators —
SURVEY.md §2 streaming note). The standard telemetry/metrics question:
which observations deviate from THEIR OWN key's trailing history? Each
row is scored against the mean/stddev of its key's observations in a
trailing time window that EXCLUDES the current row — so an anomaly is
judged only by what came before it, never by itself (a self-including
frame dilutes exactly the spikes it should flag).

Scale design (100 TB): one hash shuffle on the key, one sort per
partition, then a sliding RANGE frame whose bounds advance
monotonically — O(1) amortized per row, never re-scanning the frame.
The moments are decimal-exact running sums (SUM(x), SUM(x*x) as
DECIMAL), making results independent of partitioning AND verifiable
bit-for-bit against another engine; the built-in stddev's streaming
double accumulation is neither. Single-key skew: same story as any
window — pre-split by coarse time bucket if one key dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_zscore_anomaly(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    window_seconds: int,
    z_threshold: float = 3.0,
    min_obs: int = 5,
    value_scale: int = 6,
) -> DataFrame:
    """Score every row against its key's trailing-window history.

    Adds ``n_hist`` (observations in the trailing ``window_seconds``
    strictly before this row), ``mean_hist``/``std_hist`` (sample
    stats over that history; NULL when ``n_hist < min_obs`` or the
    history is constant), ``z`` ((value - mean)/std, NULL likewise),
    and ``is_anomaly`` (|z| > z_threshold; false when z is NULL).

    ``value_scale`` is the decimal scale used for the exact running
    moments — set it to the value column's actual precision.

    Magnitude bound: the windowed sum of squares rides
    DECIMAL(38, 2*value_scale), so it holds ~10^(38 - 2*scale) of
    squared-value mass per frame (scale 6: sum of v^2 up to 1e26 —
    e.g. 1e6 rows of |v| <= 1e10). Beyond that Spark's non-ANSI sum
    overflows to NULL and z goes silently NULL; lower ``value_scale``
    for large-magnitude series (same width choreography as
    hyperfunctions.time_weighted_avg).
    """
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    if min_obs < 2:
        raise ValueError("min_obs must be >= 2 (sample variance needs n>1)")

    epoch = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(*keys)
        .orderBy(epoch)
        .rangeBetween(-window_seconds * 1_000_000, -1)
    )
    dec = F.col(value_col).cast(f"decimal(18,{value_scale})")
    n = F.count(F.col(value_col)).over(w)
    s1 = F.sum(dec).over(w).cast("double")
    s2 = F.sum(dec * dec).over(w).cast("double")

    mean = s1 / n
    # var only under n >= min_obs (min_obs >= 2 keeps n-1 > 0 — the
    # raw formula would divide by zero on 1-observation histories,
    # and engines disagree on double x/0)
    var = F.when(
        n >= min_obs, (s2 - s1 * s1 / n) / (n - 1)
    )
    # gate on var > 0, not std > 0: float cancellation can leave var a
    # tiny negative for constant history, and sqrt of that is NaN —
    # which Spark's comparison rules order ABOVE every number
    ok = var > 0
    std = F.sqrt(var)
    z = F.when(ok, (F.col(value_col) - mean) / std)
    return df.select(
        *df.columns,
        n.cast("bigint").alias("n_hist"),
        F.when(ok, mean).alias("mean_hist"),
        F.when(ok, std).alias("std_hist"),
        z.alias("z"),
        F.coalesce(F.abs(z) > F.lit(z_threshold), F.lit(False)).alias(
            "is_anomaly"
        ),
    )
