"""Hyperfunction analogs: time-weighted averages, state durations,
counter-reset aggregation — the TimescaleDB hyperfunction family for
irregularly-sampled telemetry, continuing the hypertable surface
(``operators/rollup.py``, ``operators/resample.py``).

Beyond-reference surface (keenwa has no time-series operators). Why a
plain AVG is wrong for telemetry: observations arrive irregularly, so
a sensor that reports 100x/min while idle and once/hour under load
drowns the interesting regime — each observation must be weighted by
how long it was the live value.

Scale design (100 TB): every operator here is ONE hash shuffle on the
keys, a per-partition sort, a ``lead`` window, and a map-side-combined
aggregation — the same structural floor as any keyed window. All
accumulation is exact: durations are integer microseconds, values ride
DECIMAL, products stay DECIMAL — partition-order-independent and
oracle-verifiable (the repo-wide discipline; a double running sum
would be neither). Pass ``tie_cols`` (a unique id) whenever exact-ts
duplicates are possible — without it, which observation "follows"
which is partition-order-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_weighted_avg(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    method: str = "locf",
    value_scale: int = 6,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key time-weighted average of an irregular series.

    ``method='locf'``: each observation holds until the next one
    (step function — counters, settings, states);
    ``method='linear'``: trapezoidal interpolation between consecutive
    observations (continuously-varying measurements).

    Returns one row per key: ``twa`` (NULL for keys with < 2
    observations — no elapsed time to weight), ``duration_us`` (covered
    span), ``n_obs``. The last observation closes the span and
    contributes no open-ended weight (TimescaleDB semantics). Rows with
    NULL value or ts are excluded first.
    """
    if method not in ("locf", "linear"):
        raise ValueError(f"method must be 'locf' or 'linear', got {method!r}")
    clean = df.where(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    order = [F.unix_micros(F.col(ts_col))] + [
        F.col(c) for c in (tie_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    # width choreography so value*dt is EXACT on both engines
    # (verified failure modes: a raw BIGINT dt pushes Spark's decimal
    # multiply past precision 38 and allowPrecisionLoss rounds every
    # product in the last ulp; a width-18 value leaves DuckDB's
    # operand int64-backed and the product overflows outright).
    # DECIMAL(20,s) forces the 128-bit path, DECIMAL(14,0) caps
    # per-gap spans at ~3 years, and 20+14+1 = 35 <= 38 keeps Spark
    # exact.
    dec = F.col(value_col).cast(f"decimal(20,{value_scale})")
    dt = (
        F.unix_micros(F.lead(ts_col).over(w)) - F.unix_micros(F.col(ts_col))
    ).cast("decimal(14,0)")
    # linear keeps (v_i + v_{i+1}) * dt exact in DECIMAL and defers the
    # trapezoid's /2 to the final double division — a per-row decimal
    # division would pick an engine-specific result scale and round
    if method == "locf":
        weighted, denom = dec * dt, F.lit(1)
    else:
        weighted, denom = (dec + F.lead(dec).over(w)) * dt, F.lit(2)
    seg = clean.select(
        *keys,
        F.col(value_col).alias("__v"),
        dt.alias("__dt"),
        weighted.alias("__wv"),
        denom.alias("__k"),
    )
    # the high-scale decimal numerator crosses into double via the
    # SPLIT cast (integer part + exact scale-fraction BIGINT / 10^s) —
    # a direct CAST is engine-implementation-rounded and measured
    # 1-ulp different between Spark and DuckDB (same discipline as
    # quality.zscore_scale; the oracle uses the identical split)
    scale_pow = 10**value_scale
    split = (
        "(CAST(FLOOR(__wvs) AS DOUBLE)"
        f" + CAST((__wvs - FLOOR(__wvs)) * {scale_pow} AS BIGINT)"
        f" / CAST({scale_pow} AS DOUBLE))"
    )
    return (
        seg.groupBy(*keys)
        .agg(
            F.sum("__wv").alias("__wvs"),
            (F.first("__k") * F.sum("__dt")).cast("double").alias("__den"),
            F.coalesce(F.sum("__dt"), F.lit(0)).cast("bigint").alias(
                "duration_us"
            ),
            F.count("__v").cast("bigint").alias("n_obs"),
        )
        .select(
            *keys,
            (F.expr(split) / F.col("__den")).alias("twa"),
            "duration_us",
            "n_obs",
        )
    )


def state_durations(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    state_col: str,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Time spent in each state per key (TimescaleDB ``state_agg``):
    each observation's state holds until the key's next observation;
    the final observation's open interval is excluded (its duration is
    unknown). One row per (key, state): ``duration_us``,
    ``n_intervals``, and ``share`` of the key's covered span.
    """
    order = [F.unix_micros(F.col(ts_col))] + [
        F.col(c) for c in (tie_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    dt = F.unix_micros(F.lead(ts_col).over(w)) - F.unix_micros(F.col(ts_col))
    seg = df.select(*keys, F.col(state_col).alias("state"), dt.alias("__dt"))
    per_state = (
        seg.where(F.col("__dt").isNotNull())
        .groupBy(*keys, "state")
        .agg(
            F.sum("__dt").cast("bigint").alias("duration_us"),
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        )
    )
    w_key = Window.partitionBy(*keys)
    return per_state.withColumn(
        "share",
        F.col("duration_us").cast("double")
        / F.sum("duration_us").over(w_key).cast("double"),
    )


def counter_delta(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    value_scale: int = 6,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Total increase of a monotonic counter that may RESET (process
    restart drops it to ~0) — TimescaleDB ``counter_agg`` semantics:
    per consecutive pair, the increase is ``v - prev`` when
    non-negative, else ``v`` (the counter restarted from zero and
    climbed to v). One row per key: ``counter_increase`` (exact
    decimal, as double), ``n_resets``, ``n_obs``.
    """
    order = [F.unix_micros(F.col(ts_col))] + [
        F.col(c) for c in (tie_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    dec = F.col(value_col).cast(f"decimal(18,{value_scale})")
    prev = F.lag(dec).over(w)
    delta = F.when(prev.isNull(), F.lit(None)).when(
        dec >= prev, dec - prev
    ).otherwise(dec)
    is_reset = F.when(
        prev.isNotNull() & (dec < prev), F.lit(1)
    ).otherwise(F.lit(0))
    seg = df.where(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        *keys,
        delta.alias("__d"),
        is_reset.alias("__r"),
    )
    return seg.groupBy(*keys).agg(
        F.coalesce(F.sum("__d"), F.lit(0)).cast("double").alias(
            "counter_increase"
        ),
        F.sum("__r").cast("bigint").alias("n_resets"),
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
    )


def ohlc_bars(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    grain: str = "hour",
    tie_cols: list[str] | None = None,
    value_scale: int = 6,
) -> DataFrame:
    """Candlestick downsampling: per (keys, time bucket) the OPEN
    (first value), HIGH, LOW, CLOSE (last value), observation count,
    and exact-decimal VOLUME (sum) — the financial-bars shape that
    also serves any metrics dashboard's downsampled series.

    One groupBy, all five aggregates in a single pass: open/close ride
    ``min_by``/``max_by`` over a (epoch, tie_cols) struct so
    first/last are deterministic under equal timestamps. NULL values
    are excluded.
    """
    order = F.struct(
        F.unix_micros(F.col(ts_col)).alias("__e"),
        *[F.col(c).alias(c) for c in (tie_cols or [])],
    )
    v = F.col(value_col)
    return (
        df.where(v.isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(
            *keys,
            F.date_trunc(grain, F.col(ts_col)).alias("bucket"),
        )
        .agg(
            F.min_by(v, order).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, order).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(v.cast(f"decimal(18,{value_scale})"))
            .cast("double")
            .alias("volume"),
        )
    )
