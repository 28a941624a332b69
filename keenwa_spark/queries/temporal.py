"""Temporal-operator queries: as-of join, range join, hypertable
rollup — the custom time-series operators Spark lacks as builtins,
each verified against a native DuckDB implementation (ASOF JOIN /
inequality join / grouped UNION) at sf0.01.

Beyond-reference surface (keenwa's join enum is equi/theta only,
reference ``operators/relational/join.rs:10-40``; no time-series
operators). Scale notes live on the operator modules
(``operators/asof.py``, ``operators/range_join.py``,
``operators/rollup.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from keenwa_spark.operators.asof import asof_join
from keenwa_spark.operators.range_join import range_join
from keenwa_spark.operators.rollup import time_rollup
from keenwa_spark.queries import df_query, sql_query


@df_query(
    "op_asof_attribution",
    oracle="""
    SELECT
      p.event_id AS purchase_id,
      p.user_id AS user_id,
      epoch_us(p.ts) AS purchase_epoch_us,
      v.event_id AS view_id,
      epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY purchase_id
    """,
    doc="Last-touch attribution: each purchase as-of-joined to the "
    "user's most recent prior view. Spark side is the union-sort-"
    "carry-forward plan (one shuffle on user_id); oracle is DuckDB's "
    "native ASOF LEFT JOIN.",
    tags=("temporal", "asof"),
)
def op_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.table("events")
    purchases = events.where(F.col("event_type") == "purchase")
    views = events.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    joined = asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts"
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_epoch_us"),
        F.col("view_id_right").alias("view_id"),
        (F.unix_micros("ts") - F.unix_micros("ts_right")).alias("lag_us"),
    ).orderBy("purchase_id")


@df_query(
    "op_range_join_error_windows",
    oracle="""
    SELECT
      w.event_id AS error_id,
      w.user_id AS user_id,
      COUNT(*) AS n_clicks,
      CAST(SUM(CAST(c.value AS DECIMAL(18,6))) AS DOUBLE) AS click_value
    FROM (SELECT event_id, user_id, ts AS lo, ts + INTERVAL 4 HOUR AS hi
          FROM events WHERE event_type = 'error') w
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = w.user_id AND w.lo <= c.ts AND c.ts < w.hi
    GROUP BY w.event_id, w.user_id
    ORDER BY error_id
    """,
    doc="Clicks inside each user's 4-hour post-error window via the "
    "binned range join (equi-join on (user_id, bin), ~5 bins per "
    "interval, never a nested loop); oracle is DuckDB's inequality "
    "join.",
    tags=("temporal", "range_join"),
)
def op_range_join_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.table("events")
    windows = events.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 4 HOUR")).alias("hi"),
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    matched = range_join(
        clicks, windows, point_ts="ts", lo="lo", hi="hi",
        on=["user_id"], bin_width_seconds=3600,
    )
    return (
        matched.groupBy("error_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("click_value"),
        )
        .orderBy("error_id")
    )


@df_query(
    "op_hypertable_rollup",
    oracle="""
    WITH hourly AS (
      SELECT
        'hour' AS grain,
        event_type,
        strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        COUNT(value) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
        MIN(value) AS vmin,
        MAX(value) AS vmax,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS vavg
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    daily AS (
      SELECT
        'day' AS grain,
        event_type,
        strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS bucket,
        COUNT(value) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
        MIN(value) AS vmin,
        MAX(value) AS vmax,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS vavg
      FROM events GROUP BY event_type, date_trunc('day', ts)
    )
    SELECT * FROM hourly UNION ALL SELECT * FROM daily
    ORDER BY grain, event_type, bucket
    """,
    doc="Continuous-aggregate rollup: hour partials from ONE raw scan, "
    "day re-aggregated from the hour partials (sum/count/min/max are "
    "decomposable; avg finalized per grain). Oracle recomputes each "
    "grain from raw — equality proves partial re-aggregation correct.",
    tags=("temporal", "rollup"),
)
def op_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.table("events")
    rolled = time_rollup(
        events, ts_col="ts", key_cols=["event_type"], value_col="value",
        grains=["hour", "day"],
    )
    return rolled.select(
        "grain",
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "n",
        "total",
        "vmin",
        "vmax",
        "vavg",
    ).orderBy("grain", "event_type", "bucket")


@df_query(
    "op_rollup_incremental",
    oracle="""
    SELECT
      'day' AS grain,
      event_type,
      strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS bucket,
      COUNT(value) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
      MIN(value) AS vmin,
      MAX(value) AS vmax,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS vavg
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY event_type, date_trunc('day', ts)
    ORDER BY event_type, bucket
    """,
    doc="Incremental continuous-aggregate REFRESH: stored day-grain "
    "partials over history (ts < 2024-01-20) merged with a new batch's "
    "partials (ts >= 2024-01-20) via rollup_merge — COUNT/SUM re-sum, "
    "MIN/MAX re-min/max on the bucket key, cost O(delta + touched "
    "buckets), never a history rescan. The oracle recomputes the whole "
    "rollup from ALL raw events; equality (decimal-exact, order-"
    "independent sums) proves merged == recomputed "
    "(operators/rollup.py rollup_partials/rollup_merge). NULL-ts "
    "records belong to no time bucket and drop from both incremental "
    "halves (NULL matches neither side of the cutoff) — the oracle "
    "filters to the same contract (all-NULL-column sweep find).",
    tags=("temporal", "rollup", "incremental"),
)
def op_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.rollup import (
        finalize_rollup,
        rollup_merge,
        rollup_partials,
    )

    events = spark.table("events")
    cutoff = "2024-01-20"
    stored = rollup_partials(
        events.where(F.col("ts") < cutoff),
        ts_col="ts", key_cols=["event_type"], value_col="value", grain="day",
    )
    delta = rollup_partials(
        events.where(F.col("ts") >= cutoff),
        ts_col="ts", key_cols=["event_type"], value_col="value", grain="day",
    )
    merged = finalize_rollup(rollup_merge(stored, delta), grain="day")
    return merged.select(
        "grain",
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "n",
        "total",
        "vmin",
        "vmax",
        "vavg",
    ).orderBy("event_type", "bucket")


@df_query(
    "op_interval_overlap",
    oracle="""
    SELECT
      e.user_id AS user_id,
      e.event_id AS error_id,
      epoch_us(e.ts) AS err_lo_us,
      epoch_us(e.ts) + 600000000 AS err_hi_us,
      p.event_id AS purchase_id,
      epoch_us(p.ts) AS pur_lo_us,
      epoch_us(p.ts) + 900000000 AS pur_hi_us
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id
     AND epoch_us(e.ts) < epoch_us(p.ts) + 900000000
     AND epoch_us(p.ts) < epoch_us(e.ts) + 600000000
    ORDER BY error_id, purchase_id
    """,
    doc="Interval x interval overlap join: per-user 10-minute error "
    "windows intersected with 15-minute purchase windows. Spark side "
    "is the bin-bucketed plan (operators/range_join.py "
    "interval_overlap_join): both sides explode into 5-minute bins and "
    "each qualifying pair meets exactly once, in the bin containing "
    "the overlap's start — no inequality-join pair blow-up, no dedup "
    "shuffle. Oracle is DuckDB's native inequality join.",
    tags=("temporal", "rangejoin"),
)
def op_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.range_join import interval_overlap_join

    events = spark.table("events")
    errors = events.where(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("err_lo"),
        F.expr("ts + INTERVAL 10 MINUTES").alias("err_hi"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pur_lo"),
        F.expr("ts + INTERVAL 15 MINUTES").alias("pur_hi"),
    )
    joined = interval_overlap_join(
        errors,
        purchases,
        "err_lo",
        "err_hi",
        "pur_lo",
        "pur_hi",
        on=["user_id"],
        bin_width_seconds=300,
    )
    return joined.select(
        "user_id",
        "error_id",
        F.unix_micros("err_lo").alias("err_lo_us"),
        F.unix_micros("err_hi").alias("err_hi_us"),
        "purchase_id",
        F.unix_micros("pur_lo").alias("pur_lo_us"),
        F.unix_micros("pur_hi").alias("pur_hi_us"),
    ).orderBy("error_id", "purchase_id")


@df_query(
    "op_time_resample",
    oracle="""
    WITH obs AS (
      SELECT user_id,
             (epoch_us(ts) // 86400000000) * 86400000000 AS bucket_us,
             ts, event_id, CAST(value AS DOUBLE) AS v
      FROM events WHERE user_id <= 30
    ),
    per_bucket AS (
      SELECT user_id, bucket_us, v AS last_v, n_obs FROM (
        SELECT user_id, bucket_us, v,
               ROW_NUMBER() OVER (PARTITION BY user_id, bucket_us
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               COUNT(*) OVER (PARTITION BY user_id, bucket_us) AS n_obs
        FROM obs WHERE v IS NOT NULL) x WHERE rn = 1
    ),
    bounds AS (
      SELECT user_id, MIN(bucket_us) AS lo, MAX(bucket_us) AS hi FROM obs
      GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(lo, hi, 86400000000)) AS bucket_us
      FROM bounds
    )
    SELECT g.user_id,
           strftime(make_timestamp(g.bucket_us), '%Y-%m-%d %H:%M:%S')
             AS bucket_ts,
           last_value(p.last_v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket_us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           CAST(COALESCE(p.n_obs, 0) AS BIGINT) AS n_obs
    FROM grid g
    LEFT JOIN per_bucket p
      ON g.user_id = p.user_id AND g.bucket_us = p.bucket_us
    ORDER BY g.user_id, g.bucket_us
    """,
    doc="Time-series resampling to a regular 1-day grid per user: "
    "empty days are EMITTED (sequence+explode off per-key bounds — "
    "Spark's window() cannot produce absent buckets) and forward-"
    "filled from the last observation; the in-bucket 'last' reduces "
    "via MAX(struct(ts, id, value)) — plain partial-aggregable MAX, "
    "no window — deterministic under the total (ts, id) order "
    "(operators/resample.py time_resample). All stages keyed by "
    "user_id: one bucket agg, one co-keyed join, one fill window.",
    tags=("temporal", "resample", "timeseries"),
)
def op_time_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.resample import time_resample

    events = spark.table("events").where("user_id <= 30")
    out = time_resample(
        events, key_col="user_id", ts_col="ts", value_col="value",
        step_seconds=86400, id_col="event_id",
    )
    return out.select(
        "user_id",
        F.col("bucket_ts").cast("string").alias("bucket_ts"),
        "value",
        "n_obs",
    ).orderBy("user_id", "bucket_ts")


@df_query(
    "op_asof_dim_enrich",
    oracle="""
    SELECT e.event_id,
           e.user_id,
           o.o_orderpriority AS priority_at_event,
           o.o_orderkey AS asof_orderkey
    FROM (SELECT * FROM events WHERE user_id <= 50) e
    ASOF LEFT JOIN orders o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    ORDER BY e.event_id
    """,
    doc="Slowly-changing-dimension enrichment via the SAME as-of "
    "operator as attribution (operators/asof.py): each event picks up "
    "the customer's most recent order attribute as of the event time "
    "— the temporal-dimension join pattern (SCD2 without an explicit "
    "end date: validity runs to the next change). Deterministic: "
    "(o_orderdate, o_orderkey) ties resolved by the operator's "
    "greatest-payload rule, mirrored in DuckDB's ASOF semantics on "
    "this data (one order per (custkey, date)).",
    tags=("temporal", "asof", "scd"),
)
def op_asof_dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.table("events").where("user_id <= 50").select(
        "event_id", "user_id", "ts"
    )
    orders = spark.table("orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        "o_orderpriority",
        "o_orderkey",
    )
    joined = asof_join(events, orders, on="user_id", left_ts="ts", right_ts="ts")
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderpriority_right").alias("priority_at_event"),
        F.col("o_orderkey_right").alias("asof_orderkey"),
    ).orderBy("event_id")

_TIME_RANGE_BODY = """
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
             PARTITION BY user_id ORDER BY {epoch}(ts)
             RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_3d,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY {epoch}(ts)
             RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_3d
    FROM events WHERE user_id <= 20
    ORDER BY user_id, event_id
"""

sql_query(
    "win_time_range_rolling",
    _TIME_RANGE_BODY.format(epoch="unix_micros"),
    oracle=_TIME_RANGE_BODY.format(epoch="epoch_us"),
    doc="Rolling TIME-window aggregate: trailing 3-day sum/count per "
    "user via a RANGE frame over the epoch-microsecond order key — "
    "the moving-window metric every time-series feature pipeline "
    "needs, as ONE window pass (one user_id shuffle; the range frame "
    "slides monotonically, never re-scanning the partition per row). "
    "Epoch numbers (unix_micros/epoch_us) make the frame bound "
    "engine-portable; the windowed SUM rides DECIMAL so the sliding "
    "accumulation is order-exact cross-engine.",
    tags=("window", "temporal", "superset"),
)


# ---------------------------------------------------------------------------
# CDC / state maintenance (operators/cdc.py) and run compression
# (operators/islands.py) — round-5 additions.

_SNAP_STATE = """
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
         strftime(MAX(CAST(ts AS DATE)), '%Y-%m-%d') AS last_day
  FROM events
  WHERE ts >= TIMESTAMP '{lo}' AND ts < TIMESTAMP '{hi}'
  GROUP BY user_id
"""


@df_query(
    "op_snapshot_diff",
    oracle=f"""
    WITH o AS ({_SNAP_STATE.format(lo='2024-01-06 00:00:00', hi='2024-01-16 00:00:00')}),
         n AS ({_SNAP_STATE.format(lo='2024-01-21 00:00:00', hi='2024-01-31 00:00:00')})
    SELECT
      COALESCE(n.user_id, o.user_id) AS user_id,
      CASE WHEN o.user_id IS NULL THEN 'insert'
           WHEN n.user_id IS NULL THEN 'delete'
           WHEN o.n_events IS NOT DISTINCT FROM n.n_events
                AND o.total_value IS NOT DISTINCT FROM n.total_value
                AND o.last_day IS NOT DISTINCT FROM n.last_day
           THEN 'unchanged'
           ELSE 'update' END AS change_type,
      o.n_events AS old_n_events,
      o.total_value AS old_total_value,
      o.last_day AS old_last_day,
      n.n_events AS new_n_events,
      n.total_value AS new_total_value,
      n.last_day AS new_last_day
    FROM o FULL OUTER JOIN n ON o.user_id = n.user_id
    WHERE NOT (o.user_id IS NOT NULL AND n.user_id IS NOT NULL
               AND o.n_events IS NOT DISTINCT FROM n.n_events
               AND o.total_value IS NOT DISTINCT FROM n.total_value
               AND o.last_day IS NOT DISTINCT FROM n.last_day)
    ORDER BY user_id
    """,
    doc="CDC snapshot diff: the trailing-10-day per-user activity "
    "state at Jan 16 vs Jan 31, classified insert/delete/update "
    "(operators/cdc.py snapshot_diff — one keyed full-outer join, "
    "null-safe compare in codegen); oracle recomputes both states and "
    "the CASE classification in DuckDB.",
    tags=("temporal", "cdc"),
)
def op_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.cdc import snapshot_diff

    events = spark.table("events")

    def state(lo: str, hi: str) -> DataFrame:
        return (
            events.where(
                (F.col("ts") >= F.lit(lo).cast("timestamp"))
                & (F.col("ts") < F.lit(hi).cast("timestamp"))
            )
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double")
                .alias("total_value"),
                F.date_format(F.max(F.to_date("ts")), "yyyy-MM-dd").alias("last_day"),
            )
        )

    old = state("2024-01-06 00:00:00", "2024-01-16 00:00:00")
    new = state("2024-01-21 00:00:00", "2024-01-31 00:00:00")
    return snapshot_diff(old, new, keys=["user_id"]).orderBy("user_id")


@df_query(
    "op_merge_upsert",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           strftime(MAX(CAST(ts AS DATE)), '%Y-%m-%d') AS last_day
    FROM events
    WHERE ts < TIMESTAMP '2024-01-31 00:00:00'
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="MERGE INTO analog: per-user lifetime state maintained by "
    "upserting a 10-day delta onto the prior base (operators/cdc.py "
    "merge_upsert: n_events/total_value combine='sum' over exact "
    "decimal partials, last_day 'greatest'; single keyed full-outer "
    "join). The oracle is the strongest possible: a direct recompute "
    "over the full period — merged state must equal recomputed state "
    "bit-for-bit.",
    tags=("temporal", "cdc"),
)
def op_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.cdc import merge_upsert

    events = spark.table("events")

    def state(lo: str | None, hi: str) -> DataFrame:
        cond = F.col("ts") < F.lit(hi).cast("timestamp")
        if lo is not None:
            cond = cond & (F.col("ts") >= F.lit(lo).cast("timestamp"))
        return (
            events.where(cond)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                # keep DECIMAL through the merge so base+delta is exact
                F.sum(F.col("value").cast("decimal(18,6)")).alias(
                    "total_value"
                ),
                F.date_format(F.max(F.to_date("ts")), "yyyy-MM-dd").alias("last_day"),
            )
        )

    base = state(None, "2024-01-21 00:00:00")
    delta = state("2024-01-21 00:00:00", "2024-01-31 00:00:00")
    merged = merge_upsert(
        base,
        delta,
        keys=["user_id"],
        combine={
            "n_events": "sum",
            "total_value": "sum",
            "last_day": "greatest",
        },
    )
    return merged.select(
        "user_id",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
        "last_day",
    ).orderBy("user_id")


@df_query(
    "op_activity_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS day_no
      FROM events
    ),
    g AS (
      SELECT user_id, day_no,
             day_no - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_no) AS grp
      FROM days
    )
    SELECT user_id,
           MIN(day_no) AS island_start,
           MAX(day_no) AS island_end,
           CAST(COUNT(*) AS BIGINT) AS island_len
    FROM g
    GROUP BY user_id, grp
    ORDER BY user_id, island_start
    """,
    doc="Gaps-and-islands: each user's maximal streaks of consecutive "
    "active days (operators/islands.py gaps_islands — the seq-minus-"
    "row_number linear plan, ONE user_id shuffle, no self-join); "
    "oracle is the same idiom in DuckDB SQL.",
    tags=("temporal", "islands"),
)
def op_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.islands import gaps_islands

    days = (
        spark.table("events")
        .select(
            "user_id",
            F.datediff(
                F.to_date("ts"), F.lit("2024-01-01").cast("date")
            ).alias("day_no"),
        )
        .distinct()
    )
    return gaps_islands(days, keys=["user_id"], seq_col="day_no").orderBy(
        "user_id", "island_start"
    )


@df_query(
    "op_scd2_intervals",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, event_type, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2, 3
    ),
    dom AS (
      SELECT user_id, day, event_type AS dominant
      FROM (
        SELECT user_id, day, event_type,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id, day
                 ORDER BY cnt DESC, event_type ASC
               ) AS rn
        FROM daily
      ) WHERE rn = 1
    ),
    flagged AS (
      SELECT user_id, day, dominant,
             CASE WHEN LAG(dominant) OVER (
               PARTITION BY user_id ORDER BY day
             ) IS DISTINCT FROM dominant THEN 1 ELSE 0 END AS chg
      FROM dom
    ),
    runs AS (
      SELECT user_id, day, dominant,
             SUM(chg) OVER (
               PARTITION BY user_id ORDER BY day
             ) AS run
      FROM flagged
    ),
    per_run AS (
      SELECT user_id, dominant, run,
             MIN(day) AS valid_from,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM runs GROUP BY user_id, dominant, run
    )
    SELECT user_id, dominant,
           strftime(valid_from, '%Y-%m-%d') AS valid_from,
           strftime(LEAD(valid_from) OVER (
             PARTITION BY user_id ORDER BY valid_from
           ), '%Y-%m-%d') AS valid_to,
           n_obs
    FROM per_run
    ORDER BY user_id, valid_from
    """,
    doc="SCD2 construction: each user's daily dominant event_type "
    "(deterministic count-then-name tie-break) compressed into "
    "validity intervals [valid_from, valid_to) that change only when "
    "the attribute changes — NULL valid_to marks the open run "
    "(operators/islands.py scd2_compress: lag-flag, running-sum run "
    "ids, lead for interval ends — all windows share one user_id "
    "partitioning); oracle replays the identical window chain in "
    "DuckDB.",
    tags=("temporal", "islands", "scd2"),
)
def op_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.islands import scd2_compress
    from pyspark.sql import Window

    daily = (
        spark.table("events")
        .groupBy("user_id", F.to_date("ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("user_id", "day").orderBy(
        F.col("cnt").desc(), F.col("event_type").asc()
    )
    dom = (
        daily.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "day", F.col("event_type").alias("dominant"))
    )
    return scd2_compress(
        dom, keys=["user_id"], ts_col="day", attr_cols=["dominant"]
    ).select(
        "user_id",
        "dominant",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
        "n_obs",
    ).orderBy("user_id", "valid_from")


@df_query(
    "op_rolling_anomaly",
    oracle="""
    WITH scored AS (
      SELECT user_id, event_id, value,
             COUNT(value) OVER w AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 259200000000 PRECEDING AND 1 PRECEDING)
    ),
    calc AS (
      SELECT user_id, event_id, value,
             CAST(n AS BIGINT) AS n_hist,
             s1 / n AS mean,
             CASE WHEN n >= 5 THEN (s2 - s1 * s1 / n) / (n - 1) END AS var
      FROM scored
    )
    SELECT user_id, event_id, n_hist,
           CASE WHEN var > 0 THEN mean END AS mean_hist,
           CASE WHEN var > 0 THEN sqrt(var) END AS std_hist,
           CASE WHEN var > 0 THEN (value - mean) / sqrt(var) END AS z,
           COALESCE(CASE WHEN var > 0
                    THEN abs((value - mean) / sqrt(var)) > 3.0 END,
                    FALSE) AS is_anomaly
    FROM calc
    ORDER BY event_id
    """,
    doc="Rolling z-score anomaly detection: each event scored against "
    "its user's trailing-3-day history, which EXCLUDES the current "
    "row (RANGE ... 1 PRECEDING) so spikes can't dilute their own "
    "baseline (operators/anomaly.py — one key shuffle, monotone "
    "sliding frame, decimal-exact running moments; min 5 prior "
    "observations). Oracle replays the identical frame and variance "
    "formula in DuckDB.",
    tags=("temporal", "anomaly", "window"),
)
def op_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.anomaly import rolling_zscore_anomaly

    scored = rolling_zscore_anomaly(
        spark.table("events").select("user_id", "event_id", "ts", "value"),
        keys=["user_id"],
        ts_col="ts",
        value_col="value",
        window_seconds=259200,
        z_threshold=3.0,
        min_obs=5,
    )
    return scored.select(
        "user_id", "event_id", "n_hist", "mean_hist", "std_hist", "z",
        "is_anomaly",
    ).orderBy("event_id")


@df_query(
    "op_changelog_compact",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY ts DESC NULLS LAST, event_id DESC
             ) AS rn
      FROM events
    )
    SELECT user_id,
           event_id AS last_event_id,
           event_type AS last_type,
           value AS last_value
    FROM ranked
    WHERE rn = 1 AND (event_type <> 'error' OR event_type IS NULL)
    ORDER BY user_id
    """,
    doc="Kafka-style log compaction: each user's event stream treated "
    "as a changelog, compacted to the latest record per key with "
    "'error' as the tombstone op — keys whose newest record is a "
    "tombstone disappear (operators/cdc.py changelog_compact: one key "
    "shuffle + per-partition sort, event_id as the deterministic "
    "equal-ts tie-break). A NULL op is a malformed record, NOT a "
    "tombstone — the operator's null-safe inequality keeps the key "
    "and the oracle replays it (all-NULL-column sweep find; NULLS "
    "LAST pinned to Spark's DESC default).",
    tags=("temporal", "cdc"),
)
def op_changelog_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.cdc import changelog_compact

    compacted = changelog_compact(
        spark.table("events").select(
            "user_id", "event_id", "event_type", "value", "ts"
        ),
        keys=["user_id"],
        ts_col="ts",
        op_col="event_type",
        tie_cols=["event_id"],
        delete_op="error",
    )
    return compacted.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    ).orderBy("user_id")


@df_query(
    "op_time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id, value,
             epoch_us(LEAD(ts) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             )) - epoch_us(ts) AS dt
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    agg AS (
      SELECT user_id,
             SUM(CAST(value AS DECIMAL(20,6))
                 * CAST(dt AS DECIMAL(14,0))) AS wvs,
             CAST(SUM(dt) AS DOUBLE) AS den,
             CAST(COALESCE(SUM(dt), 0) AS BIGINT) AS duration_us,
             CAST(COUNT(value) AS BIGINT) AS n_obs
      FROM seg GROUP BY user_id
    )
    SELECT user_id,
           (CAST(FLOOR(wvs) AS DOUBLE)
            + CAST((wvs - FLOOR(wvs)) * 1000000 AS BIGINT)
              / CAST(1000000 AS DOUBLE)) / den AS twa,
           duration_us, n_obs
    FROM agg ORDER BY user_id
    """,
    doc="Time-weighted average (TimescaleDB time_weight 'LOCF'): each "
    "observation weighted by how long it stayed the live value — the "
    "correct mean for irregular telemetry where plain AVG over-weights "
    "chatty periods (operators/hyperfunctions.py time_weighted_avg — "
    "one key shuffle, lead window, exact DECIMAL x integer-microsecond "
    "accumulation, one final double division).",
    tags=("temporal", "hyperfunction"),
)
def op_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.hyperfunctions import time_weighted_avg

    return time_weighted_avg(
        spark.table("events"),
        keys=["user_id"],
        ts_col="ts",
        value_col="value",
        method="locf",
        tie_cols=["event_id"],
    ).orderBy("user_id")


@df_query(
    "op_state_durations",
    oracle="""
    WITH seg AS (
      SELECT user_id, event_type AS state,
             epoch_us(LEAD(ts) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             )) - epoch_us(ts) AS dt
      FROM events
    ),
    per_state AS (
      SELECT user_id, state,
             CAST(SUM(dt) AS BIGINT) AS duration_us,
             CAST(COUNT(*) AS BIGINT) AS n_intervals
      FROM seg WHERE dt IS NOT NULL GROUP BY user_id, state
    )
    SELECT user_id, state, duration_us, n_intervals,
           CAST(duration_us AS DOUBLE)
             / CAST(SUM(duration_us) OVER (PARTITION BY user_id) AS DOUBLE)
             AS share
    FROM per_state ORDER BY user_id, state
    """,
    doc="State-duration accounting (TimescaleDB state_agg): time each "
    "user spends in each event_type 'state', the state holding until "
    "the next observation; last open interval excluded "
    "(operators/hyperfunctions.py state_durations — exact integer-"
    "microsecond durations plus per-key share).",
    tags=("temporal", "hyperfunction"),
)
def op_state_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.hyperfunctions import state_durations

    return state_durations(
        spark.table("events"),
        keys=["user_id"],
        ts_col="ts",
        state_col="event_type",
        tie_cols=["event_id"],
    ).orderBy("user_id", "state")


@df_query(
    "op_counter_delta",
    oracle="""
    WITH seg AS (
      SELECT user_id,
             CAST(value AS DECIMAL(18,6)) AS v,
             LAG(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS prev
      FROM events WHERE value IS NOT NULL
    )
    SELECT user_id,
           CAST(COALESCE(SUM(CASE WHEN prev IS NULL THEN NULL
                                  WHEN v >= prev THEN v - prev
                                  ELSE v END), 0) AS DOUBLE)
             AS counter_increase,
           CAST(SUM(CASE WHEN prev IS NOT NULL AND v < prev
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
           CAST(COUNT(*) AS BIGINT) AS n_obs
    FROM seg GROUP BY user_id ORDER BY user_id
    """,
    doc="Counter-reset aggregation (TimescaleDB counter_agg): total "
    "increase of a per-user counter where a drop means the counter "
    "restarted from zero — per pair, the increase is v - prev when "
    "non-negative, else v (operators/hyperfunctions.py counter_delta "
    "— exact decimal deltas, reset count carried alongside).",
    tags=("temporal", "hyperfunction"),
)
def op_counter_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.hyperfunctions import counter_delta

    return counter_delta(
        spark.table("events"),
        keys=["user_id"],
        ts_col="ts",
        value_col="value",
        tie_cols=["event_id"],
    ).orderBy("user_id")


@df_query(
    "op_asof_forward",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         e AS (SELECT * FROM events WHERE event_type = 'error'),
    ranked AS (
      SELECT p.event_id AS purchase_id, p.user_id, p.ts AS pts,
             e.event_id AS error_id, e.ts AS ets,
             ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY e.ts ASC, e.event_id DESC
             ) AS rn
      FROM p JOIN e ON e.user_id = p.user_id AND e.ts >= p.ts
    )
    SELECT p.event_id AS purchase_id, p.user_id,
           r.error_id AS next_error_id,
           epoch_us(r.ets) - epoch_us(p.ts) AS wait_us
    FROM p
    LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
      ON r.purchase_id = p.event_id
    ORDER BY purchase_id
    """,
    doc="FORWARD as-of join: each purchase matched to the user's NEXT "
    "error at-or-after it (time-to-next-failure). Same single-shuffle "
    "union-and-carry plan as the backward as-of — the struct's leading "
    "order key is negated epoch, so the running max carries the "
    "nearest future row (operators/asof.py direction='forward'); "
    "oracle replays the match as a ranked inequality join in DuckDB.",
    tags=("temporal", "asof"),
)
def op_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.table("events")
    purchases = events.where(F.col("event_type") == "purchase")
    errors = events.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("next_error_id")
    )
    joined = asof_join(
        purchases, errors, on="user_id", left_ts="ts", right_ts="ts",
        direction="forward",
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("next_error_id_right").alias("next_error_id"),
        (F.unix_micros("ts_right") - F.unix_micros("ts")).alias("wait_us"),
    ).orderBy("purchase_id")


@df_query(
    "op_ohlc_bars",
    oracle="""
    WITH base AS (
      SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY epoch_us(ts) ASC, event_id ASC
             ) AS rn_a,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY epoch_us(ts) DESC, event_id DESC
             ) AS rn_d
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type, bucket,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS volume
    FROM base GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="OHLC candlestick bars per (event_type, hour): open/high/low/"
    "close/count/volume in ONE aggregation pass — open and close ride "
    "min_by/max_by over an (epoch, event_id) struct for deterministic "
    "first/last under equal timestamps (operators/hyperfunctions.py "
    "ohlc_bars); the oracle replays first/last as ranked windows in "
    "DuckDB.",
    tags=("temporal", "hyperfunction", "downsample"),
)
def op_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.hyperfunctions import ohlc_bars

    bars = ohlc_bars(
        spark.table("events"),
        keys=["event_type"],
        ts_col="ts",
        value_col="value",
        grain="hour",
        tie_cols=["event_id"],
    )
    return bars.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "open", "high", "low", "close", "n", "volume",
    ).orderBy("event_type", "bucket")


@df_query(
    "op_time_interpolate",
    oracle="""
    WITH obs AS (
      SELECT user_id,
             (epoch_us(ts) // 86400000000) * 86400000000 AS bucket_us,
             ts, event_id, CAST(value AS DOUBLE) AS v
      FROM events WHERE user_id <= 30
    ),
    per_bucket AS (
      SELECT user_id, bucket_us, v AS last_v, n_obs FROM (
        SELECT user_id, bucket_us, v,
               ROW_NUMBER() OVER (PARTITION BY user_id, bucket_us
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               COUNT(*) OVER (PARTITION BY user_id, bucket_us) AS n_obs
        FROM obs WHERE v IS NOT NULL) x WHERE rn = 1
    ),
    bounds AS (
      SELECT user_id, MIN(bucket_us) AS lo, MAX(bucket_us) AS hi FROM obs
      GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(lo, hi, 86400000000)) AS bucket_us
      FROM bounds
    ),
    anchored AS (
      SELECT g.user_id, g.bucket_us, p.last_v, p.n_obs,
             last_value(p.last_v IGNORE NULLS) OVER wp AS prev_v,
             last_value(CASE WHEN p.last_v IS NOT NULL
                             THEN g.bucket_us END IGNORE NULLS)
               OVER wp AS prev_x,
             first_value(p.last_v IGNORE NULLS) OVER wn AS next_v,
             first_value(CASE WHEN p.last_v IS NOT NULL
                              THEN g.bucket_us END IGNORE NULLS)
               OVER wn AS next_x
      FROM grid g
      LEFT JOIN per_bucket p
        ON p.user_id = g.user_id AND p.bucket_us = g.bucket_us
      WINDOW
        wp AS (PARTITION BY g.user_id ORDER BY g.bucket_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wn AS (PARTITION BY g.user_id ORDER BY g.bucket_us
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id,
           strftime(make_timestamp(bucket_us), '%Y-%m-%d %H:%M:%S')
             AS bucket_ts,
           CASE WHEN last_v IS NOT NULL THEN last_v
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                THEN prev_v + (next_v - prev_v)
                     * (CAST(bucket_us - prev_x AS DOUBLE)
                        / CAST(next_x - prev_x AS DOUBLE))
           END AS value,
           CAST(COALESCE(n_obs, 0) AS BIGINT) AS n_obs,
           CASE WHEN last_v IS NOT NULL THEN 'obs'
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                THEN 'interp' ELSE 'edge' END AS src
    FROM anchored
    ORDER BY user_id, bucket_us
    """,
    doc="Linear-interpolation gap filling (TimescaleDB interpolate, "
    "vs op_time_resample's LOCF): interior empty buckets get the "
    "straight line between the previous and next observed bucket "
    "values, weighted by exact integer bucket distance; edge gaps "
    "stay NULL and every row is labeled obs/interp/edge "
    "(operators/resample.py time_resample_interpolate — grid spine + "
    "one key window pass, four anchors sharing one partitioning).",
    tags=("temporal", "resample", "interpolate"),
)
def op_time_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.resample import time_resample_interpolate

    out = time_resample_interpolate(
        spark.table("events").where(F.col("user_id") <= 30),
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        step_seconds=86400,
        id_col="event_id",
    )
    return out.select(
        "user_id",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "value", "n_obs", "src",
    ).orderBy("user_id", "bucket_ts")


@df_query(
    "op_interval_coalesce",
    oracle="""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL 2 HOUR AS e, event_id
      FROM events WHERE event_type = 'error'
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN MAX(epoch_us(e)) OVER (
                    PARTITION BY user_id ORDER BY epoch_us(s), epoch_us(e)
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) IS NULL
                  OR epoch_us(s) > MAX(epoch_us(e)) OVER (
                    PARTITION BY user_id ORDER BY epoch_us(s), epoch_us(e)
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  )
             THEN 1 ELSE 0 END AS new_grp
      FROM iv
    ),
    grouped AS (
      SELECT user_id, s, e,
             SUM(new_grp) OVER (
               PARTITION BY user_id ORDER BY epoch_us(s), epoch_us(e)
             ) AS grp
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(s), '%Y-%m-%d %H:%M:%S.%f') AS merged_start,
           strftime(MAX(e), '%Y-%m-%d %H:%M:%S.%f') AS merged_end,
           CAST(COUNT(*) AS BIGINT) AS n_intervals
    FROM grouped GROUP BY user_id, grp
    ORDER BY user_id, merged_start
    """,
    doc="Interval coalescing (interval UNION): each user's 2-hour "
    "post-error windows merged into maximal disjoint outage spans — "
    "overlapping or touching windows collapse, and the running-max-of-"
    "ends flag keeps containment correct (a short window inside a "
    "long one never splits the span) "
    "(operators/islands.py interval_coalesce — one key shuffle, "
    "lag-free window chain); oracle replays the identical chain.",
    tags=("temporal", "islands", "interval"),
)
def op_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.islands import interval_coalesce

    iv = (
        spark.table("events")
        .where(F.col("event_type") == "error")
        .select(
            "user_id",
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 2 HOUR")).alias("w_end"),
        )
    )
    out = interval_coalesce(
        iv, keys=["user_id"], start_col="w_start", end_col="w_end"
    )
    return out.select(
        "user_id",
        F.date_format("merged_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "merged_start"
        ),
        F.date_format("merged_end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "merged_end"
        ),
        "n_intervals",
    ).orderBy("user_id", "merged_start")


@df_query(
    "op_uptime_gaps",
    oracle="""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL 2 HOUR AS e
      FROM events WHERE event_type = 'error'
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN MAX(epoch_us(e)) OVER (
                    PARTITION BY user_id ORDER BY epoch_us(s), epoch_us(e)
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) IS NULL
                  OR epoch_us(s) > MAX(epoch_us(e)) OVER (
                    PARTITION BY user_id ORDER BY epoch_us(s), epoch_us(e)
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  )
             THEN 1 ELSE 0 END AS new_grp
      FROM iv
    ),
    grouped AS (
      SELECT user_id, s, e,
             SUM(new_grp) OVER (
               PARTITION BY user_id ORDER BY epoch_us(s), epoch_us(e)
             ) AS grp
      FROM flagged
    ),
    merged AS (
      SELECT user_id, MIN(s) AS ms, MAX(e) AS me
      FROM grouped GROUP BY user_id, grp
    )
    SELECT user_id,
           strftime(me, '%Y-%m-%d %H:%M:%S.%f') AS gap_start,
           strftime(LEAD(ms) OVER (PARTITION BY user_id ORDER BY ms),
                    '%Y-%m-%d %H:%M:%S.%f') AS gap_end,
           epoch_us(LEAD(ms) OVER (PARTITION BY user_id ORDER BY ms))
             - epoch_us(me) AS gap_us
    FROM merged
    QUALIFY gap_end IS NOT NULL
    ORDER BY user_id, gap_start
    """,
    doc="Uptime accounting — the COMPLEMENT of interval coalescing: "
    "the gaps BETWEEN each user's merged outage spans (coalesce, then "
    "lead to the next span's start; open tail excluded). Composes "
    "operators/islands.py interval_coalesce with one more window over "
    "the same key partitioning.",
    tags=("temporal", "islands", "interval"),
)
def op_uptime_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from keenwa_spark.operators.islands import interval_coalesce

    iv = (
        spark.table("events")
        .where(F.col("event_type") == "error")
        .select(
            "user_id",
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 2 HOUR")).alias("w_end"),
        )
    )
    merged = interval_coalesce(
        iv, keys=["user_id"], start_col="w_start", end_col="w_end"
    )
    w = Window.partitionBy("user_id").orderBy("merged_start")
    gaps = merged.select(
        "user_id",
        F.col("merged_end").alias("gs"),
        F.lead("merged_start").over(w).alias("ge"),
    ).where(F.col("ge").isNotNull())
    return gaps.select(
        "user_id",
        F.date_format("gs", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("gap_start"),
        F.date_format("ge", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("gap_end"),
        (F.unix_micros("ge") - F.unix_micros("gs")).alias("gap_us"),
    ).orderBy("user_id", "gap_start")


@df_query(
    "op_ema_smoothing",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           list_reduce(
             list(CAST(value AS DOUBLE) ORDER BY epoch_us(ts), event_id),
             (a, b) -> a / 2 + b / 2
           ) AS ema
    FROM events
    WHERE value IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Exponential moving average per user with alpha = 1/2: the "
    "canonical recency-weighted smoother, folded sequentially over "
    "the (ts, event_id)-ordered series as acc/2 + v/2. alpha = 1/2 "
    "is deliberate: halving a double is EXACT (one bit of exponent), "
    "so every fold step is a correctly-rounded op identical in both "
    "engines — a general alpha would multiply by an inexact constant "
    "and drift in ulp over long series. Per-key fold over the "
    "collected ordered array (same per-key-collect caveat as the "
    "sequence-pattern operator).",
    tags=("temporal", "window", "smoothing"),
)
def op_ema_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("events")
        .where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
            F.expr(
                "aggregate("
                "array_sort(collect_list(struct(unix_micros(ts) AS e, "
                "event_id AS i, CAST(value AS DOUBLE) AS v))), "
                "CAST(NULL AS DOUBLE), "
                "(acc, x) -> CASE WHEN acc IS NULL THEN x.v "
                "ELSE acc / 2 + x.v / 2 END)"
            ).alias("ema"),
        )
        .orderBy("user_id")
    )


@df_query(
    "win_rolling_median",
    oracle="""
    SELECT user_id, event_id,
           quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS med7
    FROM events
    WHERE value IS NOT NULL AND user_id <= 20
    ORDER BY user_id, event_id
    """,
    doc="Rolling exact median (trailing 7 observations per user) — "
    "the robust smoother that shrugs off the spikes a rolling mean "
    "chases; the windowed twin of the robust-scaling family. Exact "
    "percentile as a WINDOW aggregate (Spark percentile == DuckDB "
    "quantile_cont, bit-equal interpolation) over a ROWS frame with "
    "the (epoch, event_id) deterministic order.",
    tags=("temporal", "window", "median"),
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")), F.col("event_id"))
        .rowsBetween(-6, 0)
    )
    return (
        spark.table("events")
        .where(F.col("value").isNotNull() & (F.col("user_id") <= 20))
        .select(
            "user_id",
            "event_id",
            F.percentile(F.col("value"), F.lit(0.5)).over(w).alias("med7"),
        )
        .orderBy("user_id", "event_id")
    )


@df_query(
    "op_skyline_orders",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT o_totalprice AS p, o_orderdate AS d FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
    )
    SELECT a.p AS o_totalprice,
           strftime(a.d, '%Y-%m-%d %H:%M:%S') AS o_orderdate
    FROM pairs a
    WHERE NOT EXISTS (
      SELECT 1 FROM pairs b
      WHERE b.p >= a.p AND b.d <= a.d AND (b.p > a.p OR b.d < a.d)
    )
    ORDER BY o_totalprice DESC
    """,
    doc="2-D skyline over orders — the Pareto frontier of (highest "
    "totalprice, earliest orderdate): no returned order is beaten on "
    "both axes by any other. The Spark plan is the LINEAR sort-filter "
    "skyline (one window over distinct pairs, running-min dominance "
    "test — operators/skyline.py); the oracle is the quadratic "
    "NOT-EXISTS definition, so the equality also PROVES the linear "
    "algorithm correct on this data. NULL-axis rows are excluded on "
    "both sides (skyline_2d's documented rule: NULL never dominates "
    "and is never on a frontier).",
    tags=("temporal", "skyline", "preference"),
)
def op_skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.skyline import skyline_2d

    front = skyline_2d(
        spark.table("orders"),
        maximize_col="o_totalprice",
        minimize_col="o_orderdate",
    )
    return front.select(
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
            "o_orderdate"
        ),
    ).orderBy(F.col("o_totalprice").desc())
