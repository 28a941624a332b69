"""Structured-Streaming queries in the driver contract.

Each entry runs the streaming pipeline to completion with
Trigger.AvailableNow (finite input -> finite result) and returns the
drained memory-sink table; because event-time logic is deterministic,
the result equals the batch twin and is fully DuckDB-oracle-checkable —
a correctness statement most streaming code never gets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from keenwa_spark.queries import df_query


def _stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream sources require a DIRECTORY; stage the single events
    parquet into a per-sf temp dir via symlink (no data copy)."""
    import hashlib
    import os
    import tempfile

    from keenwa_spark.streaming import read_event_stream

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    stage = os.path.join(tempfile.gettempdir(), f"keenwa_events_stream_{tag}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events-000.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    return read_event_stream(spark, stage)


@df_query(
    "st_window_counts",
    oracle="""
    SELECT
      CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS STRING) AS win_start,
      CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS STRING) AS win_end,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2, 3
    """,
    doc="Streaming watermarked 1-day tumbling-window counts "
    "(streaming/events.py windowed_type_counts), drained with "
    "AvailableNow — result provably equals the batch aggregation "
    "(oracle: plain GROUP BY date_trunc). NULL event times cannot be "
    "watermarked/windowed and are dropped by every event-time "
    "streaming operator; the four streaming oracles filter ts IS NOT "
    "NULL to the same contract (all-NULL-column sweep find).",
    tags=("streaming", "window"),
)
def st_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.streaming import run_available_now, windowed_type_counts

    out = run_available_now(
        windowed_type_counts(_stream_source(spark, sf_dir), window="1 day")
    )
    return out.select(
        F.col("win_start").cast("string").alias("win_start"),
        F.col("win_end").cast("string").alias("win_end"),
        "event_type",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    )


@df_query(
    "st_session_stats",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
        CASE WHEN epoch(ts) - epoch(
          LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        ) > 1800 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        THEN 1 ELSE 0 END AS new_session
      FROM events
      WHERE ts IS NOT NULL
    ),
    sessioned AS (
      SELECT user_id, ts,
        CAST(SUM(new_session) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
        ) AS BIGINT) AS session_seq
      FROM flagged
    )
    SELECT user_id,
           CAST(MIN(ts) AS STRING) AS session_start,
           CAST(MAX(ts) + INTERVAL 30 MINUTE AS STRING) AS session_end,
           COUNT(*) AS n_events
    FROM sessioned
    GROUP BY user_id, session_seq
    """,
    doc="Streaming sessionization via native session_window (30-min gap, "
    "streaming/events.py session_stats_stream) — boundaries provably "
    "identical to the batch lag->cumsum sessionizer; session_end is "
    "last-event + gap by session_window's definition, mirrored in the "
    "oracle.",
    tags=("streaming", "sessionize"),
)
def st_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.streaming import run_available_now, session_stats_stream

    out = run_available_now(
        session_stats_stream(_stream_source(spark, sf_dir), gap="30 minutes")
    )
    return out.select(
        "user_id",
        F.col("session_start").cast("string").alias("session_start"),
        F.col("session_end").cast("string").alias("session_end"),
        "n_events",
    )


@df_query(
    "st_dedup",
    oracle="""
    SELECT event_id, user_id, event_type,
           epoch_us(ts) AS ts_us,
           value
    FROM events
    """,
    doc="Streaming exact dedup under at-least-once delivery: the event "
    "stream UNIONed with itself (every event delivered twice) through "
    "dropDuplicatesWithinWatermark(event_id) — half the input rows are "
    "dropped, state is one entry per key EVICTED at the watermark "
    "(streaming/events.py dedup_stream). Deterministic because "
    "re-deliveries are byte-identical; oracle is the distinct batch "
    "relation.",
    tags=("streaming", "dedup"),
)
def st_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.streaming import dedup_stream, run_available_now

    stream = _stream_source(spark, sf_dir)
    redelivered = stream.union(_stream_source(spark, sf_dir))
    out = run_available_now(dedup_stream(redelivered), output_mode="append")
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "value",
    )


@df_query(
    "st_enrich",
    oracle="""
    SELECT e.event_id AS event_id,
           e.user_id AS user_id,
           e.event_type AS event_type,
           c.c_name AS c_name,
           c.c_mktsegment AS c_mktsegment
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
    doc="Stream-static dimension enrichment: each micro-batch left-joins "
    "the BROADCAST customer dim — the stream never shuffles, the only "
    "join shape that scales on a hot stream (streaming/events.py "
    "enrich_stream). Oracle is the batch left join.",
    tags=("streaming", "enrich"),
)
def st_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.queries import ensure_views
    from keenwa_spark.streaming import enrich_stream, run_available_now

    ensure_views(spark, sf_dir)
    dim = spark.table("customer").select("c_custkey", "c_name", "c_mktsegment")
    enriched = enrich_stream(
        _stream_source(spark, sf_dir),
        dim.withColumnRenamed("c_custkey", "user_id"),
    )
    out = run_available_now(enriched, output_mode="append")
    return out.select("event_id", "user_id", "event_type", "c_name", "c_mktsegment")


@df_query(
    "st_interval_join",
    oracle="""
    SELECT l.user_id,
           l.event_id AS l_event_id,
           CAST(epoch_us(CAST(l.ts AS TIMESTAMP)) AS BIGINT) AS l_ts_us,
           r.event_id AS r_event_id,
           CAST(epoch_us(CAST(r.ts AS TIMESTAMP)) AS BIGINT) AS r_ts_us
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND r.ts BETWEEN l.ts - INTERVAL 30 MINUTE AND l.ts + INTERVAL 30 MINUTE
    WHERE l.event_type = 'purchase' AND r.event_type = 'click'
    """,
    doc="Stream-STREAM interval join (purchase x click within +/-30min "
    "per user): both sides watermarked, the event-time range condition "
    "bounds the buffered join state (without it stream-stream state "
    "grows forever — a correctness requirement, not a tuning knob). "
    "Drained with AvailableNow; oracle is the batch interval join "
    "(streaming/events.py interval_join_streams).",
    tags=("streaming", "join"),
)
def st_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.streaming import interval_join_streams, run_available_now

    left = _stream_source(spark, sf_dir).filter("event_type = 'purchase'")
    right = _stream_source(spark, sf_dir).filter("event_type = 'click'")
    out = run_available_now(
        interval_join_streams(left, right, within="30 minutes"),
        output_mode="append",
    )
    return out.select(
        "user_id",
        "l_event_id",
        F.unix_micros("l_ts").alias("l_ts_us"),
        "r_event_id",
        F.unix_micros("r_ts").alias("r_ts_us"),
    )


@df_query(
    "st_rollup_day",
    oracle="""
    SELECT
      strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
        AS day,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="Streaming continuous aggregate (the Lambda handoff): hourly "
    "partials stream in under a watermark (windowed_type_counts), the "
    "day grain re-aggregates the DRAINED partials in batch — raw events "
    "are only ever aggregated by the stream; the oracle recomputes the "
    "day grain from raw, so equality proves partial re-aggregation "
    "through the streaming boundary. Hourly totals cross the boundary "
    "as DECIMAL(18,6) (never double), so the day re-sum is exact at "
    "any scale; double appears only in the final presentation cast.",
    tags=("streaming", "rollup"),
)
def st_rollup_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.streaming import run_available_now, windowed_type_counts

    hourly = run_available_now(
        windowed_type_counts(_stream_source(spark, sf_dir), window="1 hour")
    )
    return (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", "win_start"), "yyyy-MM-dd HH:mm:ss").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            # partials arrive as DECIMAL(18,6): the re-sum is exact
            F.sum("total_value").cast("double").alias("total_value"),
        )
    )


@df_query(
    "st_user_state",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Custom stateful streaming (applyInPandasWithState): the "
    "per-user lifetime tracker's final snapshot must equal the batch "
    "GROUP BY — state accumulated across micro-batches in the state "
    "store, verified against the all-at-once answer. The exact integer "
    "counters are compared (the float total_value column is "
    "pandas-summation-order-dependent and is covered by the tolerance "
    "tests in tests/test_stateful_streaming.py instead); snapshots are "
    "max-reduced per user so the check is robust to multi-batch "
    "admission emitting intermediate snapshots.",
    tags=("streaming", "stateful"),
)
def st_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.streaming import run_available_now
    from keenwa_spark.streaming.stateful import user_activity_tracker

    out = run_available_now(
        user_activity_tracker(_stream_source(spark, sf_dir)),
        output_mode="update",
    )
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").cast("bigint").alias("n_events"),
            F.max("n_purchases").cast("bigint").alias("n_purchases"),
        )
        .orderBy("user_id")
    )


@df_query(
    "st_rollup_refresh",
    oracle="""
    SELECT
      event_type,
      strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
        AS bucket,
      COUNT(value) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
      MIN(value) AS vmin,
      MAX(value) AS vmax
    FROM events
    GROUP BY event_type, date_trunc('day', ts)
    ORDER BY event_type, bucket
    """,
    doc="Streaming continuous-aggregate MAINTENANCE: micro-batches fold "
    "into a persisted day-grain partials store via foreachBatch + "
    "rollup_merge (streaming/rollup.py) — O(batch + touched buckets) "
    "per trigger, history never recomputed — then the store finalizes "
    "to presented rows. The oracle recomputes the rollup from ALL raw "
    "events; equality proves the incremental maintenance path exact "
    "(decimal partials, order-independent) through the streaming "
    "boundary.",
    tags=("streaming", "rollup", "incremental"),
)
def st_rollup_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.operators.rollup import finalize_rollup
    from keenwa_spark.session import session_scratch_dir
    from keenwa_spark.streaming.rollup import rollup_refresh_stream

    # session-owned store dir (removed at interpreter exit, not here):
    # the returned DataFrame stays a LAZY read of the persisted store —
    # no driver-side materialization of the state table (VERDICT r07
    # wrong-item 1)
    work = session_scratch_dir("st_rollup_")
    store, ckpt = f"{work}/store", f"{work}/ckpt"
    query = rollup_refresh_stream(
        _stream_source(spark, sf_dir),
        store_path=store, checkpoint_path=ckpt, grain="day",
    )
    # awaitTermination returns False on timeout WITHOUT raising —
    # finalizing then would silently present a half-built store
    if not query.awaitTermination(300):
        query.stop()
        raise TimeoutError("st_rollup_refresh stream did not drain in 300s")
    final = finalize_rollup(spark.read.parquet(store), grain="day")
    return final.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "n", "total", "vmin", "vmax",
    ).orderBy("event_type", "bucket")


@df_query(
    "st_sketch_distinct",
    oracle="""
    SELECT
      strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
        AS win_start,
      event_type,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
      TRUE AS approx_ok
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="STREAMING approximate distinct users per (day window, type): "
    "exact COUNT(DISTINCT) cannot run incrementally (it would buffer "
    "every distinct value per open window) but HLL++ is mergeable "
    "fixed-size state under the same watermark eviction "
    "(streaming/events.py approx_distinct_stream). The registry row "
    "checks the sketch contract: each streamed estimate within the "
    "3-sigma band of the batch-exact count.",
    tags=("streaming", "sketch"),
)
def st_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.streaming import run_available_now
    from keenwa_spark.streaming.events import approx_distinct_stream

    rsd = 0.05
    est = run_available_now(
        approx_distinct_stream(_stream_source(spark, sf_dir), rsd=rsd)
    ).select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "approx_users",
    )
    exact = (
        spark.table("events")
        .groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")),
                          "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_exact"))
    )
    return (
        exact.join(est, ["win_start", "event_type"])
        .select(
            "win_start",
            "event_type",
            "n_exact",
            (
                F.abs(
                    F.col("approx_users").cast("double")
                    - F.col("n_exact").cast("double")
                )
                <= F.greatest(
                    F.lit(3 * rsd) * F.col("n_exact").cast("double"),
                    F.lit(1.0),
                )
            ).alias("approx_ok"),
        )
        .orderBy("win_start", "event_type")
    )


@df_query(
    "st_anomaly",
    oracle="""
    WITH scored AS (
      SELECT user_id, event_id, value,
             COUNT(value) OVER w AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id,
           CAST(n AS BIGINT) AS n_hist,
           CASE WHEN n >= 5 AND ((s2 - s1 * s1 / n) / (n - 1)) > 0
                THEN (value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1))
           END AS z,
           COALESCE(
             CASE WHEN n >= 5 AND ((s2 - s1 * s1 / n) / (n - 1)) > 0
                  THEN abs((value - s1 / n)
                           / sqrt((s2 - s1 * s1 / n) / (n - 1))) > 3.0
             END, FALSE) AS is_anomaly
    FROM scored
    ORDER BY event_id
    """,
    doc="Streaming cross-batch anomaly flags: each event z-scored "
    "against its user's EXPANDING prior history held as exact integer "
    "state in applyInPandasWithState (streaming/anomaly.py), drained "
    "with AvailableNow. The stream result equals the batch expanding "
    "window (ROWS UNBOUNDED PRECEDING .. 1 PRECEDING) bit-for-bit — "
    "exact state plus correctly-rounded scoring makes the output "
    "independent of micro-batch boundaries; the oracle is that batch "
    "twin in DuckDB.",
    tags=("streaming", "stateful", "anomaly"),
)
def st_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.streaming import run_available_now
    from keenwa_spark.streaming.anomaly import stream_zscore_anomaly

    out = run_available_now(
        stream_zscore_anomaly(_stream_source(spark, sf_dir)),
        output_mode="update",
    )
    return out.orderBy("event_id")


@df_query(
    "st_ohlc",
    oracle="""
    WITH base AS (
      SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
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
    SELECT win_start, event_type,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS volume
    FROM base GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="STREAMING OHLC bars: hourly candlesticks maintained under a "
    "watermark with min_by/max_by state inside the windowed aggregate "
    "(streaming/events.py ohlc_stream), drained with AvailableNow — "
    "the stream's finalized bars equal the batch operator's "
    "(op_ohlc_bars) and the oracle's ranked-window recompute exactly.",
    tags=("streaming", "window", "downsample"),
)
def st_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.streaming import run_available_now
    from keenwa_spark.streaming.events import ohlc_stream

    out = run_available_now(ohlc_stream(_stream_source(spark, sf_dir)))
    return out.select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type", "open", "high", "low", "close", "n", "volume",
    ).orderBy("win_start", "event_type")


@df_query(
    "st_upsert_state",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           strftime(MAX(CAST(ts AS DATE)), '%Y-%m-%d') AS last_day
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Streaming keyed-state MAINTENANCE (CDC apply): each "
    "micro-batch's per-user partials merge-upsert into a persisted "
    "state table via foreachBatch (streaming/upsert.py — additive "
    "decimal combine, greatest last_day, idempotent under batch "
    "replay) — O(batch + touched keys) per trigger. The oracle is a "
    "full recompute over ALL events: the incrementally-maintained "
    "state must equal it exactly through the streaming boundary.",
    tags=("streaming", "cdc", "incremental"),
)
def st_upsert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.session import session_scratch_dir
    from keenwa_spark.streaming.upsert import upsert_state_stream

    # session-owned store dir: the upsert state table is keyed by
    # user_id and GROWS WITH THE DATA — it must never be collected to
    # the driver. Returning the lazy parquet read keeps this wrapper
    # O(1) driver state (VERDICT r07 wrong-item 1).
    work = session_scratch_dir("st_upsert_")
    store, ckpt = f"{work}/store", f"{work}/ckpt"
    query = upsert_state_stream(
        _stream_source(spark, sf_dir), store_path=store,
        checkpoint_path=ckpt,
    )
    if not query.awaitTermination(300):
        query.stop()
        raise TimeoutError("st_upsert_state stream did not drain in 300s")
    return (
        spark.read.parquet(store)
        .select(
            "user_id", "n_events",
            F.col("total_value").cast("double").alias("total_value"),
            "last_day",
        )
        .orderBy("user_id")
    )


@df_query(
    "st_asof",
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
    doc="STREAMING as-of join: last-touch attribution maintained "
    "across micro-batches with two longs of exact per-user state "
    "(streaming/asof.py — views before purchases at equal ts for the "
    "inclusive match, greatest-view-id tie-break), drained with "
    "AvailableNow. The oracle is DuckDB's native ASOF LEFT JOIN — the "
    "same oracle as the batch operator (op_asof_attribution), so "
    "stream and batch provably implement one semantics.",
    tags=("streaming", "asof", "stateful"),
)
def st_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.streaming import run_available_now
    from keenwa_spark.streaming.asof import asof_stream

    out = run_available_now(
        asof_stream(_stream_source(spark, sf_dir)), output_mode="update"
    )
    return out.orderBy("purchase_id")


def _duck_st_cms_sql(d: int = 4, w: int = 256) -> str:
    from keenwa_spark.pipeline.sketches import _cms_pos

    arms = "\n      UNION ALL ".join(
        f"SELECT {j} AS j, {_cms_pos('h', j, w)} AS pos FROM h"
        for j in range(d)
    )
    return f"""
    WITH h AS (
      SELECT ('0x' || substr(md5(event_type), 1, 8))::BIGINT AS h
      FROM events WHERE event_type IS NOT NULL
    ),
    arms AS (
      {arms}
    )
    SELECT j, pos, COUNT(*) AS cnt FROM arms GROUP BY 1, 2
    """


@df_query(
    "st_cms_counts",
    oracle=_duck_st_cms_sql(),
    doc="STREAMING count-min sketch: the batch cms_build plan "
    "(pipeline/sketches.py) runs UNCHANGED on the event stream — "
    "counters are sums, so the d x w table is mergeable fixed-size "
    "streaming state (complete mode, <= 1024 rows at any stream "
    "length), the heavy-hitter state story HLL tells for distincts. "
    "Unlike the HLL twin (bound-checked only), CMS counters are the "
    "frozen portable arithmetic, so the drained state is compared "
    "EXACTLY against the DuckDB replay — a full-value oracle on a "
    "streaming aggregate.",
    tags=("streaming", "sketch"),
)
def st_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.pipeline.hashing import spark_hash64
    from keenwa_spark.pipeline.sketches import cms_build
    from keenwa_spark.streaming import run_available_now

    hashed = (
        _stream_source(spark, sf_dir)
        .where(F.col("event_type").isNotNull())
        .select(F.expr(spark_hash64("event_type")).alias("h"))
    )
    return run_available_now(
        cms_build(hashed, "h", d=4, w=256), output_mode="complete"
    ).orderBy("j", "pos")


def _duck_st_bloom_sql(m_bits: int = 4096, k: int = 4) -> str:
    from keenwa_spark.pipeline.bloom import WORD_BITS, _position_exprs

    pos = ", ".join(_position_exprs("h", m_bits, k))
    return f"""
    WITH h AS (
      SELECT DISTINCT ('0x' || substr(md5(event_type || '|' ||
                       CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    ),
    bpos AS (SELECT DISTINCT unnest([{pos}]) AS pos FROM h)
    SELECT CAST(pos // {WORD_BITS} AS INT) AS word_idx,
           bit_or(1::BIGINT << (pos % {WORD_BITS})::INT) AS word_val
    FROM bpos GROUP BY 1
    """


@df_query(
    "st_bloom_filter",
    oracle=_duck_st_bloom_sql(),
    doc="STREAMING Bloom-filter maintenance: the batch bloom_build plan "
    "(pipeline/bloom.py) runs UNCHANGED on the event stream over "
    "(event_type, user_id) membership keys — bit_or words are "
    "mergeable fixed-size streaming state (complete mode, <= m/32 "
    "rows at any stream length), the live-updated blocklist/seen-set "
    "shape. The drained word rows are the frozen portable arithmetic, "
    "compared EXACTLY against the DuckDB replay; a probe against "
    "yesterday's persisted filter is the same codegen projection as "
    "batch (pl_bloom_decontaminate).",
    tags=("streaming", "sketch"),
)
def st_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.pipeline.bloom import bloom_build
    from keenwa_spark.pipeline.hashing import spark_hash64

    from keenwa_spark.streaming import run_available_now

    key = "concat(event_type, '|', CAST(user_id AS STRING))"
    hashed = (
        _stream_source(spark, sf_dir)
        .where(F.col("event_type").isNotNull() & F.col("user_id").isNotNull())
        .select(F.expr(spark_hash64(key)).alias("h"))
    )
    return run_available_now(
        bloom_build(hashed, m_bits=4096, k=4), output_mode="complete"
    ).orderBy("word_idx")
