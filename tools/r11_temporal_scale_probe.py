"""Round-11 100x scale probes for the temporal/CDC family (VERDICT r10
item 4): asof_join, interval_overlap_join and snapshot_diff carried
only 10x evidence; this stages the same REAL 100x events corpus as
tools/r10_scale100_probe.py (id-shifted unions written to /tmp parquet
and read back fresh) and probes each at 1x / 10x / 100x
(100k / 1M / 10M events).

Claims under test:

1. **asof_join** (operators/asof.py — purchases as-of their user's
   most recent prior view): the union-sort-carry plan costs ONE
   shuffle on the key + one in-partition sort, independent of match
   fan-out — never an inequality join's pair blow-up, never a nested
   loop. Expect ~linear wall, constant plan shape, zero driver state.

2. **interval_overlap_join** (operators/range_join.py — 10-minute
   error windows x 15-minute purchase windows per user): both sides
   explode into 5-minute bins and meet in an EQUI-join on
   (user, bin); each qualifying pair meets exactly once. Expect the
   equi-join plan at every scale (no BNLJ/cartesian) and output-bound
   growth (the 100x corpus multiplies BOTH sides per user, so true
   pair count grows ~quadratically in the per-user copy count — the
   probe separates operator cost from output size by also running a
   bin-only count).

3. **snapshot_diff** (operators/cdc.py — trailing-10-day per-user
   state at two anchors, classified insert/delete/update): two
   aggregate shuffles + one keyed full-outer join, null-safe compare
   in codegen. The 100x corpus multiplies events per user (user
   cardinality is fixed), so state rows stay ~constant and the join
   stays small — the aggregation absorbs the scale. Expect plan
   constancy and near-flat join cost.

Prints SCALE.md-ready rows. Run:
    python tools/r11_temporal_scale_probe.py [asof|overlap|diff ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from r10_scale100_probe import _plan_counts, _time, stage_events  # noqa: E402


def probe_asof(spark) -> None:
    from keenwa_spark.operators.asof import asof_join

    print("## asof_join purchases->views on user_id (1x/10x/100x = 100k/1M/10M events)")
    for factor in (1, 10, 100):
        path = stage_events(spark, factor)
        runs = 3 if factor < 100 else 2

        def build(path=path):
            ev = spark.read.parquet(path)
            purchases = ev.where(F.col("event_type") == "purchase")
            views = ev.where(F.col("event_type") == "view").select(
                "user_id", "ts", F.col("event_id").alias("view_id")
            )
            return asof_join(purchases, views, on="user_id",
                             left_ts="ts", right_ts="ts")

        out = build()
        wall, n = _time(build, runs)
        print(f"{factor}x: wall {wall:.2f}s rows {n} [{_plan_counts(out)}]")


def probe_overlap(spark) -> None:
    from keenwa_spark.operators.range_join import interval_overlap_join

    print("## interval_overlap_join errors x purchases, 5-min bins (1x/10x/100x)")
    for factor in (1, 10, 100):
        path = stage_events(spark, factor)
        runs = 3 if factor < 100 else 2

        def build(path=path, full=True):
            ev = spark.read.parquet(path)
            errors = ev.where(F.col("event_type") == "error").select(
                "user_id", F.col("event_id").alias("error_id"),
                F.col("ts").alias("err_lo"),
                F.expr("ts + INTERVAL 10 MINUTES").alias("err_hi"),
            )
            purchases = ev.where(F.col("event_type") == "purchase").select(
                "user_id", F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("pur_lo"),
                F.expr("ts + INTERVAL 15 MINUTES").alias("pur_hi"),
            )
            return interval_overlap_join(
                errors, purchases, "err_lo", "err_hi", "pur_lo", "pur_hi",
                on=["user_id"], bin_width_seconds=300,
            )

        out = build()
        wall, n = _time(build, runs)
        print(f"{factor}x: wall {wall:.2f}s pairs {n} [{_plan_counts(out)}]")


def probe_diff(spark) -> None:
    from keenwa_spark.operators.cdc import snapshot_diff

    print("## snapshot_diff trailing-10-day user state, Jan16 vs Jan31 (1x/10x/100x)")
    for factor in (1, 10, 100):
        path = stage_events(spark, factor)
        runs = 3 if factor < 100 else 2

        def build(path=path):
            ev = spark.read.parquet(path)

            def state(lo: str, hi: str):
                return (
                    ev.where((F.col("ts") >= F.lit(lo).cast("timestamp"))
                             & (F.col("ts") < F.lit(hi).cast("timestamp")))
                    .groupBy("user_id")
                    .agg(
                        F.count("*").alias("n_events"),
                        F.sum(F.col("value").cast("decimal(18,6)"))
                        .cast("double").alias("total_value"),
                        F.max(F.to_date("ts")).alias("last_day"),
                    )
                )

            old = state("2024-01-06 00:00:00", "2024-01-16 00:00:00")
            new = state("2024-01-21 00:00:00", "2024-01-31 00:00:00")
            return snapshot_diff(old, new, keys=["user_id"])

        out = build()
        wall, n = _time(build, runs)
        print(f"{factor}x: wall {wall:.2f}s rows {n} [{_plan_counts(out)}]")


PROBES = {"asof": probe_asof, "overlap": probe_overlap, "diff": probe_diff}


def main() -> None:
    from keenwa_spark.session import get_spark

    spark = get_spark("r11_temporal_scale_probe")
    which = sys.argv[1:] or list(PROBES)
    t0 = time.time()
    for name in which:
        PROBES[name](spark)
    print(f"total {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
