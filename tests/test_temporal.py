"""Temporal operators: as-of join, range join, hypertable rollup.

Semantics are pinned against tiny hand-computable frames; plan shape
is pinned against the sf0.001 event data (no nested-loop join in the
range join, carry-forward window in the as-of join).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from keenwa_spark.operators.asof import asof_join
from keenwa_spark.operators.range_join import range_join
from keenwa_spark.operators.rollup import time_rollup


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:05:00"), 101.0),
            ("A", _ts("2024-01-01 10:30:00"), 105.0),
            ("B", _ts("2024-01-01 10:02:00"), 50.0),
        ],
        "sym string, ts timestamp, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:04:59"), 10),   # -> 10:00 quote
            ("A", _ts("2024-01-01 10:05:00"), 20),   # -> 10:05 (inclusive)
            ("A", _ts("2024-01-01 11:00:00"), 30),   # -> 10:30
            ("B", _ts("2024-01-01 10:01:00"), 40),   # no quote yet -> NULL
            ("C", _ts("2024-01-01 10:00:00"), 50),   # key absent -> NULL
        ],
        "sym string, ts timestamp, qty int",
    )


class TestAsofJoin:
    def test_backward_inclusive_match(self, quotes, trades):
        out = {
            (r.sym, r.qty): r.px_right
            for r in asof_join(trades, quotes, on="sym").collect()
        }
        assert out[("A", 10)] == 100.0
        assert out[("A", 20)] == 101.0  # equal ts matches (inclusive)
        assert out[("A", 30)] == 105.0
        assert out[("B", 40)] is None  # quote after trade: no match
        assert out[("C", 50)] is None  # unseen key keeps left row (left join)

    def test_row_count_preserved(self, quotes, trades):
        assert asof_join(trades, quotes, on="sym").count() == trades.count()

    def test_tolerance_nulls_stale_matches(self, quotes, trades):
        out = {
            (r.sym, r.qty): r.px_right
            for r in asof_join(
                trades, quotes, on="sym", tolerance_seconds=600
            ).collect()
        }
        assert out[("A", 10)] == 100.0  # 299s old: fresh
        assert out[("A", 30)] is None   # 1800s old: stale -> NULL
        assert out[("B", 40)] is None

    def test_single_shuffle_no_join_in_plan(self, quotes, trades):
        plan = asof_join(trades, quotes, on="sym")._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan  # union+window, not a join operator
        assert plan.count("Exchange") <= 2  # one per input branch of the union

    def test_duplicate_right_ts_deterministic_greatest_payload(self, spark):
        """Several right rows at the same (key, ts): the documented rule
        is greatest-payload-wins, a total order stable across runs and
        partitionings."""
        right = spark.createDataFrame(
            [
                ("A", _ts("2024-01-01 10:00:00"), 100.0),
                ("A", _ts("2024-01-01 10:00:00"), 103.0),
                ("A", _ts("2024-01-01 10:00:00"), 101.0),
            ],
            "sym string, ts timestamp, px double",
        )
        left = spark.createDataFrame(
            [("A", _ts("2024-01-01 10:00:01"), 1)],
            "sym string, ts timestamp, qty int",
        )
        for n_part in (1, 3, 7):
            out = asof_join(left, right.repartition(n_part), on="sym").collect()
            assert [r.px_right for r in out] == [103.0]


class TestRangeJoin:
    def test_half_open_membership(self, spark):
        points = spark.createDataFrame(
            [("u", _ts("2024-01-01 10:00:00")),   # == lo: in
             ("u", _ts("2024-01-01 10:09:59")),   # in
             ("u", _ts("2024-01-01 10:10:00")),   # == hi: out (half-open)
             ("u", _ts("2024-01-01 09:59:59")),   # before: out
             ("v", _ts("2024-01-01 10:05:00"))],  # wrong key: out
            "k string, ts timestamp",
        )
        intervals = spark.createDataFrame(
            [("u", "w1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:10:00"))],
            "k string, wid string, lo timestamp, hi timestamp",
        )
        got = range_join(
            points, intervals, point_ts="ts", lo="lo", hi="hi",
            on=["k"], bin_width_seconds=60,
        )
        assert sorted(r.ts.isoformat() for r in got.collect()) == [
            "2024-01-01T10:00:00", "2024-01-01T10:09:59",
        ]

    def test_no_duplicate_pairs_across_bins(self, spark):
        # interval spans many bins; each matching point must appear once
        points = spark.createDataFrame(
            [("u", i, _ts("2024-01-01 10:00:00") + dt.timedelta(minutes=i))
             for i in range(30)],
            "k string, pid int, ts timestamp",
        )
        intervals = spark.createDataFrame(
            [("u", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:30:00"))],
            "k string, lo timestamp, hi timestamp",
        )
        got = range_join(
            points, intervals, point_ts="ts", lo="lo", hi="hi",
            on=["k"], bin_width_seconds=120,  # 15 bins
        )
        assert got.count() == 30
        assert got.select("pid").distinct().count() == 30

    def test_empty_interval_matches_nothing(self, spark):
        points = spark.createDataFrame(
            [("u", _ts("2024-01-01 10:00:00"))], "k string, ts timestamp"
        )
        intervals = spark.createDataFrame(
            [("u", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:00:00"))],
            "k string, lo timestamp, hi timestamp",
        )
        got = range_join(points, intervals, point_ts="ts", lo="lo", hi="hi", on=["k"])
        assert got.count() == 0

    def test_plan_is_equi_join_not_nested_loop(self, views):
        events = views.table("events")
        windows = events.where("event_type = 'error'").select(
            "user_id", F.col("ts").alias("lo"),
            (F.col("ts") + F.expr("INTERVAL 4 HOUR")).alias("hi"),
        )
        clicks = events.where("event_type = 'click'").select("user_id", "ts")
        plan = range_join(
            clicks, windows, point_ts="ts", lo="lo", hi="hi",
            on=["user_id"], bin_width_seconds=3600,
        )._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan

    def test_invalid_bin_width(self, spark):
        df = spark.range(1)
        with pytest.raises(ValueError, match="positive"):
            range_join(df, df, point_ts="id", lo="id", hi="id", bin_width_seconds=0)


class TestTimeRollup:
    @pytest.fixture(scope="class")
    def rolled(self, views):
        return time_rollup(
            views.table("events"), ts_col="ts", key_cols=["event_type"],
            value_col="value", grains=["hour", "day"],
        ).cache()

    def test_day_equals_direct_aggregation(self, views, rolled):
        """Cascaded day partials == day aggregated directly from raw."""
        direct = {
            (r.event_type, r.b.isoformat()): (r.n, round(r.total, 4))
            for r in views.table("events")
            .groupBy("event_type", F.date_trunc("day", "ts").alias("b"))
            .agg(
                F.count("value").alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
            )
            .collect()
        }
        cascaded = {
            (r.event_type, r.bucket_ts.isoformat()): (r.n, round(r.total, 4))
            for r in rolled.where("grain = 'day'").collect()
        }
        assert cascaded == direct

    def test_grain_counts_are_consistent(self, rolled):
        tot = {
            r.grain: r.s for r in
            rolled.groupBy("grain").agg(F.sum("n").alias("s")).collect()
        }
        assert tot["hour"] == tot["day"]

    def test_avg_finalized_per_grain(self, rolled):
        row = rolled.where("grain = 'day'").first()
        assert row.vavg == pytest.approx(row.total / row.n)

    def test_incremental_merge_equals_recompute(self, views):
        """rollup_merge(history partials, delta partials) must be
        bit-equal to partials over the union — including buckets only
        in history, only in the delta, and touched by both."""
        from keenwa_spark.operators.rollup import (
            finalize_rollup,
            rollup_merge,
            rollup_partials,
        )

        events = views.table("events")
        cutoff = "2024-01-15"
        part = lambda d: rollup_partials(  # noqa: E731
            d, ts_col="ts", key_cols=["event_type"], value_col="value",
            grain="day",
        )
        merged = finalize_rollup(
            rollup_merge(
                part(events.where(F.col("ts") < cutoff)),
                part(events.where(F.col("ts") >= cutoff)),
            ),
            grain="day",
        )
        full = finalize_rollup(part(events), grain="day")
        key = lambda r: (r.event_type, r.bucket_ts)  # noqa: E731
        m = {key(r): (r.n, r.total, r.vmin, r.vmax) for r in merged.collect()}
        f = {key(r): (r.n, r.total, r.vmin, r.vmax) for r in full.collect()}
        assert m == f

    def test_merge_with_empty_delta_is_identity(self, views):
        from keenwa_spark.operators.rollup import rollup_merge, rollup_partials

        events = views.table("events")
        stored = rollup_partials(
            events, ts_col="ts", key_cols=["event_type"], value_col="value",
            grain="day",
        )
        empty = rollup_partials(
            events.where("1 = 0"), ts_col="ts", key_cols=["event_type"],
            value_col="value", grain="day",
        )
        merged = {
            (r.event_type, r.bucket_ts): (r["__n"], r["__sum"])
            for r in rollup_merge(stored, empty).collect()
        }
        base = {
            (r.event_type, r.bucket_ts): (r["__n"], r["__sum"])
            for r in stored.collect()
        }
        assert merged == base

    def test_week_cannot_be_cascade_base(self, views):
        with pytest.raises(ValueError, match="week"):
            time_rollup(
                views.table("events"), ts_col="ts", key_cols=[],
                value_col="value", grains=["week", "month"],
            )

    def test_bad_grain_order_rejected(self, views):
        with pytest.raises(ValueError, match="fine-to-coarse"):
            time_rollup(
                views.table("events"), ts_col="ts", key_cols=[],
                value_col="value", grains=["day", "hour"],
            )

    def test_single_raw_scan(self, views):
        """The cascade reads the fact table once: every grain branch
        consumes the materialized fine partial (InMemoryTableScan),
        never the raw parquet directly — raw is scanned only when the
        cache populates, i.e. exactly once."""
        df = time_rollup(
            views.table("events"), ts_col="ts", key_cols=["event_type"],
            value_col="value", grains=["hour", "day", "month"],
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") == 3


class TestIntervalOverlapJoin:
    def _mk(self, spark, rows, idc):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(rows, f"{idc} BIGINT, lo_s BIGINT, hi_s BIGINT")
        return df.select(
            idc,
            F.timestamp_seconds(F.col("lo_s")).alias(f"{idc}_lo"),
            F.timestamp_seconds(F.col("hi_s")).alias(f"{idc}_hi"),
        )

    def test_overlap_semantics_and_meet_once(self, spark):
        from keenwa_spark.operators.range_join import interval_overlap_join

        # left interval spans MANY bins; right overlaps it twice -> each
        # qualifying pair must appear exactly once
        left = self._mk(spark, [(1, 0, 10_000)], "l")      # ~3 bins at w=3600
        right = self._mk(
            spark,
            [
                (10, 500, 600),       # inside
                (11, 9_999, 20_000),  # touches the tail
                (12, 10_000, 11_000), # starts AT l_hi (half-open: no match)
                (13, 20_000, 21_000), # disjoint
            ],
            "r",
        )
        out = interval_overlap_join(
            left, right, "l_lo", "l_hi", "r_lo", "r_hi", bin_width_seconds=3600
        )
        got = sorted((r.l, r.r) for r in out.collect())
        assert got == [(1, 10), (1, 11)]

    def test_empty_window_and_keying(self, spark):
        from keenwa_spark.operators.range_join import interval_overlap_join
        from pyspark.sql import functions as F

        left = self._mk(spark, [(1, 0, 0), (2, 0, 100)], "l").withColumn(
            "k", F.col("l") % 2
        )
        right = self._mk(spark, [(7, 50, 60), (8, 50, 60)], "r").withColumn(
            "k", F.col("r") % 2
        )
        out = interval_overlap_join(
            left, right, "l_lo", "l_hi", "r_lo", "r_hi",
            on=["k"], bin_width_seconds=60,
        )
        got = sorted((r.l, r.r) for r in out.collect())
        # l=1 is empty (hi==lo) -> nothing; l=2 (k=0) only matches r=8 (k=0)
        assert got == [(2, 8)]


class TestIntervalOverlapRandomized:
    def test_matches_bruteforce_on_seeded_random_intervals(self, spark):
        """Randomized cross-check: bin-bucketed overlap join == O(n*m)
        brute force, on intervals engineered to hit the nasty spots —
        zero-width, bin-edge-aligned, many-bin spans, key mismatches."""
        import random

        from keenwa_spark.operators.range_join import interval_overlap_join
        from pyspark.sql import functions as F

        rng = random.Random(20260813)
        W = 60  # bin width (seconds)

        def mk(n, idbase):
            rows = []
            for i in range(n):
                lo = rng.randrange(0, 3000)
                style = rng.random()
                if style < 0.15:
                    hi = lo                      # empty
                elif style < 0.3:
                    lo = (lo // W) * W           # bin-aligned start
                    hi = lo + W * rng.randrange(0, 4)  # bin-aligned end
                elif style < 0.5:
                    hi = lo + rng.randrange(1, 10)     # tiny
                else:
                    hi = lo + rng.randrange(1, 600)    # spans many bins
                rows.append((idbase + i, rng.randrange(0, 3), lo, hi))
            return rows

        lrows, rrows = mk(60, 1000), mk(60, 2000)
        expected = sorted(
            (l[0], r[0])
            for l in lrows
            for r in rrows
            if l[1] == r[1] and l[2] < r[3] and r[2] < l[3]
            and l[3] > l[2] and r[3] > r[2]
        )

        def to_df(rows, idc, lo, hi):
            df = spark.createDataFrame(
                rows, f"{idc} BIGINT, k BIGINT, lo_s BIGINT, hi_s BIGINT"
            )
            return df.select(
                idc, "k",
                F.timestamp_seconds(F.col("lo_s")).alias(lo),
                F.timestamp_seconds(F.col("hi_s")).alias(hi),
            )

        out = interval_overlap_join(
            to_df(lrows, "lid", "l_lo", "l_hi"),
            to_df(rrows, "rid", "r_lo", "r_hi"),
            "l_lo", "l_hi", "r_lo", "r_hi",
            on=["k"], bin_width_seconds=W,
        )
        got = sorted((r.lid, r.rid) for r in out.collect())
        assert got == expected


class TestTimeResample:
    def test_grid_fill_and_last_in_bucket(self, spark):
        from pyspark.sql import functions as F

        from keenwa_spark.operators.resample import time_resample

        rows = [
            # key 1: two obs in bucket 0 (last wins), gap at bucket 60,
            # one obs at bucket 120
            (1, 1, 5, 10.0),
            (2, 1, 50, 20.0),   # same bucket, later ts -> bucket value
            (3, 1, 125, 30.0),
            # key 2: single observation -> single-bucket grid
            (4, 2, 70, 7.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id BIGINT, user_id BIGINT, ts_s BIGINT, value DOUBLE"
        ).select(
            "event_id", "user_id",
            F.timestamp_seconds(F.col("ts_s")).alias("ts"), "value",
        )
        out = time_resample(
            df, key_col="user_id", ts_col="ts", value_col="value",
            step_seconds=60, id_col="event_id",
        ).collect()
        got = {
            (r.user_id, r.bucket_ts.strftime("%M")): (r.value, r.n_obs)
            for r in out
        }
        assert got[(1, "00")] == (20.0, 2)   # last of 2 obs in bucket
        assert got[(1, "01")] == (20.0, 0)   # gap forward-filled
        assert got[(1, "02")] == (30.0, 1)
        assert got[(2, "01")] == (7.0, 1)
        assert len([k for k in got if k[0] == 2]) == 1  # no spurious grid

    def test_null_valued_observations_ignored(self, spark):
        from pyspark.sql import functions as F

        from keenwa_spark.operators.resample import time_resample

        rows = [
            # key 1: bucket 0 has a real obs then a NULL-valued one at
            # a later ts — the NULL must neither become the bucket
            # value nor count toward n_obs
            (1, 1, 5, 10.0),
            (2, 1, 50, None),
            # bucket 60 holds ONLY a NULL-valued obs -> treated as a
            # gap (n_obs 0, forward-filled)
            (3, 1, 70, None),
            (4, 1, 125, 30.0),
            # TRAILING NULL-only bucket: extends the grid (pandas
            # keeps the index span through NaN rows), filled from 30.0
            (5, 1, 185, None),
            # key 2: ALL observations NULL-valued -> full grid of
            # n_obs=0 rows with NULL value (never silently absent)
            (6, 2, 10, None),
        ]
        df = spark.createDataFrame(
            rows, "event_id BIGINT, user_id BIGINT, ts_s BIGINT, value DOUBLE"
        ).select(
            "event_id", "user_id",
            F.timestamp_seconds(F.col("ts_s")).alias("ts"), "value",
        )
        out = time_resample(
            df, key_col="user_id", ts_col="ts", value_col="value",
            step_seconds=60, id_col="event_id",
        ).collect()
        got = {
            (r.user_id, r.bucket_ts.strftime("%M")): (r.value, r.n_obs)
            for r in out
        }
        assert got[(1, "00")] == (10.0, 1)   # NULL obs not counted
        assert got[(1, "01")] == (10.0, 0)   # NULL-only bucket is a gap
        assert got[(1, "02")] == (30.0, 1)
        assert got[(1, "03")] == (30.0, 0)   # trailing NULL keeps extent
        assert got[(2, "00")] == (None, 0)   # all-NULL key still emitted

    def test_bad_step_raises(self, spark):
        from keenwa_spark.operators.resample import time_resample

        df = spark.createDataFrame([(1, 1, 1.0)], "a BIGINT, b BIGINT, v DOUBLE")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            time_resample(df, "a", "b", "v", 0, "a")


class TestAsofForward:
    def test_forward_matches_next_and_tolerance(self, spark):
        from datetime import datetime, timedelta

        from keenwa_spark.operators.asof import asof_join

        base = datetime(2024, 1, 1)
        left = spark.createDataFrame(
            [("u", base + timedelta(seconds=10), 1),
             ("u", base + timedelta(seconds=50), 2)],
            "k string, ts timestamp, lid int",
        )
        right = spark.createDataFrame(
            [("u", base + timedelta(seconds=10), "at"),     # equal ts: inclusive
             ("u", base + timedelta(seconds=300), "late")],
            "k string, ts timestamp, tag string",
        )
        got = {r["lid"]: r["tag_right"] for r in asof_join(
            left, right, on="k", direction="forward"
        ).collect()}
        assert got == {1: "at", 2: "late"}
        # tolerance: row 2's next match is 250s away -> dropped
        tol = {r["lid"]: r["tag_right"] for r in asof_join(
            left, right, on="k", direction="forward", tolerance_seconds=60
        ).collect()}
        assert tol == {1: "at", 2: None}

    def test_invalid_direction_rejected(self, spark):
        from keenwa_spark.operators.asof import asof_join

        df = spark.createDataFrame([("u", 1)], "k string, ts int")
        import pytest as _pytest
        with _pytest.raises(ValueError):
            asof_join(df, df, on="k", direction="nearest")
