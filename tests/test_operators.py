"""Skew salting, incremental dedup, function registry, CBO stats."""

from __future__ import annotations

import pytest


def test_salted_join_matches_plain_join(views):
    from keenwa_spark.operators import salted_join

    big = views.table("orders")
    small = views.table("customer").select("c_custkey", "c_name").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = big.join(small, "o_custkey").count()
    salted = salted_join(big, small, on="o_custkey", salts=8)
    assert salted.count() == plain
    # salt scatters a hot key across partitions: distinct salts > 1
    # for the most frequent custkey
    assert "__salt" not in salted.columns


def test_salted_join_validates_salts(views):
    from keenwa_spark.operators import salted_join

    with pytest.raises(ValueError):
        salted_join(views.table("orders"), views.table("customer"), on="x", salts=1)


def test_salted_join_left_matches_plain_and_rejects_outer(views):
    """ADVICE r02: the small side is replicated once per salt, so
    right/full outer would null-extend unmatched small-side rows once
    PER SALT — those variants must be rejected, and the supported
    'left' variant must match a plain left join exactly."""
    from keenwa_spark.operators import salted_join

    big = views.table("orders")
    # restrict the small side so some big-side rows have NO match —
    # the left-join null-extension path is load-bearing
    small = (
        views.table("customer")
        .filter("c_custkey % 3 = 0")
        .select("c_custkey", "c_name")
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    plain = big.join(small, "o_custkey", "left")
    salted = salted_join(big, small, on="o_custkey", how="left", salts=8)
    assert salted.count() == plain.count()
    assert (
        salted.filter("c_name IS NULL").count()
        == plain.filter("c_name IS NULL").count()
        > 0
    )
    for bad in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(big, small, on="o_custkey", how=bad)


def test_incremental_exact_dedup(spark):
    from keenwa_spark.operators import incremental_exact_dedup
    from keenwa_spark.pipeline.dedup import exact_dedup

    corpus = spark.createDataFrame(
        [(1, "known document one"), (2, "known document two")],
        "doc_id LONG, text STRING",
    )
    state = exact_dedup(corpus).select("content_hash")
    batch = spark.createDataFrame(
        [
            (10, "KNOWN   document one"),   # dup of 1 after normalization
            (11, "a brand new document"),
        ],
        "doc_id LONG, text STRING",
    )
    fresh = incremental_exact_dedup(batch, state)
    assert [r.doc_id for r in fresh.collect()] == [11]


def test_incremental_minhash_dedup(spark):
    from keenwa_spark.operators import incremental_minhash_dedup
    from keenwa_spark.pipeline.dedup import minhash_signatures

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame([(1, base)], "doc_id LONG, text STRING")
    state = minhash_signatures(corpus)
    batch = spark.createDataFrame(
        [
            (10, base.replace("today", "tomorrow")),  # near-dup of corpus
            (11, "completely unrelated content about query optimizers and shuffles"),
        ],
        "doc_id LONG, text STRING",
    )
    fresh = incremental_minhash_dedup(batch, state)
    assert [r.doc_id for r in fresh.collect()] == [11]


def test_function_registry_inventory_complete():
    from keenwa_spark.functions import (
        AGGREGATE_FUNCTIONS,
        SCALAR_FUNCTIONS,
        WINDOW_FUNCTIONS,
    )

    # the complete reference inventories (SURVEY §2c)
    assert set(AGGREGATE_FUNCTIONS) == {"avg", "count", "max", "min", "sum"}
    assert set(WINDOW_FUNCTIONS) == {"row_number", "rank", "first_value", "last_value"}
    assert set(SCALAR_FUNCTIONS) == {
        "bit_length", "character_length", "concat", "lower",
        "position", "to_hex", "replace", "upper",
    }


def test_function_templates_execute(views):
    from keenwa_spark.functions import spark_expr_for

    exprs = [
        spark_expr_for("lower", "c_name"),
        spark_expr_for("position", "'#'", "c_name"),
        spark_expr_for("to_hex", "c_custkey"),
        spark_expr_for("replace", "c_name", "'Customer'", "'C'"),
        spark_expr_for("concat", "c_name", "'!'"),
    ]
    row = views.table("customer").selectExpr(*exprs).limit(1).collect()[0]
    assert len(row) == 5
    with pytest.raises(KeyError):
        spark_expr_for("no_such_fn", "x")


def test_udf_registration(spark):
    from keenwa_spark.functions import register_udf

    register_udf(spark, "kw_shout", lambda s: s.upper() + "!", "string")
    assert spark.sql("SELECT kw_shout('hi') AS s").collect()[0].s == "HI!"


def test_persist_and_analyze_feeds_cbo(spark):
    # writes to the session's default warehouse dir (spark-warehouse/,
    # gitignored) — warehouse.dir is a static conf, unchangeable here
    from keenwa_spark.catalog import Catalog

    cat = Catalog(spark)
    import os

    cat.register_dir(os.environ.get("SF_DIR", "/root/testdata/sf0.001"))
    cat.persist_and_analyze("nation", columns=["n_nationkey", "n_regionkey"])
    stats = cat.table_stats("nation_stats")
    assert "bytes" in stats.get("statistics", "")
    assert "rows" in stats.get("statistics", "")


def test_approx_aggregates_within_tolerance(views):
    """The at-scale twins of exact aggregates: approx_count_distinct
    (HLL) and approx_percentile must land within documented error of
    the exact values. Sketches are engine-specific so these are
    test-verified rather than oracle-hashed."""
    row = views.sql(
        """
        SELECT
          approx_count_distinct(o_custkey) AS acd,
          count(DISTINCT o_custkey) AS cd,
          approx_percentile(o_totalprice, 0.5, 1000) AS ap50,
          percentile(o_totalprice, 0.5) AS p50
        FROM orders
        """
    ).collect()[0]
    assert abs(row.acd - row.cd) / row.cd < 0.05          # HLL ~2% typical
    assert abs(row.ap50 - row.p50) / row.p50 < 0.05


class TestSkewReport:
    def test_heavy_hitter_surfaces_with_stats(self, spark):
        from keenwa_spark.operators.skew import skew_report

        rows = [("hot",)] * 90 + [(f"k{i}",) for i in range(10)]
        df = spark.createDataFrame(rows, "k STRING")
        out = skew_report(df, key_col="k", top_k=3).collect()
        assert [r.rnk for r in out] == [1, 2, 3]
        top = out[0]
        assert top.key == "hot" and top.key_count == 90
        assert top.share == 0.90
        assert top.n_keys == 11 and top.max_count == 90
        assert top.p50_count == 1.0
        assert top.max_over_p50 == 90.0

    def test_no_global_window_over_all_keys(self, views):
        """The heavy-hitter selection must be a distributed top-k; the
        only window runs over the already-limited top_k rows."""
        from keenwa_spark.operators.skew import skew_report
        from keenwa_spark.plans import explain_text

        plan = explain_text(
            skew_report(views.table("orders"), key_col="o_custkey")
        )
        assert "TakeOrderedAndProject" in plan


class TestWinsorize:
    def test_values_clamped_to_group_quantiles(self, spark):
        from keenwa_spark.pipeline.quality import winsorize

        rows = [("a", float(v)) for v in range(1, 100)] + [("a", 1e9), ("b", 5.0)]
        df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
        out = winsorize(df, value_col="v", group_col="g").collect()
        a = [r for r in out if r.g == "a"]
        assert max(r.v_w for r in a) == a[0].q_hi  # outlier clamped
        assert max(r.v for r in a) == 1e9          # original intact
        assert all(r.q_lo <= r.v_w <= r.q_hi for r in out)
        b = [r for r in out if r.g == "b"][0]
        assert b.v_w == 5.0  # single-value group: quantiles collapse

    def test_global_mode_and_bad_quantiles(self, spark):
        from keenwa_spark.pipeline.quality import winsorize

        df = spark.createDataFrame([(float(v),) for v in range(10)], "v DOUBLE")
        out = winsorize(df, value_col="v").collect()
        assert all(r.q_lo <= r.v_w <= r.q_hi for r in out)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            winsorize(df, value_col="v", lower_q=0.9, upper_q=0.1)


class TestZscoreScale:
    def test_standardizes_per_group(self, spark):
        from keenwa_spark.pipeline.quality import zscore_scale

        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 10.0)]
        df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
        out = zscore_scale(df, value_col="v", group_col="g").collect()
        a = sorted((r.v, r.v_z) for r in out if r.g == "a")
        assert a[0][1] == pytest.approx(-1.0)
        assert a[1][1] == pytest.approx(0.0)
        assert a[2][1] == pytest.approx(1.0)
        # zero-variance group: NULL z, not a division error
        assert all(r.v_z is None for r in out if r.g == "b")

    def test_global_mode(self, spark):
        from keenwa_spark.pipeline.quality import zscore_scale

        df = spark.createDataFrame([(float(v),) for v in range(5)], "v DOUBLE")
        out = zscore_scale(df, value_col="v").collect()
        zs = sorted(r.v_z for r in out)
        assert zs[2] == pytest.approx(0.0)
        assert zs[0] == pytest.approx(-zs[-1])

    def test_singleton_group_yields_null_not_nan(self, spark):
        """n=1: 0/0 must be a guarded NULL (cross-engine), never NaN."""
        import math

        from keenwa_spark.pipeline.quality import zscore_scale

        df = spark.createDataFrame([("solo", 7.0)], "g STRING, v DOUBLE")
        r = zscore_scale(df, value_col="v", group_col="g").first()
        assert r.stddev is None and not (
            isinstance(r.stddev, float) and math.isnan(r.stddev)
        )
        assert r.v_z is None


class TestSnapshotDiff:
    def _mk(self, spark, rows, cols=("k", "v", "w")):
        return spark.createDataFrame(rows, list(cols))

    def test_classifies_all_change_types(self, spark):
        from keenwa_spark.operators import snapshot_diff

        old = self._mk(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)])
        new = self._mk(spark, [(2, "b", 20), (3, "X", 30), (4, "d", 40)])
        got = {
            r["k"]: r["change_type"]
            for r in snapshot_diff(old, new, keys=["k"]).collect()
        }
        assert got == {1: "delete", 3: "update", 4: "insert"}

    def test_null_to_value_is_update(self, spark):
        from keenwa_spark.operators import snapshot_diff

        old = spark.createDataFrame([(1, None, 1)], "k int, v string, w int")
        new = spark.createDataFrame([(1, "x", 1)], "k int, v string, w int")
        rows = snapshot_diff(old, new, keys=["k"]).collect()
        assert len(rows) == 1 and rows[0]["change_type"] == "update"
        assert rows[0]["old_v"] is None and rows[0]["new_v"] == "x"

    def test_include_unchanged_and_compare_subset(self, spark):
        from keenwa_spark.operators import snapshot_diff

        old = self._mk(spark, [(1, "a", 10)])
        new = self._mk(spark, [(1, "a", 99)])
        # compare only v: the w change is invisible -> unchanged
        rows = snapshot_diff(
            old, new, keys=["k"], compare_cols=["v"], include_unchanged=True
        ).collect()
        assert rows[0]["change_type"] == "unchanged"

    def test_rejects_missing_compare_col(self, spark):
        from keenwa_spark.operators import snapshot_diff

        old = self._mk(spark, [(1, "a", 1)])
        new = self._mk(spark, [(1, "a", 1)])
        with pytest.raises(ValueError):
            snapshot_diff(old, new, keys=["k"], compare_cols=["nope"])


class TestMergeUpsert:
    def test_strategies(self, spark):
        from keenwa_spark.operators import merge_upsert

        base = spark.createDataFrame(
            [(1, 10, 5, "a"), (2, 20, 6, "b")], ["k", "n", "hi", "tag"]
        )
        delta = spark.createDataFrame(
            [(2, 7, 9, "B"), (3, 1, 2, "c")], ["k", "n", "hi", "tag"]
        )
        got = {
            r["k"]: (r["n"], r["hi"], r["tag"])
            for r in merge_upsert(
                base, delta, keys=["k"],
                combine={"n": "sum", "hi": "greatest"},
            ).collect()
        }
        # 1: base kept; 2: n summed, hi greatest, tag replaced; 3: inserted
        assert got == {1: (10, 5, "a"), 2: (27, 9, "B"), 3: (1, 2, "c")}

    def test_sum_null_semantics(self, spark):
        from keenwa_spark.operators import merge_upsert

        base = spark.createDataFrame([(1, None), (2, None)], "k int, n int")
        delta = spark.createDataFrame([(1, 5)], "k int, n int")
        got = {
            r["k"]: r["n"]
            for r in merge_upsert(
                base, delta, keys=["k"], combine={"n": "sum"}
            ).collect()
        }
        # null+5 -> 5 (SUM semantics); both-null -> stays null, not 0
        assert got == {1: 5, 2: None}

    def test_rejects_unknown_column_and_strategy(self, spark):
        from keenwa_spark.operators import merge_upsert

        base = spark.createDataFrame([(1, 1)], ["k", "n"])
        delta = spark.createDataFrame([(1, 1, 2)], ["k", "n", "extra"])
        with pytest.raises(ValueError):
            merge_upsert(base, delta, keys=["k"])
        with pytest.raises(ValueError):
            merge_upsert(
                base, spark.createDataFrame([(1, 1)], ["k", "n"]),
                keys=["k"], combine={"n": "median"},
            )


class TestIslands:
    def test_gaps_islands_basic(self, spark):
        from keenwa_spark.operators import gaps_islands

        df = spark.createDataFrame(
            [("u", d) for d in [1, 2, 3, 7, 9, 10]] + [("v", 5)],
            ["k", "d"],
        )
        got = {
            (r["k"], r["island_start"]): (r["island_end"], r["island_len"])
            for r in gaps_islands(df, keys=["k"], seq_col="d").collect()
        }
        assert got == {
            ("u", 1): (3, 3),
            ("u", 7): (7, 1),
            ("u", 9): (10, 2),
            ("v", 5): (5, 1),
        }

    def test_scd2_compress_runs_and_open_interval(self, spark):
        from keenwa_spark.operators import scd2_compress

        df = spark.createDataFrame(
            [("u", 1, "a"), ("u", 2, "a"), ("u", 3, "b"),
             ("u", 4, "b"), ("u", 5, "a")],
            ["k", "t", "attr"],
        )
        rows = sorted(
            scd2_compress(df, keys=["k"], ts_col="t", attr_cols=["attr"])
            .collect(),
            key=lambda r: r["valid_from"],
        )
        assert [(r["attr"], r["valid_from"], r["valid_to"], r["n_obs"])
                for r in rows] == [
            ("a", 1, 3, 2), ("b", 3, 5, 2), ("a", 5, None, 1),
        ]

    def test_scd2_null_attribute_transitions(self, spark):
        from keenwa_spark.operators import scd2_compress

        df = spark.createDataFrame(
            [("u", 1, None), ("u", 2, None), ("u", 3, "x")],
            "k string, t int, attr string",
        )
        rows = sorted(
            scd2_compress(df, keys=["k"], ts_col="t", attr_cols=["attr"])
            .collect(),
            key=lambda r: r["valid_from"],
        )
        # the all-NULL first run still opens an interval (row_number guard)
        assert [(r["attr"], r["valid_from"], r["valid_to"]) for r in rows] == [
            (None, 1, 3), ("x", 3, None),
        ]

    def test_scd2_single_shuffle_plan(self, spark):
        """All three window passes share one (k) hash partitioning —
        the physical plan must contain exactly ONE Exchange."""
        from keenwa_spark.operators import scd2_compress

        df = spark.createDataFrame([("u", 1, "a")], ["k", "t", "attr"])
        plan = (
            scd2_compress(df, keys=["k"], ts_col="t", attr_cols=["attr"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") <= 2  # one hash + AQE reuse at most


class TestRollingAnomaly:
    def _series(self, spark, vals, key="u"):
        from datetime import datetime, timedelta

        base = datetime(2024, 1, 1)
        return spark.createDataFrame(
            [(key, base + timedelta(seconds=i), float(v))
             for i, v in enumerate(vals)],
            "k string, ts timestamp, v double",
        )

    def _score(self, df, **kw):
        from keenwa_spark.operators.anomaly import rolling_zscore_anomaly

        defaults = dict(
            keys=["k"], ts_col="ts", value_col="v",
            window_seconds=3600, min_obs=5,
        )
        defaults.update(kw)
        return rolling_zscore_anomaly(df, **defaults)

    def test_spike_flagged_history_not_diluted(self, spark):
        # steady 10s with jitter, then a spike: only the spike flags
        vals = [10, 11, 9, 10, 11, 9, 10, 100]
        rows = sorted(
            self._score(self._series(spark, vals)).collect(),
            key=lambda r: r["ts"],
        )
        assert [r["is_anomaly"] for r in rows[:-1]] == [False] * 7
        spike = rows[-1]
        assert spike["is_anomaly"] and spike["z"] > 3
        # baseline excludes the spike itself: mean stays ~10
        assert abs(spike["mean_hist"] - 10.0) < 1.0
        assert spike["n_hist"] == 7

    def test_min_obs_and_constant_history_give_null_z(self, spark):
        vals = [5, 5, 5, 5, 5, 5, 99]
        rows = sorted(
            self._score(self._series(spark, vals)).collect(),
            key=lambda r: r["ts"],
        )
        # first rows: too little history; last row: constant history
        # (var == 0) — both must yield NULL z and is_anomaly=False,
        # never a NaN-driven flag
        assert all(r["z"] is None for r in rows)
        assert all(r["is_anomaly"] is False for r in rows)

    def test_window_bound_expires_old_history(self, spark):
        from datetime import datetime, timedelta

        base = datetime(2024, 1, 1)
        rows_in = [("u", base + timedelta(seconds=s), v) for s, v in [
            (0, 1.0), (10, 2.0), (20, 3.0), (10000, 9.0),
        ]]
        spark_df = spark.createDataFrame(
            rows_in, "k string, ts timestamp, v double"
        )
        scored = sorted(
            self._score(spark_df, window_seconds=60, min_obs=2).collect(),
            key=lambda r: r["ts"],
        )
        # the 10000s row's 60s window holds nothing
        assert scored[-1]["n_hist"] == 0 and scored[-1]["z"] is None

    def test_validates_args(self, spark):
        df = self._series(spark, [1, 2, 3])
        with pytest.raises(ValueError):
            self._score(df, window_seconds=0)
        with pytest.raises(ValueError):
            self._score(df, min_obs=1)


class TestCdcNullKeys:
    def test_plain_keys_null_key_is_delete_plus_insert(self, spark):
        from keenwa_spark.operators import snapshot_diff

        old = spark.createDataFrame([(None, "a")], "k int, v string")
        new = spark.createDataFrame([(None, "b")], "k int, v string")
        got = sorted(
            r["change_type"]
            for r in snapshot_diff(old, new, keys=["k"]).collect()
        )
        assert got == ["delete", "insert"]

    def test_null_safe_keys_null_key_is_update(self, spark):
        from keenwa_spark.operators import merge_upsert, snapshot_diff

        old = spark.createDataFrame([(None, "a")], "k int, v string")
        new = spark.createDataFrame([(None, "b")], "k int, v string")
        rows = snapshot_diff(
            old, new, keys=["k"], null_safe_keys=True
        ).collect()
        assert len(rows) == 1 and rows[0]["change_type"] == "update"

        base = spark.createDataFrame([(None, 1)], "k int, n int")
        delta = spark.createDataFrame([(None, 2)], "k int, n int")
        merged = merge_upsert(
            base, delta, keys=["k"], combine={"n": "sum"},
            null_safe_keys=True,
        ).collect()
        assert len(merged) == 1 and merged[0]["n"] == 3

    def test_plain_keys_null_delta_row_inserts_its_values(self, spark):
        from keenwa_spark.operators import merge_upsert

        base = spark.createDataFrame([(1, 10)], "k int, n int")
        delta = spark.createDataFrame([(None, 7)], "k int, n int")
        got = {r["k"]: r["n"] for r in merge_upsert(
            base, delta, keys=["k"]
        ).collect()}
        # the NULL-keyed delta row must carry ITS value, not base NULLs
        assert got == {1: 10, None: 7}

    def test_plain_keys_reuse_aggregate_partitioning(self, views):
        """The default plain-equality keys must let the full-outer join
        reuse the groupBy shuffles — null-safe keys measurably double
        the exchanges (the reason they are opt-in)."""
        from pyspark.sql import functions as F

        from keenwa_spark.operators import snapshot_diff

        ev = views.table("events")
        a = ev.groupBy("user_id").agg(F.count("*").alias("n"))
        b = ev.groupBy("user_id").agg(F.count("*").alias("n"))
        plain = snapshot_diff(a, b, keys=["user_id"])
        safe = snapshot_diff(a, b, keys=["user_id"], null_safe_keys=True)
        n_plain = plain._jdf.queryExecution().executedPlan().toString().count("Exchange")
        n_safe = safe._jdf.queryExecution().executedPlan().toString().count("Exchange")
        assert n_plain < n_safe


class TestChangelogCompact:
    def test_tombstone_kills_key_and_latest_wins(self, spark):
        from keenwa_spark.operators.cdc import changelog_compact

        rows = [
            ("a", 1, "upsert", 10), ("a", 2, "upsert", 20),
            ("b", 1, "upsert", 5), ("b", 2, "delete", 0),
            ("c", 1, "delete", 0), ("c", 2, "upsert", 7),
        ]
        df = spark.createDataFrame(rows, "k string, ts int, op string, v int")
        got = {r["k"]: r["v"] for r in changelog_compact(
            df, keys=["k"], ts_col="ts", op_col="op"
        ).collect()}
        # a: latest upsert survives; b: tombstone last -> gone;
        # c: upsert AFTER the tombstone resurrects with the new value
        assert got == {"a": 20, "c": 7}

    def test_equal_ts_tiebreak_deterministic(self, spark):
        from keenwa_spark.operators.cdc import changelog_compact

        rows = [("a", 1, 1, "upsert", 10), ("a", 1, 2, "upsert", 99)]
        df = spark.createDataFrame(
            rows, "k string, ts int, seq int, op string, v int"
        )
        got = changelog_compact(
            df, keys=["k"], ts_col="ts", op_col="op", tie_cols=["seq"]
        ).collect()
        assert len(got) == 1 and got[0]["v"] == 99  # highest seq wins


class TestHyperfunctions:
    def _series(self, spark, rows):
        from datetime import datetime, timedelta

        base = datetime(2024, 1, 1)
        return spark.createDataFrame(
            [(k, base + timedelta(seconds=s), float(v))
             for k, s, v in rows],
            "k string, ts timestamp, v double",
        )

    def test_twa_locf_weights_by_hold_time(self, spark):
        from keenwa_spark.operators.hyperfunctions import time_weighted_avg

        # v=10 held 10s, v=20 held 30s, last obs closes the span
        df = self._series(spark, [("u", 0, 10), ("u", 10, 20), ("u", 40, 7)])
        r = time_weighted_avg(df, ["k"], "ts", "v").collect()[0]
        assert r["twa"] == (10 * 10 + 20 * 30) / 40
        assert r["duration_us"] == 40_000_000 and r["n_obs"] == 3
        # a chatty-then-idle series: plain AVG would say 12.33, TWA 17.5
        assert abs(r["twa"] - 17.5) < 1e-12

    def test_twa_linear_trapezoid(self, spark):
        from keenwa_spark.operators.hyperfunctions import time_weighted_avg

        df = self._series(spark, [("u", 0, 0), ("u", 10, 10)])
        r = time_weighted_avg(df, ["k"], "ts", "v", method="linear").collect()[0]
        assert r["twa"] == 5.0  # straight ramp averages its midpoint

    def test_twa_single_obs_and_validation(self, spark):
        from keenwa_spark.operators.hyperfunctions import time_weighted_avg

        df = self._series(spark, [("u", 0, 42)])
        r = time_weighted_avg(df, ["k"], "ts", "v").collect()[0]
        assert r["twa"] is None and r["duration_us"] == 0 and r["n_obs"] == 1
        with pytest.raises(ValueError):
            time_weighted_avg(df, ["k"], "ts", "v", method="nearest")

    def test_state_durations_and_share(self, spark):
        from datetime import datetime, timedelta

        from keenwa_spark.operators.hyperfunctions import state_durations

        base = datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("u", base + timedelta(seconds=s), st)
             for s, st in [(0, "up"), (10, "down"), (15, "up"), (45, "up")]],
            "k string, ts timestamp, state string",
        )
        got = {r["state"]: (r["duration_us"], r["n_intervals"], r["share"])
               for r in state_durations(df, ["k"], "ts", "state").collect()}
        # up: [0,10) + [15,45) = 40s; down: [10,15) = 5s; last obs open
        assert got["up"] == (40_000_000, 2, 40 / 45)
        assert got["down"] == (5_000_000, 1, 5 / 45)

    def test_counter_delta_handles_resets(self, spark):
        from keenwa_spark.operators.hyperfunctions import counter_delta

        # 100 -> 150 (+50), reset to 5 (+5), 5 -> 30 (+25)
        df = self._series(
            spark, [("u", 0, 100), ("u", 1, 150), ("u", 2, 5), ("u", 3, 30)]
        )
        r = counter_delta(df, ["k"], "ts", "v").collect()[0]
        assert r["counter_increase"] == 80.0
        assert r["n_resets"] == 1 and r["n_obs"] == 4


def test_ohlc_bars_deterministic_open_close(spark):
    from datetime import datetime, timedelta

    from keenwa_spark.operators.hyperfunctions import ohlc_bars

    base = datetime(2024, 1, 1, 9, 0, 0)
    rows = [
        ("s", base + timedelta(minutes=1), 1, 10.0),
        ("s", base + timedelta(minutes=30), 2, 99.0),
        ("s", base + timedelta(minutes=59), 3, 3.0),
        # equal-ts pair: higher tie id must win close, lower wins open
        ("s", base + timedelta(minutes=59), 4, 7.0),
        ("s", base + timedelta(hours=1, minutes=5), 5, 42.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, i int, v double")
    got = {
        str(r["bucket"]): (r["open"], r["high"], r["low"], r["close"],
                           r["n"], r["volume"])
        for r in ohlc_bars(
            df, ["k"], "ts", "v", grain="hour", tie_cols=["i"]
        ).collect()
    }
    assert got["2024-01-01 09:00:00"] == (10.0, 99.0, 3.0, 7.0, 4, 119.0)
    assert got["2024-01-01 10:00:00"] == (42.0, 42.0, 42.0, 42.0, 1, 42.0)


class TestSequencePattern:
    def test_funnel_regex_counts_and_tiebreak(self, spark):
        from datetime import datetime, timedelta

        from keenwa_spark.operators.sequence import sequence_pattern_count

        base = datetime(2024, 1, 1)
        rows = [
            # u: v c c p ... v p  -> two matches of vc*p
            ("u", 0, 1, "view"), ("u", 1, 2, "click"), ("u", 2, 3, "click"),
            ("u", 3, 4, "purchase"), ("u", 4, 5, "error"),
            ("u", 5, 6, "view"), ("u", 6, 7, "purchase"),
            # w: p v  -> zero (order matters)
            ("w", 0, 8, "purchase"), ("w", 1, 9, "view"),
        ]
        df = spark.createDataFrame(
            [(k, base + timedelta(seconds=s), i, e) for k, s, i, e in rows],
            "k string, ts timestamp, i long, ev string",
        )
        got = {r["k"]: (r["seq_len"], r["n_matches"])
               for r in sequence_pattern_count(
                   df, ["k"], "ts", "ev",
                   mapping={"view": "v", "click": "c", "purchase": "p"},
                   pattern="vc*p", tie_cols=["i"],
               ).collect()}
        assert got == {"u": (7, 2), "w": (2, 0)}

    def test_unmapped_breaks_adjacency_and_validation(self, spark):
        from datetime import datetime, timedelta

        from keenwa_spark.operators.sequence import sequence_pattern_count

        base = datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("u", base, 1, "view"),
             ("u", base + timedelta(seconds=1), 2, "noise"),
             ("u", base + timedelta(seconds=2), 3, "purchase")],
            "k string, ts timestamp, i long, ev string",
        )
        kw = dict(keys=["k"], ts_col="ts", event_col="ev", tie_cols=["i"])
        strict = sequence_pattern_count(
            df, mapping={"view": "v", "purchase": "p"}, pattern="vp", **kw
        ).collect()[0]
        assert strict["n_matches"] == 0  # '_' between v and p
        lenient = sequence_pattern_count(
            df, mapping={"view": "v", "purchase": "p"}, pattern="v.p", **kw
        ).collect()[0]
        assert lenient["n_matches"] == 1
        with pytest.raises(ValueError):
            sequence_pattern_count(
                df, mapping={"view": "vv"}, pattern="v", **kw
            )


class TestRandomizedCrossChecks:
    """Seeded randomized brute-force cross-checks (the range-join test
    pattern): small random inputs, operator result vs a straight-line
    Python reference."""

    def test_gaps_islands_random(self, spark):
        import random

        from keenwa_spark.operators import gaps_islands

        rnd = random.Random(421)
        for _ in range(5):
            data = {
                k: sorted(rnd.sample(range(30), rnd.randint(1, 12)))
                for k in ("a", "b", "c")
            }
            rows = [(k, d) for k, ds in data.items() for d in ds]
            got = {
                (r["k"], r["island_start"], r["island_end"], r["island_len"])
                for r in gaps_islands(
                    spark.createDataFrame(rows, "k string, d int"),
                    keys=["k"], seq_col="d",
                ).collect()
            }
            want = set()
            for k, ds in data.items():
                start = prev = ds[0]
                for d in ds[1:] + [None]:
                    if d is None or d != prev + 1:
                        want.add((k, start, prev, prev - start + 1))
                        start = d
                    prev = d
            assert got == want

    def test_merge_upsert_random_equals_recompute(self, spark):
        import random

        from keenwa_spark.operators import merge_upsert

        rnd = random.Random(77)
        for _ in range(5):
            # random event log split at a random point; merged partials
            # must equal the one-shot aggregate over everything
            log = [(rnd.randint(0, 6), rnd.randint(1, 100))
                   for _ in range(rnd.randint(5, 40))]
            cut = rnd.randint(0, len(log))

            def agg(part):
                out = {}
                for k, v in part:
                    n, s = out.get(k, (0, 0))
                    out[k] = (n + 1, s + v)
                return out

            def to_df(d):
                return spark.createDataFrame(
                    [(k, n, s) for k, (n, s) in d.items()] or [(None, None, None)],
                    "k int, n long, s long",
                ).where("k IS NOT NULL")

            merged = merge_upsert(
                to_df(agg(log[:cut])), to_df(agg(log[cut:])),
                keys=["k"], combine={"n": "sum", "s": "sum"},
            )
            got = {r["k"]: (r["n"], r["s"]) for r in merged.collect()}
            assert got == agg(log)

    def test_changelog_compact_random(self, spark):
        import random

        from keenwa_spark.operators.cdc import changelog_compact

        rnd = random.Random(99)
        for _ in range(5):
            log = [
                (rnd.randint(0, 4), t, rnd.choice(["up", "up", "del"]), t * 10)
                for t in range(rnd.randint(3, 25))
            ]
            df = spark.createDataFrame(log, "k int, ts int, op string, v int")
            got = {r["k"]: r["v"] for r in changelog_compact(
                df, keys=["k"], ts_col="ts", op_col="op",
                tie_cols=["v"], delete_op="del",
            ).collect()}
            last = {}
            for k, ts, op, v in log:  # ts strictly increasing per row
                last[k] = (op, v)
            want = {k: v for k, (op, v) in last.items() if op != "del"}
            assert got == want


def test_time_resample_interpolate_linear_and_edges(spark):
    from datetime import datetime, timedelta

    from keenwa_spark.operators.resample import time_resample_interpolate

    base = datetime(2024, 1, 1)
    # observed days 0 and 3 (values 10 -> 40): days 1,2 interpolate to
    # 20, 30; NULL-valued day 5 extends the grid but anchors nothing,
    # so day 4 and 5 are trailing edges
    rows = [
        ("u", base + timedelta(days=0), 1, 10.0),
        ("u", base + timedelta(days=3), 2, 40.0),
        ("u", base + timedelta(days=5), 3, None),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, i long, v double"
    )
    got = {
        str(r["bucket_ts"])[:10]: (r["value"], r["n_obs"], r["src"])
        for r in time_resample_interpolate(
            df, key_col="k", ts_col="ts", value_col="v",
            step_seconds=86400, id_col="i",
        ).collect()
    }
    assert got["2024-01-01"] == (10.0, 1, "obs")
    assert got["2024-01-02"] == (20.0, 0, "interp")
    assert got["2024-01-03"] == (30.0, 0, "interp")
    assert got["2024-01-04"] == (40.0, 1, "obs")
    assert got["2024-01-05"] == (None, 0, "edge")
    assert got["2024-01-06"] == (None, 0, "edge")


def test_interval_coalesce_overlap_touch_containment(spark):
    from keenwa_spark.operators.islands import interval_coalesce

    # overlap (0-10, 5-15), touch (15-20), contained (16-17),
    # then a gap and a lone interval
    rows = [
        ("u", 0, 10), ("u", 5, 15), ("u", 15, 20), ("u", 16, 17),
        ("u", 30, 40),
        ("v", 100, 110),
    ]
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(k, base + timedelta(seconds=s), base + timedelta(seconds=e))
         for k, s, e in rows],
        "k string, s timestamp, e timestamp",
    )
    got = {
        (r["k"], str(r["merged_start"])[17:19]): (
            str(r["merged_end"])[17:19], r["n_intervals"]
        )
        for r in interval_coalesce(
            df, keys=["k"], start_col="s", end_col="e"
        ).collect()
    }
    assert got == {
        ("u", "00"): ("20", 4),   # overlap+touch+contained merge
        ("u", "30"): ("40", 1),
        ("v", "40"): ("50", 1),   # 100s -> :41:40, 110s -> :41:50
    }


def test_skyline_2d_dominance(spark):
    from keenwa_spark.operators.skyline import skyline_2d

    # frontier: (10,1) (8,0); dominated: (9,2) by (10,1)... wait (10,1)
    # has mx 10 >= 9 and mn 1 <= 2 strict -> dominated; (10,5) dominated
    # by (10,1); duplicates collapse
    rows = [(10, 1), (9, 2), (8, 0), (10, 5), (7, 3), (8, 0)]
    df = spark.createDataFrame(rows, "mx int, mn int")
    got = {(r["mx"], r["mn"]) for r in skyline_2d(df, "mx", "mn").collect()}
    assert got == {(10, 1), (8, 0)}


def test_merge_upsert_sum_keeps_decimal_schema_stable(spark):
    """ADVICE r05: repeated 'sum' merges must not widen the decimal —
    the parquet state store's schema has to stay fixed batch after
    batch (decimal add widens precision by 1 per merge otherwise)."""
    from keenwa_spark.operators.cdc import merge_upsert

    base = spark.createDataFrame(
        [(1, "10.500000"), (2, "3.250000")], "k INT, v STRING"
    ).selectExpr("k", "CAST(v AS DECIMAL(28,6)) AS v")
    delta = spark.createDataFrame(
        [(1, "0.500000"), (3, "7.000000")], "k INT, v STRING"
    ).selectExpr("k", "CAST(v AS DECIMAL(28,6)) AS v")

    m1 = merge_upsert(base, delta, keys=["k"], combine={"v": "sum"})
    assert dict(m1.dtypes)["v"] == "decimal(28,6)"
    m2 = merge_upsert(m1, delta, keys=["k"], combine={"v": "sum"})
    assert dict(m2.dtypes)["v"] == "decimal(28,6)"
    got = {r["k"]: str(r["v"]) for r in m2.collect()}
    assert got == {1: "11.500000", 2: "3.250000", 3: "14.000000"}


def test_counter_delta_ignores_null_timestamps(spark):
    """ADVICE r05: a NULL-ts row must not become the window's first
    'prev' observation and fabricate a reset."""
    from keenwa_spark.operators.hyperfunctions import counter_delta, ohlc_bars

    rows = [
        ("a", None, 1000.0),   # NULL ts: excluded
        ("a", "2024-01-01 00:00:00", 10.0),
        ("a", "2024-01-01 01:00:00", 15.0),
        ("a", "2024-01-01 02:00:00", 3.0),  # reset
        ("a", "2024-01-01 03:00:00", 8.0),
    ]
    df = spark.createDataFrame(rows, "k STRING, ts STRING, v DOUBLE").selectExpr(
        "k", "CAST(ts AS TIMESTAMP) AS ts", "v"
    )
    out = counter_delta(df, ["k"], "ts", "v").collect()[0]
    # increases: 5 (10->15), reset to 3 (+3), +5 (3->8) = 13, 1 reset,
    # 4 observations (the NULL-ts row doesn't count)
    assert out["counter_increase"] == 13.0
    assert out["n_resets"] == 1
    assert out["n_obs"] == 4
    bars = ohlc_bars(df, ["k"], "ts", "v", grain="day").collect()
    assert len(bars) == 1 and bars[0]["n"] == 4  # no NULL bucket
