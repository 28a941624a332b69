"""Catalyst-behavior matrix — the analog of the reference's
OptimizerTester rule toggles (reference src/testing.rs:57-85:
add_rules / disable_rules / rule-order shuffles probe how the Cascades
optimizer's choices shift under different rule sets).

Catalyst's "rules" are session confs; this matrix toggles the ones
that decide physical strategy and asserts the CHOSEN JOIN/PLAN SHAPE
per regime — so a config drift that silently flips dimension joins to
sort-merge (or disables AQE re-planning) fails a test, not a prod run.

Every case restores the previous conf value, so regimes can't leak
into other tests sharing the session.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest

from keenwa_spark.plans import explain_text, summarize


@contextmanager
def regime(spark, **confs):
    """Temporarily apply spark confs ('.' encoded as '__' in kwargs is
    not needed — pass a dict instead when keys have dots)."""
    saved = {}
    try:
        for k, v in confs.items():
            saved[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _dim_join(views):
    """A classic dimension join: orders (fact) x customer (dim)."""
    o = views.table("orders")
    c = views.table("customer")
    return o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()


class TestBroadcastThresholdRegimes:
    def test_default_regime_broadcasts_dimension(self, views):
        s = summarize(_dim_join(views))
        assert s.broadcast_joins >= 1 and s.sort_merge_joins == 0, s

    def test_disabled_broadcast_falls_back_to_sort_merge(self, views):
        with regime(views, **{"spark.sql.autoBroadcastJoinThreshold": "-1"}):
            s = summarize(_dim_join(views))
        assert s.broadcast_joins == 0 and s.sort_merge_joins >= 1, s

    def test_hints_select_each_strategy(self, views):
        """The three-way strategy lattice, pinned via join hints (the
        user-facing override, like the reference's explicit physical
        enforcers): broadcast -> BHJ, shuffle_hash -> SHJ,
        merge -> SMJ — each chosen exactly where asked."""
        o = views.table("orders")
        c = views.table("customer")
        for hint, node in (
            ("broadcast", "BroadcastHashJoin"),
            ("shuffle_hash", "ShuffledHashJoin"),
            ("merge", "SortMergeJoin"),
        ):
            plan = explain_text(
                o.join(c.hint(hint), o.o_custkey == c.c_custkey)
                .groupBy("c_mktsegment")
                .count()
            )
            assert node in plan, (hint, plan)

    def test_explicit_hint_overrides_disabled_threshold(self, views):
        from pyspark.sql import functions as F

        o = views.table("orders")
        c = views.table("customer")
        with regime(views, **{"spark.sql.autoBroadcastJoinThreshold": "-1"}):
            s = summarize(
                o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
                .groupBy("c_mktsegment")
                .count()
            )
        assert s.broadcast_joins >= 1, s  # hints beat the conf, like the
        # reference's explicit enforcer rules beat cost choices


class TestAdaptiveRegimes:
    def test_aqe_wraps_plan_when_enabled(self, views):
        with regime(views, **{"spark.sql.adaptive.enabled": "true"}):
            plan = explain_text(_dim_join(views))
        assert "AdaptiveSparkPlan" in plan

    def test_no_aqe_plan_is_static(self, views):
        with regime(views, **{"spark.sql.adaptive.enabled": "false"}):
            plan = explain_text(_dim_join(views))
        assert "AdaptiveSparkPlan" not in plan

    def test_aqe_coalesces_small_shuffle_partitions(self, views):
        """With AQE on, a small aggregate's 32 shuffle partitions
        coalesce at runtime (AQEShuffleRead in the FINAL plan)."""
        with regime(
            views,
            **{
                "spark.sql.adaptive.enabled": "true",
                "spark.sql.adaptive.coalescePartitions.enabled": "true",
            },
        ):
            df = views.table("customer").groupBy("c_mktsegment").count()
            df.collect()  # the final adaptive plan exists only after a run
            plan = df._jdf.queryExecution().executedPlan().toString()
        assert "AQEShuffleRead" in plan or "CustomShuffleReader" in plan


class TestCodegenRegimes:
    def test_wholestage_codegen_spans_present_by_default(self, views):
        with regime(
            views,
            **{
                "spark.sql.codegen.wholeStage": "true",
                # static plan: AQE's wrapper hides the *(n) markers
                "spark.sql.adaptive.enabled": "false",
            },
        ):
            plan = explain_text(_dim_join(views), mode="simple")
        assert "*(" in plan  # codegen stage markers

    def test_wholestage_codegen_off_removes_spans(self, views):
        with regime(
            views,
            **{
                "spark.sql.codegen.wholeStage": "false",
                "spark.sql.adaptive.enabled": "false",
            },
        ):
            plan = explain_text(_dim_join(views), mode="simple")
        assert "*(" not in plan


class TestBucketingRegimes:
    @pytest.fixture(scope="class")
    def bucketed(self, views):
        import shutil

        from keenwa_spark.sources.bucketing import write_bucketed

        for t in ("pm_b_orders", "pm_b_lineitem"):
            views.sql(f"DROP TABLE IF EXISTS {t}")
            # a crashed prior run can leave the location without the
            # catalog entry — clear it or saveAsTable refuses
            shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
        orders = views.table("orders").select("o_orderkey", "o_totalprice")
        lineitem = views.table("lineitem").select(
            views.table("lineitem").l_orderkey.alias("o_orderkey"), "l_quantity"
        )
        write_bucketed(orders, "pm_b_orders", "o_orderkey", n_buckets=8)
        write_bucketed(lineitem, "pm_b_lineitem", "o_orderkey", n_buckets=8)
        return views

    def _join(self, spark):
        return spark.table("pm_b_orders").join(
            spark.table("pm_b_lineitem"), "o_orderkey"
        )

    def test_bucketing_on_joins_without_exchange(self, bucketed):
        with regime(
            bucketed,
            **{
                "spark.sql.sources.bucketing.enabled": "true",
                "spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.adaptive.enabled": "false",
            },
        ):
            plan = explain_text(self._join(bucketed))
        assert "Exchange" not in plan, plan

    def test_bucketing_off_reintroduces_exchanges(self, bucketed):
        with regime(
            bucketed,
            **{
                "spark.sql.sources.bucketing.enabled": "false",
                "spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.adaptive.enabled": "false",
            },
        ):
            plan = explain_text(self._join(bucketed))
        assert "Exchange" in plan


class TestRuntimeBloomFilterRegimes:
    """Runtime bloom-filter join pruning (Spark's runtime-filter
    injection): a selective filter on the creation side plants a
    bloom_filter_agg whose might_contain() prunes the big application
    side BEFORE the join shuffle — at 100 TB this is the difference
    between shuffling the whole fact table and shuffling the ~matching
    fraction. On by default but gated behind a 10GB application-side
    scan threshold, so test-scale scans need the threshold lowered to
    see the injection; the regime matrix pins BOTH directions."""

    SQL = """
        SELECT l.l_orderkey, o.o_totalprice
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_totalprice > 400000
    """
    #: thresholds sized so the test-scale parquet qualifies; broadcast
    #: disabled because BHJ plans skip the bloom path entirely
    INJECT = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }

    def _optimized(self, views):
        return views.sql(self.SQL)._jdf.queryExecution().optimizedPlan().toString()

    def test_selective_join_injects_bloom_filter(self, views):
        with regime(views, **self.INJECT):
            plan = self._optimized(views)
        assert "bloom_filter_agg" in plan, plan[:400]
        assert "might_contain" in plan
        # the filter lands on the application (fact) side's key
        assert "might_contain" in plan.split("Join Inner")[1]

    def test_disabled_regime_removes_injection(self, views):
        confs = dict(self.INJECT)
        confs["spark.sql.optimizer.runtime.bloomFilter.enabled"] = "false"
        with regime(views, **confs):
            plan = self._optimized(views)
        assert "bloom_filter_agg" not in plan
        assert "might_contain" not in plan


class TestCboStatsJoinReorder:
    """ANALYZE-computed statistics flip the join ORDER under CBO — the
    analog of the reference's stats-driven Cascades choices (reference
    src/statistics/simple.rs SimpleCatalogStatisticsBuilder feeding the
    join-commutativity/associativity rules). Written join order is
    deliberately bad (fact x dim first, tiny dim last); with
    cbo+joinReorder and ANALYZEd row counts Catalyst rewrites to join
    the two dimensions first."""

    SQL = """
        SELECT count(*) AS cnt
        FROM orders_stats o
        JOIN customer_stats c ON o.o_custkey = c.c_custkey
        JOIN nation_stats n ON c.c_nationkey = n.n_nationkey
    """

    @pytest.fixture(scope="class")
    def analyzed(self, views):
        from keenwa_spark.catalog import Catalog

        import os

        cat = Catalog(views)
        cat.register_dir(os.environ.get("SF_DIR", "/root/testdata/sf0.001"))
        for t, cols in (
            ("orders", ["o_custkey", "o_orderkey"]),
            ("customer", ["c_custkey", "c_nationkey"]),
            ("nation", ["n_nationkey"]),
        ):
            cat.persist_and_analyze(t, cols)
        return views

    @staticmethod
    def _first_join_leaves(spark, sql):
        """Relation names in optimized-plan order — index order exposes
        which pair joins first."""
        import re

        plan = (
            spark.sql(sql)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        return re.findall(r"default\.(\w+_stats)", plan)

    def test_stats_flip_join_order(self, analyzed):
        cbo_on = {
            "spark.sql.cbo.enabled": "true",
            "spark.sql.cbo.joinReorder.enabled": "true",
        }
        cbo_off = {
            "spark.sql.cbo.enabled": "false",
            "spark.sql.cbo.joinReorder.enabled": "false",
        }
        with regime(analyzed, **cbo_off):
            baseline = self._first_join_leaves(analyzed, self.SQL)
        with regime(analyzed, **cbo_on):
            reordered = self._first_join_leaves(analyzed, self.SQL)
        # without CBO the written order survives: orders joins first
        assert baseline[0] == "orders_stats", baseline
        # with stats the two dims join first and the fact joins LAST
        assert reordered[-1] == "orders_stats", reordered
        assert set(reordered[:2]) == {"customer_stats", "nation_stats"}, reordered

    def test_explain_cost_carries_row_counts(self, analyzed):
        with regime(analyzed, **{"spark.sql.cbo.enabled": "true"}):
            cost = explain_text(analyzed.sql(self.SQL), "cost")
        assert "rowCount=" in cost, cost[:500]


class TestRegimeHygiene:
    def test_regime_restores_previous_values(self, views):
        key = "spark.sql.autoBroadcastJoinThreshold"
        before = views.conf.get(key)
        with regime(views, **{key: "-1"}):
            assert views.conf.get(key) == "-1"
        assert views.conf.get(key) == before


class TestJoinHints:
    """User-facing physical-strategy overrides — the per-query analog
    of the conf-regime matrix above (keenwa exposes rule
    configurability; Spark exposes it per-join via hints)."""

    def test_hints_override_strategy_selection(self, views):
        big = views.table("orders")
        small = views.table("customer").select("c_custkey")

        def physical(df):
            return df._jdf.queryExecution().executedPlan().toString()

        broadcast = big.join(
            small.hint("broadcast"), big.o_custkey == small.c_custkey
        )
        broadcast.collect()
        assert "BroadcastHashJoin" in physical(broadcast)

        merge = big.join(
            small.hint("merge"), big.o_custkey == small.c_custkey
        )
        merge.collect()
        p = physical(merge)
        assert "SortMergeJoin" in p and "BroadcastHashJoin" not in p

        shuffle_hash = big.join(
            small.hint("shuffle_hash"), big.o_custkey == small.c_custkey
        )
        shuffle_hash.collect()
        assert "ShuffledHashJoin" in physical(shuffle_hash)

    def test_sql_hint_comment_form(self, views):
        df = views.sql(
            "SELECT /*+ MERGE(c) */ o_orderkey FROM orders o "
            "JOIN customer c ON o.o_custkey = c.c_custkey"
        )
        df.collect()
        assert "SortMergeJoin" in df._jdf.queryExecution().executedPlan().toString()


def test_dynamic_partition_pruning_fires(views, tmp_path):
    """Joining a partitioned fact to a selectively-filtered dimension
    must inject a DynamicPruning subquery on the fact's partition
    column — at scale THE mechanism that turns a star join over a
    partitioned table into a read of only the matching partitions."""
    from pyspark.sql import functions as F

    fact_path = str(tmp_path / "events_by_day")
    views.table("events").withColumn(
        "day", F.to_date("ts")
    ).write.partitionBy("day").parquet(fact_path)

    # DPP requires a SELECTIVE FILTER on the dim side (a limit or a
    # bare distinct gives the planner nothing to derive a pruning
    # subquery from): urgent-order dates, filtered from a different
    # table, are unknowable statically for the fact scan
    dim = (
        views.table("orders")
        .where("o_orderpriority = '1-URGENT'")
        .select(F.to_date("o_orderdate").alias("day"))
        .distinct()
    )
    views.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    fact = views.read.parquet(fact_path)
    joined = fact.join(dim.hint("broadcast"), "day")
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "DynamicPruning" in plan, plan[:600]
