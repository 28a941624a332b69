"""Sketch aggregates (pipeline/sketches.py): error contracts hold on
real data, and the checks are FALSIFIABLE (a tightened-to-zero bound
must flip the flag — guarding against vacuously-true oracles)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from keenwa_spark.pipeline.sketches import (
    approx_distinct_bounds,
    approx_quantile_bounds,
    hll_merge_equivalence,
)


@pytest.fixture(scope="module")
def ev(views):
    return views.table("events")


def test_approx_distinct_within_bound(ev):
    rows = approx_distinct_bounds(ev, "user_id", ["event_type"]).collect()
    assert rows and all(r["approx_ok"] for r in rows)
    # exact side really is exact
    exact = {
        (r["event_type"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n"))
        .collect()
    }
    assert {(r["event_type"], r["n_exact"]) for r in rows} == exact


def test_approx_distinct_bound_is_falsifiable(ev):
    """tolerance_mult=0 demands estimate == exact (within the 1-count
    floor) — HLL++ cannot do that on thousands of distinct keys, so at
    least one flag must flip. Proves the green flags are a real check."""
    rows = approx_distinct_bounds(
        ev, "event_id", ["event_type"], tolerance_mult=0.0
    ).collect()
    assert any(not r["approx_ok"] for r in rows)


def test_hll_merge_bounded(ev):
    r = hll_merge_equivalence(
        ev, "user_id", (F.col("event_id") % 2).alias("__h")
    ).collect()[0]
    assert r["merged_within_bound"] is True
    assert r["whole_within_bound"] is True
    assert r["merge_drift_ok"] is True
    assert r["n_exact"] > 0


def test_hll_merge_three_way_split(ev):
    """Mergeability is split-shape-independent: a 3-way split's union
    stays within the same bounds."""
    r = hll_merge_equivalence(
        ev, "user_id", (F.col("event_id") % 3).alias("__h")
    ).collect()[0]
    assert r["merged_within_bound"] is True
    assert r["merge_drift_ok"] is True


def test_approx_quantile_rank_contract(ev):
    rows = approx_quantile_bounds(
        ev.where(F.col("value").isNotNull()), "value", [0.1, 0.5, 0.9, 0.99]
    ).collect()
    assert len(rows) == 4
    assert all(r["rank_ok"] for r in rows)
    n = ev.where(F.col("value").isNotNull()).count()
    assert all(r["n_values"] == n for r in rows)


def test_approx_quantile_rejects_empty_probs(ev):
    with pytest.raises(ValueError, match="probs"):
        approx_quantile_bounds(ev, "value", [])


def test_approx_quantile_empty_input_vacuous_contract(ev):
    """Empty input: approx_percentile returns NULL; the rank contract
    is vacuously satisfied — one row per prob, n_values 0, no crash
    (found by the empty-input sweep: previously IndexError)."""
    rows = approx_quantile_bounds(
        ev.where("1 = 0"), "value", [0.5, 0.9]
    ).collect()
    assert [(r.prob, r.n_values, r.rank_ok) for r in rows] == [
        (0.5, 0, True),
        (0.9, 0, True),
    ]


class TestCountMin:
    """Count-min sketch: one-sided estimates, exactness without
    collisions, mergeability (pipeline/sketches.py cms_build)."""

    W = 64

    @pytest.fixture(scope="class")
    def stream(self, spark):
        from keenwa_spark.pipeline.hashing import spark_hash64

        # a skewed stream: tok0 x 50, tok1 x 10, tok2..tok9 x 1
        rows = [("tok0",)] * 50 + [("tok1",)] * 10 + [
            (f"tok{i}",) for i in range(2, 10)
        ]
        return spark.createDataFrame(rows, "tok string").select(
            "tok", F.expr(spark_hash64("tok")).alias("h")
        )

    def _estimates(self, stream, w):
        from keenwa_spark.pipeline.sketches import cms_build, cms_estimate

        sketch = cms_build(stream.select("h"), "h", w=w)
        items = stream.groupBy("tok", "h").count()
        return {
            r.tok: r.est_cnt
            for r in cms_estimate(items, sketch, "h", key_cols=("tok",), w=w)
            .collect()
        }

    def test_one_sided_and_skew_preserved(self, stream):
        est = self._estimates(stream, self.W)
        true = {"tok0": 50, "tok1": 10, **{f"tok{i}": 1 for i in range(2, 10)}}
        # never undercounts; total overshoot bounded by the stream size
        assert all(est[t] >= c for t, c in true.items())
        assert est["tok0"] >= 50 and est["tok0"] <= 50 + 18
        # the heavy hitter dominates every light token's estimate... 
        # unless a light token collides INTO tok0 on all rows; with
        # w=64 and 10 tokens that doesn't happen for this fixture
        assert est["tok0"] > max(est[f"tok{i}"] for i in range(2, 10))

    def test_exact_when_wide(self, stream):
        # w >> items: no collisions, estimates are exact counts
        est = self._estimates(stream, 4096)
        assert est["tok0"] == 50 and est["tok1"] == 10
        assert all(est[f"tok{i}"] == 1 for i in range(2, 10))

    def test_mergeable(self, stream):
        from keenwa_spark.pipeline.sketches import cms_build

        half1 = cms_build(stream.limit(30).select("h"), "h", w=self.W)
        half2 = cms_build(
            stream.select("h").exceptAll(stream.limit(30).select("h")),
            "h",
            w=self.W,
        )
        merged = {
            (r.j, r.pos): r.cnt
            for r in half1.unionAll(half2)
            .groupBy("j", "pos")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        }
        full = {
            (r.j, r.pos): r.cnt
            for r in cms_build(stream.select("h"), "h", w=self.W).collect()
        }
        assert merged == full

    def test_sketch_state_is_bounded(self, stream):
        from keenwa_spark.pipeline.sketches import cms_build

        assert cms_build(stream.select("h"), "h", w=self.W).count() <= 4 * self.W

    def test_unseen_item_estimate_can_be_zero(self, spark, stream):
        from keenwa_spark.pipeline.hashing import spark_hash64
        from keenwa_spark.pipeline.sketches import cms_build, cms_estimate

        sketch = cms_build(stream.select("h"), "h", w=4096)
        probe = spark.createDataFrame([("never-seen",)], "tok string").select(
            "tok", F.expr(spark_hash64("tok")).alias("h")
        )
        est = cms_estimate(probe, sketch, "h", key_cols=("tok",), w=4096)
        assert est.collect()[0].est_cnt == 0

    def test_rejects_excess_depth(self, stream):
        from keenwa_spark.pipeline.sketches import cms_build

        with pytest.raises(ValueError, match="frozen hash family"):
            cms_build(stream.select("h"), "h", d=13)
