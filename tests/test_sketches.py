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
