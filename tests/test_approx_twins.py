"""Approximate-aggregate twins of the exact operators — the bounded-
memory path a 100 TB deployment actually runs.

The exact percentile (`ev_value_percentiles`) needs a per-group sort;
`approx_percentile` (t-digest-style sketch) and `approx_count_distinct`
(HyperLogLog++) keep fixed-size state per group and merge
associatively, so they scale to any cardinality. These tests pin the
approximation quality against the exact answers on the same data so
the documented tolerances are measured, not asserted from folklore.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_percentile_within_rank_bounds(views):
    """approx_percentile's contract is RANK accuracy (±1/accuracy of
    the rank, returning a real sample), not value proximity — exact
    `percentile` interpolates between samples, so on small/heavy-tailed
    groups the values legitimately differ. Assert the sketch's answer
    falls inside the exact quantile envelope around the target rank."""
    exact = {
        r.event_type: r
        for r in views.sql(
            "SELECT event_type, "
            "percentile(value, 0.45) AS lo50, percentile(value, 0.55) AS hi50, "
            "percentile(value, 0.97) AS lo99, MAX(value) AS hi99 "
            "FROM events GROUP BY event_type"
        ).collect()
    }
    approx = {
        r.event_type: (r.a50, r.a99)
        for r in views.sql(
            "SELECT event_type, approx_percentile(value, 0.5, 10000) AS a50, "
            "approx_percentile(value, 0.99, 10000) AS a99 "
            "FROM events GROUP BY event_type"
        ).collect()
    }
    assert exact.keys() == approx.keys()
    for k, e in exact.items():
        a50, a99 = approx[k]
        assert e.lo50 <= a50 <= e.hi50, (k, e.lo50, a50, e.hi50)
        assert e.lo99 <= a99 <= e.hi99, (k, e.lo99, a99, e.hi99)


def test_approx_count_distinct_within_tolerance(views):
    exact = views.table("events").select(
        F.countDistinct("user_id").alias("n")
    ).collect()[0].n
    approx = views.table("events").select(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n")
    ).collect()[0].n
    # HLL++ at rsd=0.02: allow 3 sigma
    assert abs(approx - exact) / exact < 0.06, (exact, approx)
