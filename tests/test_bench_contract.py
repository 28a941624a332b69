"""The bench stdout contract (VERDICT r08 item 1): the driver captures
only the last ~2000 chars of bench stdout, and rounds 7-8 shipped with
``parsed: null`` because the single fat JSON line outgrew it. These
tests pin the fix — no Spark needed."""

from __future__ import annotations

import json

import bench


def _detail(n_queries: int, n_probes: int) -> dict:
    qs = {f"pl_some_quite_long_query_name_{i:03d}": 0.123 + i for i in range(n_queries)}
    return {
        "metric": "headline_suite_wall_clock",
        "value": 19.741,
        "unit": "sec",
        "round": 9,
        "queries": qs,
        "spread": {n: 1.42 for n in qs},
        "sf": 0.1,
        "prev_round": 8,
        "vs_prev_common_ratio": 1.216,
        "regressions": {n: 1.62 for n in list(qs)[: n_queries // 4]},
        "control_median_sec": 0.997,
        "probe": {
            n: {"min_sec": 0.5, "verdict": "drift"}
            for n in list(qs)[:n_probes]
        },
        "duckdb": {
            "queries_sec": {n: 0.05 for n in list(qs)[:10]},
            "spark_over_duck": {n: 8.1 for n in list(qs)[:10]},
            "geomean_ratio": 4.83,
        },
    }


def test_compact_line_fits_capture_at_todays_headline_size():
    d = _detail(len(bench.HEADLINE), 17)
    line = bench.compact_line(d, "BENCH_DETAIL_r09.json")
    assert len(line) <= bench.CAPTURE_BUDGET
    body = json.loads(line)
    assert body["prev_round"] == 8
    assert body["detail_file"] == "BENCH_DETAIL_r09.json"
    assert len(body["queries"]) == len(bench.HEADLINE)


def test_compact_line_survives_pathological_growth():
    """Even at 3x the current headline count with every query flagged
    and probed, the line still parses and fits — the shrink drops the
    bulk blocks (which live in the detail file) rather than overflow."""
    d = _detail(3 * len(bench.HEADLINE), 3 * len(bench.HEADLINE))
    line = bench.compact_line(d, "BENCH_DETAIL_r99.json")
    assert len(line) <= bench.CAPTURE_BUDGET
    body = json.loads(line)
    # the non-droppable core always survives
    for key in ("value", "prev_round", "vs_prev_common_ratio",
                "control_median_sec", "detail_file"):
        assert key in body


def test_prev_round_prefers_detail_and_excludes_inflight():
    """load_prev_round must resolve to the latest COMPLETED round with
    usable queries — with BENCH_DETAIL_r08.json committed that is 8
    (rounds 7-8 driver files are parsed: null), never this round's own
    in-flight detail file."""
    n, q, c, micro = bench.load_prev_round()
    assert n == 8
    assert len(q) >= 30
    assert c is not None
    # round 8 predates the micro control; the axis activates from r10
    assert micro is None
    assert n < bench.this_round()
