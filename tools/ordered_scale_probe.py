"""Ordered-path scale probe (VERDICT r06 next-round item 6): drive the
two-pass range-bucket machinery at 1x and 10x the sf0.1 events row
count with bucket count > cores (multiple buckets per core) AND a
forced mega-tie (90% of rows share one value), and measure

- wall clock (sub-linear in rows: the only full-data work is the
  fit/count/tie-fit column-pruned passes plus one hash exchange), and
- driver state (O(B): the cut array, the per-heavy-value tie cuts and
  the per-bucket stat rows — independent of row count).

Results go into SCALE.md's round table. Usage:

    python tools/ordered_scale_probe.py [rows_1x rows_10x]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_BUCKETS = 64  # > 32 cores: two buckets per core
TIE_SHARE = 9  # id % 10 < 9 -> 90% of rows on one value


def make(spark, n: int):
    """Events-shaped mega-tie corpus: 90% of rows share v=42, the rest
    spread over ~100k distinct doubles."""
    return spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 10 < TIE_SHARE, F.lit(42.0))
        .otherwise((F.col("id") % 100003).cast("double") + 1e6)
        .alias("v"),
    )


def probe(spark, n: int) -> dict:
    from keenwa_spark.operators.ordered import (
        _BKT,
        _bucketed,
        fit_bucket_cuts,
        with_global_row_number,
    )

    df = make(spark, n).localCheckpoint(eager=False)
    df.count()  # materialize input outside the timed window

    # driver-state census: cut array + final bucket count (== max
    # possible stat rows); measured on the SAME assignment the timed
    # run recomputes
    cuts = fit_bucket_cuts(df, "v", N_BUCKETS)
    b, n_final = _bucketed(df, "v", "id", False, N_BUCKETS)
    driver_state_rows = len(cuts) + n_final

    t0 = time.time()
    out = with_global_row_number(
        df, ["v", "id"], "v", out_col="i", n_buckets=N_BUCKETS,
        tie_bucket_col="id", materialize=False,
    )
    n_out = out.count()
    wall = time.time() - t0
    assert n_out == n

    # largest final bucket as a fraction of the tie block: proves the
    # mega-tie actually sub-split
    sizes = [
        r["c"]
        for r in b.groupBy(_BKT).agg(F.count(F.lit(1)).alias("c")).collect()
    ]
    return {
        "rows": n,
        "wall_sec": round(wall, 2),
        "cuts": len(cuts),
        "n_final_buckets": n_final,
        "driver_state_rows": driver_state_rows,
        "max_bucket_rows": max(sizes),
        "max_bucket_frac_of_tie": round(
            max(sizes) / (n * TIE_SHARE / 10), 4
        ),
    }


def main() -> None:
    from keenwa_spark.session import get_spark

    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n10 = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    spark = get_spark("ordered_scale_probe")
    spark.range(10).count()  # warmup

    r1 = probe(spark, n1)
    r10 = probe(spark, n10)
    ratio = round(r10["wall_sec"] / r1["wall_sec"], 2)
    print("| rows | wall (s) | cuts | final buckets | driver-state rows |"
          " max bucket | tie frac |")
    print("|---|---|---|---|---|---|---|")
    for r in (r1, r10):
        print(
            f"| {r['rows']:,} | {r['wall_sec']} | {r['cuts']} |"
            f" {r['n_final_buckets']} | {r['driver_state_rows']} |"
            f" {r['max_bucket_rows']:,} | {r['max_bucket_frac_of_tie']} |"
        )
    print(f"wall ratio at 10x rows: {ratio}x")
    print(
        "driver-state ratio: "
        f"{round(r10['driver_state_rows'] / r1['driver_state_rows'], 2)}x"
    )


if __name__ == "__main__":
    main()
