"""Skew stress probe: measured justification for operators/skew.py.

Builds a pathological join in memory — a fact table where ONE key owns
half of all rows, against a small-but-over-broadcast-threshold
dimension — and times three physical treatments:

1. plain shuffle join with AQE skew handling DISABLED (the baseline a
   naive engine gives you: the hot key's partition serializes on one
   task);
2. AQE skew-join enabled (Spark's built-in split of oversized
   partitions — handles this case when the join is SMJ/SHJ);
3. salted_join (operators/skew.py — the explicit rewrite that also
   covers the cases AQE can't see, e.g. pre-shuffle aggregates or
   non-splittable single keys).

Each variant is checked for the SAME row count (correctness), then
timed best-of-3. Run: python tools/skew_probe.py [ROWS=4000000]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("ROWS", 4_000_000))
DIM = 200_000  # too big to broadcast at default 10MB threshold


def main() -> None:
    from pyspark.sql import functions as F

    from keenwa_spark.operators.skew import salted_join
    from keenwa_spark.session import get_spark

    spark = get_spark("skew_probe")
    # half the fact rows hit key 0; the rest spread uniformly
    fact = (
        spark.range(ROWS)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.col("id") % DIM)
            .alias("k"),
            (F.col("id") * 7 % 1000).alias("payload"),
        )
    )
    dim = spark.range(DIM).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("attr")
    )
    fact.persist().count()
    dim.persist().count()

    def timed(tag, build):
        # correctness first
        n = build().count()
        ts = []
        for _ in range(3):
            t0 = time.time()
            build().count()
            ts.append(time.time() - t0)
        print(f"{tag}: rows={n} best={min(ts):.2f}s")
        return min(ts)

    def with_conf(pairs, fn):
        olds = {k: spark.conf.get(k, None) for k in pairs}
        for k, v in pairs.items():
            spark.conf.set(k, v)
        try:
            return fn()
        finally:
            for k, v in olds.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    no_aqe_skew = {
        "spark.sql.adaptive.skewJoin.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    aqe_skew = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }

    t_plain = with_conf(
        no_aqe_skew, lambda: timed("plain (no AQE skew)", lambda: fact.join(dim, "k"))
    )
    t_aqe = with_conf(
        aqe_skew, lambda: timed("AQE skew-join", lambda: fact.join(dim, "k"))
    )
    t_salt = with_conf(
        no_aqe_skew,
        lambda: timed(
            "salted_join x16", lambda: salted_join(fact, dim, on="k", salts=16)
        ),
    )
    print(
        f"\n| treatment | best (s) |\n|---|---|\n"
        f"| plain shuffle join, AQE skew off | {t_plain:.2f} |\n"
        f"| AQE skew-join | {t_aqe:.2f} |\n"
        f"| salted_join (16 salts), AQE skew off | {t_salt:.2f} |"
    )


if __name__ == "__main__":
    main()
