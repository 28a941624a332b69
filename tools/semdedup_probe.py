"""Semantic-dedup scale probe: drive pipeline/similarity.semantic_dedup
at 1x and 10x the sf0.1 embeddings row count with k (centroid count)
scaled PROPORTIONALLY to the corpus — the configuration SemDeDup runs
at scale (Abbas et al. 2023 use ~100k clusters on LAION-440M, i.e.
k grows with N so the mean cluster size stays constant).

Why k must scale: the pair stage is cluster-local pairwise, i.e.
quadratic in CLUSTER size, linear in corpus size only when
cluster_size ~ N/k is held constant. Running 10x rows against a FIXED
k would measure that quadratic on purpose — the probe pins the honest
deployment shape instead (k: 8 -> 80) and expects a near-linear wall
ratio. Driver state stays O(k) (the broadcast centroid table).

The 10x corpus is 10 id-shifted copies of the sf0.1 embeddings with
one dimension salted by the copy index, so vectors do not collapse
into identical duplicates (which would inflate every cluster's dup
chain instead of stressing throughput).

Usage:
    python tools/semdedup_probe.py

Results go into SCALE.md's round table. Timings best-of-3, warm JVM.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 10


def corpus(spark, copies: int):
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    if copies == 1:
        return emb, n
    parts = []
    for i in range(copies):
        shifted = emb.select(
            (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
            # salt dim 0 by the copy index: copies stay near their
            # original cluster but are not bit-identical duplicates
            F.concat(
                F.array(
                    (
                        F.element_at("embedding", 1) + F.lit(i) * F.lit(0.01)
                    ).cast("float")
                ),
                F.slice("embedding", 2, 10_000),
            ).alias("embedding"),
        )
        parts.append(shifted)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out, n * copies


def probe(spark, copies: int, k: int) -> dict:
    from keenwa_spark.pipeline.similarity import semantic_dedup

    emb, n = corpus(spark, copies)
    emb = emb.localCheckpoint(eager=False)
    emb.count()  # materialize input outside the timed window
    cents = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv")
    )
    best = None
    rows = dups = 0
    for _ in range(3):
        t0 = time.monotonic()
        out = semantic_dedup(emb, cents, threshold=0.3).select(
            F.count("*").alias("rows"),
            F.sum(F.col("is_dup").cast("bigint")).alias("dups"),
        ).collect()[0]
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
        rows, dups = out["rows"], out["dups"]
    return {"n": n, "k": k, "sec": best, "rows": rows, "dups": dups}


def main() -> None:
    from keenwa_spark.session import get_spark

    spark = get_spark("semdedup_probe")
    one = probe(spark, 1, 8)
    ten = probe(spark, COPIES, 8 * COPIES)
    ratio = ten["sec"] / one["sec"]
    print(f"1x : n={one['n']} k={one['k']} {one['sec']:.2f}s "
          f"rows={one['rows']} dups={one['dups']}")
    print(f"10x: n={ten['n']} k={ten['k']} {ten['sec']:.2f}s "
          f"rows={ten['rows']} dups={ten['dups']}")
    print(f"ratio at 10x rows (k scaled 10x, cluster size ~const): "
          f"{ratio:.1f}x")
    if ratio > 12:
        print("FLAG: super-linear — investigate the pair stage")
        sys.exit(1)


if __name__ == "__main__":
    main()
