"""Measure the pq_encode backend crossover: broadcast-model HOF fold
('sql', pure JVM but interpreted lambdas) vs Arrow/numpy mapInPandas
('numpy', vectorized over rows) as the total codebook size
Σ_s k_s · d (= k_codes · dim for full books) grows.

The encode cost per corpus row is O(k_codes · dim) either way; what
differs is the constant: interpreted HOF steps vs numpy SIMD plus one
Arrow boundary crossing — the exact trade ivf_crossover.py measured
for cell assignment, re-measured here for the per-subspace encode
shape (m small argmins instead of one big one). Prints the markdown
table recorded in SCALE.md. Bit-exactness of the two backends is
pinned in tests/test_recall.py.

Usage: python tools/pq_crossover.py  [N_ROWS=100000]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ROWS = int(os.environ.get("N_ROWS", 100_000))


def main() -> None:
    from keenwa_spark.pipeline.pq import pq_encode, pq_train
    from keenwa_spark.session import get_spark

    spark = get_spark("pq_crossover")
    rng = np.random.default_rng(3)

    print(f"corpus={N_ROWS} rows per point, best-of-3 per cell\n")
    print("| dim | m | k_codes | k·dim | sql (HOF) s | numpy s | faster |")
    print("|---|---|---|---|---|---|---|")
    for dim, m, k in ((32, 4, 4), (64, 4, 8), (64, 8, 64), (128, 8, 128), (128, 16, 256)):
        X = rng.standard_normal((N_ROWS, dim)).astype(np.float64)
        emb = spark.createDataFrame(
            [(i, X[i].tolist()) for i in range(N_ROWS)],
            "vec_id LONG, embedding ARRAY<DOUBLE>",
        ).localCheckpoint(eager=True)
        books = pq_train(emb, m=m, k_codes=k, train_rows=max(2 * k, 1000))
        from pyspark.sql import functions as F

        times = {}
        for backend in ("sql", "numpy"):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                # force the codes column (bare count() would let
                # Catalyst prune the projection and skip the encode)
                pq_encode(emb, books, backend=backend).agg(
                    F.sum(F.expr("aggregate(codes, 0, (a, c) -> a + c)"))
                ).collect()
                best = min(best, time.time() - t0)
            times[backend] = best
        faster = "sql" if times["sql"] <= times["numpy"] else "numpy"
        print(
            f"| {dim} | {m} | {k} | {k * dim} | {times['sql']:.2f} "
            f"| {times['numpy']:.2f} | {faster} |"
        )
        emb.unpersist()


if __name__ == "__main__":
    main()
