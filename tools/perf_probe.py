"""Ad-hoc perf probe for the round-4 regression triage (judge items
1-2): time individual queries / operator variants in isolation at
sf0.1, best-of-N, same session setup as bench.py.

Usage: python tools/perf_probe.py ivf lsh_collect lsh_selfjoin sessionize
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def lsh_pairs_selfjoin(df, id_col="doc_id", text_col="text", bands=4, max_bucket=1000):
    """r2 variant: bucket self-join with a window size guard."""
    from keenwa_spark.pipeline.dedup import minhash_signatures
    from keenwa_spark.pipeline.hashing import MINHASH_AB
    from pyspark.sql.window import Window

    sig = minhash_signatures(df, id_col, text_col)
    rows_per_band = len(MINHASH_AB) // bands
    band_structs = []
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        key = ", '-', ".join(f"CAST({c} AS STRING)" for c in cols)
        band_structs.append(f"struct({b} AS band, concat({key}) AS bkey)")
    buckets = sig.select(
        F.col(id_col),
        F.explode(F.expr(f"array({', '.join(band_structs)})")).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    sized = buckets.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "bkey"))
    ).filter(F.col("bucket_n") <= max_bucket)
    a = sized.select(F.col(id_col).alias("id_a"), "band", "bkey")
    b = sized.select(F.col(id_col).alias("id_b"), "band", "bkey")
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def main() -> None:
    from keenwa_spark.queries import load_all
    from keenwa_spark.session import get_spark

    registry = load_all()
    spark = get_spark("perf_probe")
    registry["get_scan"].fn(spark, SF_DIR).count()  # warmup

    names = set(sys.argv[1:]) or {"ivf", "lsh_collect", "lsh_selfjoin", "sessionize"}

    def run(tag: str, thunk) -> None:
        best = None
        for _ in range(3):
            t0 = time.time()
            n = thunk().count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"## {tag}: best {best:.3f}s ({n} rows)")

    if "ivf" in names:
        run("ivf", lambda: registry["pl_ann_ivf_topk"].fn(spark, SF_DIR))
    if "lsh_collect" in names:
        run("lsh_collect", lambda: registry["pl_minhash_lsh_pairs"].fn(spark, SF_DIR))
    if "lsh_selfjoin" in names:
        fn = registry["pl_minhash_lsh_pairs"].fn

        def thunk():
            df = fn(spark, SF_DIR)  # registers views; then rebuild variant
            return lsh_pairs_selfjoin(spark.table("documents"))

        run("lsh_selfjoin", thunk)
    if "sessionize" in names:
        run("sessionize", lambda: registry["ev_sessionize"].fn(spark, SF_DIR))


if __name__ == "__main__":
    main()
