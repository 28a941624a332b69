"""Probe (guide §1/§3.1): pl_corpus_curation's final stats ⋈ components
left join — executed plan strategy and interleaved A/B of the current
shape vs an explicit broadcast of the components side (which is bounded
by the LSH candidate set, the same tiny-by-construction argument
lsh_verified_pairs already broadcasts on).

Usage: python tools/r14_curation_bcast_probe.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from keenwa_spark.queries import load_all
from keenwa_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def curation_bcast(spark):
    from keenwa_spark.pipeline.clustering import connected_components
    from keenwa_spark.pipeline.dedup import minhash_lsh_pairs
    from keenwa_spark.pipeline.text import text_stats

    docs = spark.table("documents")
    stats = text_stats(docs).select("doc_id", "n_words")
    comp = connected_components(minhash_lsh_pairs(docs))
    return (
        stats.join(F.broadcast(comp), "doc_id", "left")
        .withColumn("component", F.coalesce("component", F.col("doc_id")))
        .filter((F.col("n_words") >= 30) & (F.col("doc_id") == F.col("component")))
        .select("doc_id", "n_words", "component")
    )


def executed_join_strategy(df) -> str:
    noop(df)  # materialize so AQE finalizes
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    registry = load_all()
    spark = get_spark("r14_curation_bcast_probe")
    sc = spark.sparkContext
    q = registry["pl_corpus_curation"]
    q.fn(spark, SF_DIR).count()  # warmup + view registration

    cur = q.fn(spark, SF_DIR)
    new = curation_bcast(spark)

    a = sorted(map(tuple, cur.collect()))
    b = sorted(map(tuple, new.collect()))
    assert a == b, f"MISMATCH: {len(a)} vs {len(b)}"
    print(f"results identical: {len(a)} rows")

    # executed final plans (AQE) for the join strategy claim
    for label, df in [("current", q.fn(spark, SF_DIR)), ("bcast", curation_bcast(spark))]:
        noop(df)
        plan = df._jdf.queryExecution().executedPlan().toString()
        smj = plan.count("SortMergeJoin")
        bhj = plan.count("BroadcastHashJoin")
        exch = plan.count("Exchange") - plan.count("ReusedExchange")
        print(f"{label}: SMJ={smj} BHJ={bhj} Exchange~={exch}")

    best_c, best_b = float("inf"), float("inf")
    for i in range(runs):
        sc.setJobDescription(f"curation current #{i}")
        t0 = time.time(); noop(q.fn(spark, SF_DIR)); best_c = min(best_c, time.time() - t0)
        sc.setJobDescription(f"curation bcast #{i}")
        t0 = time.time(); noop(curation_bcast(spark)); best_b = min(best_b, time.time() - t0)
    print(f"current best-of-{runs}: {best_c:.3f}s")
    print(f"bcast   best-of-{runs}: {best_b:.3f}s")


if __name__ == "__main__":
    main()
