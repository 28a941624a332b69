"""Round-9 10x scale probes (VERDICT r08 items 4-5):

1. **mmr_rerank_grouped at 10x QUERY COUNT** — the one round-8 SCALE.md
   row that shipped without numbers. Grouped MMR's claim: each greedy
   round is ONE windowed pass over (queries x bounded candidates), so
   wall-clock is O(k) rounds regardless of query count — probe 10 vs
   100 queries (bounded 12-candidate lists each) and show the wall is
   FLAT-ish while work grows 10x.

2. **ivfpq_search at 10x corpus** — the round-9 residual-PQ
   composition: coarse fit + residual codebook fit both on the bounded
   sample (ONE collect), corpus passes all broadcast-side. Probe 1x vs
   10x embeddings (id-shifted union) and check wall stays ~linear with
   zero corpus shuffles in the plan.

Prints SCALE.md rows (wall, ratio, plan exchange/python counts).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _time(build) -> tuple[float, int]:
    """Best-of-3 wall of count() on a FRESHLY BUILT plan each run."""
    best, n = float("inf"), 0
    for _ in range(3):
        t0 = time.time()
        n = build().count()
        best = min(best, time.time() - t0)
    return best, n


def _plan_counts(df) -> str:
    from keenwa_spark.plans import summarize

    df.count()
    s = summarize(df)
    return (
        f"exch={s.exchanges} bhj={s.broadcast_joins} smj={s.sort_merge_joins}"
        f" nlj={s.nested_loop_joins} cart={s.cartesian_products}"
        f" py={s.python_evals}"
    )


def _grouped_candidates(spark, n_queries: int, per_query: int = 12):
    """n_queries bounded candidate lists over the sf embeddings: query
    q's candidates are the first ``per_query`` vectors with
    vec_id % n_queries == q (deterministic), rel a fixed id-derived
    score — isolates the MMR rounds from any retrieval cost."""
    from keenwa_spark.queries import ensure_views

    ensure_views(spark, BASE)
    emb = spark.table("embeddings")
    w = Window.partitionBy("query_id").orderBy("vec_id")
    return (
        emb.select(
            (F.col("vec_id") % n_queries).alias("query_id"),
            "vec_id",
            "embedding",
            ((F.col("vec_id") % 97) / F.lit(97.0)).alias("rel"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_query)
        .drop("rn")
        .localCheckpoint(eager=True)
    )


def probe_mmr_grouped(spark) -> None:
    from keenwa_spark.pipeline.similarity import mmr_rerank_grouped

    print("## mmr_rerank_grouped (k=4 rounds, 12-candidate lists, 10x queries)")
    for label, nq in (("1x (10 queries)", 10), ("10x (100 queries)", 100)):
        cand = _grouped_candidates(spark, nq)

        def build():
            return mmr_rerank_grouped(cand, k=4, lam=0.7)

        out = build()
        wall, n = _time(build)
        print(f"{label}: wall {wall:.2f}s rows {n} [{_plan_counts(out)}]")


def probe_ivfpq(spark) -> None:
    from keenwa_spark.pipeline.pq import ivfpq_search
    from keenwa_spark.queries import ensure_views

    ensure_views(spark, BASE)
    emb1 = spark.table("embeddings").localCheckpoint(eager=True)
    parts = [
        emb1.select(
            (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
            "embedding",
        )
        for i in range(10)
    ]
    emb10 = parts[0]
    for p in parts[1:]:
        emb10 = emb10.unionByName(p)
    emb10 = emb10.localCheckpoint(eager=True)
    print("## ivfpq_search (10x embeddings; both fits stay bounded)")
    for label, e in (("1x", emb1), ("10x", emb10)):
        def build():
            return ivfpq_search(
                e, e.filter("vec_id < 10"), k_cells=4, nprobe=2,
                m=4, k_codes=8, topk=5,
            )

        out = build()
        wall, n = _time(build)
        print(f"{label}: wall {wall:.2f}s rows {n} [{_plan_counts(out)}]")


def main() -> None:
    from keenwa_spark.session import get_spark

    spark = get_spark("r9_scale_probe")
    probe_mmr_grouped(spark)
    probe_ivfpq(spark)


if __name__ == "__main__":
    main()
