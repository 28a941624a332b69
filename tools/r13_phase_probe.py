"""Phase-level timing for the r13 optimization targets (guide §1):
isolate each expensive query's internal phases with the noop sink so
the computation is timed, not the sink or the collect.

Usage: python tools/r13_phase_probe.py [group ...]
Groups: ann, minhash, curation. Default: all.
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


def t(label, fn, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"  {label:45s} {best:7.3f}s")
    return best


def main() -> None:
    groups = set(sys.argv[1:]) or {"ann", "minhash", "curation"}
    registry = load_all()
    spark = get_spark("r13_phase_probe")
    sc = spark.sparkContext
    registry["get_scan"].fn(spark, SF_DIR).count()  # warmup
    # touch tables (the df_query wrapper registers views; reuse it)
    emb_q = registry["pl_ann_ivfpq_topk"]

    if "ann" in groups:
        print("== ANN ivfpq phases ==")
        from keenwa_spark.pipeline import pq as pqm
        from keenwa_spark.pipeline.ivf import _as_vecs, ivf_assign

        # run the query fn once to register views
        emb_q.fn(spark, SF_DIR)
        emb = spark.table("embeddings")

        sc.setJobDescription("r13probe: ivfpq train (collect+fit)")
        t("ivfpq_train (sample collect + fit)", lambda: pqm.ivfpq_train(
            emb, k_cells=4, m=4, k_codes=8, iters=2))
        cents, books = pqm.ivfpq_train(emb, k_cells=4, m=4, k_codes=8, iters=2)

        sc.setJobDescription("r13probe: ivf_assign noop")
        t("ivf_assign (sql, kdim=256)", lambda: noop(
            ivf_assign(emb, cents)))

        cells_kv = spark.createDataFrame(
            [(cid, cv) for cid, cv in cents], "cid INT, cv ARRAY<DOUBLE>"
        )
        def residual():
            return (
                ivf_assign(emb, cents)
                .join(F.broadcast(cells_kv), "cid")
                .withColumn("v", F.expr("zip_with(v, cv, (x, y) -> x - y)"))
                .select("vid", "cid", "v")
            )
        sc.setJobDescription("r13probe: residual noop")
        t("residual (assign + broadcast join)", lambda: noop(residual()))

        sc.setJobDescription("r13probe: encode numpy noop")
        t("encode numpy (mapInPandas)", lambda: noop(
            pqm._encode_vecs(residual(), books, "numpy", keep=("cid",))))
        sc.setJobDescription("r13probe: encode sql noop")
        t("encode sql (broadcast HOF)", lambda: noop(
            pqm._encode_vecs(residual(), books, "sql", keep=("cid",))))

        sc.setJobDescription("r13probe: full ivfpq (auto)")
        t("full ivfpq_search count", lambda: pqm.ivfpq_search(
            emb, emb.filter("vec_id < 10"), k_cells=4, nprobe=2, m=4,
            k_codes=8, topk=5).count())
        sc.setJobDescription("r13probe: full ivfpq (sql encode)")
        t("full ivfpq_search count (sql encode)", lambda: pqm.ivfpq_search(
            emb, emb.filter("vec_id < 10"), k_cells=4, nprobe=2, m=4,
            k_codes=8, topk=5, encode_backend="sql").count())
        sc.setJobDescription("r13probe: full lopq (auto)")
        t("full lopq count", lambda: pqm.ivfpq_search(
            emb, emb.filter("vec_id < 10"), k_cells=4, nprobe=2, m=4,
            k_codes=8, topk=5, local_books=True).count())
        sc.setJobDescription("r13probe: full ivf_search (auto)")
        from keenwa_spark.pipeline.ivf import ivf_search
        t("full ivf_search count (k_cells=8->numpy)", lambda: ivf_search(
            emb, emb.filter("vec_id < 10"), k_cells=8, nprobe=2, k=5).count())
        t("full ivf_search count (sql assign)", lambda: ivf_search(
            emb, emb.filter("vec_id < 10"), k_cells=8, nprobe=2, k=5,
            assign_backend="sql").count())

    if "minhash" in groups:
        print("== MinHash-LSH phases ==")
        from keenwa_spark.pipeline.dedup import (
            minhash_lsh_pairs,
            minhash_signatures,
        )

        registry["pl_minhash_lsh_pairs"].fn(spark, SF_DIR)
        docs = spark.table("documents")
        sc.setJobDescription("r13probe: minhash signatures noop")
        t("minhash_signatures noop", lambda: noop(minhash_signatures(docs)))
        sc.setJobDescription("r13probe: lsh pairs count")
        t("minhash_lsh_pairs count", lambda: minhash_lsh_pairs(docs).count())

    if "curation" in groups:
        print("== corpus curation phases ==")
        from keenwa_spark.pipeline.clustering import connected_components
        from keenwa_spark.pipeline.dedup import minhash_lsh_pairs
        from keenwa_spark.pipeline.text import text_stats

        registry["pl_corpus_curation"].fn(spark, SF_DIR)
        docs = spark.table("documents")
        sc.setJobDescription("r13probe: text_stats noop")
        t("text_stats noop", lambda: noop(
            text_stats(docs).select("doc_id", "n_words")))
        sc.setJobDescription("r13probe: cc over pairs")
        t("connected_components count", lambda: connected_components(
            minhash_lsh_pairs(docs)).count())
        sc.setJobDescription("r13probe: full curation count")
        t("pl_corpus_curation count", lambda: registry[
            "pl_corpus_curation"].fn(spark, SF_DIR).count())


if __name__ == "__main__":
    main()
