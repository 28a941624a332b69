"""ANN recall@k sweep: lsh_bucket_topk (bits x multiprobe) and
ivf_search (k_cells x nprobe) against exact cosine_topk ground truth.

Prints the markdown table recorded in SCALE.md.

Usage:
    python tools/ann_recall.py                  # random testdata corpus
    CLUSTERED=1 python tools/ann_recall.py      # mixture-of-Gaussians
    [SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERIES = 50
K = 5


def main() -> None:
    from keenwa_spark.pipeline.ivf import ivf_search
    from keenwa_spark.pipeline.recall import recall_at_k
    from keenwa_spark.pipeline.similarity import cosine_topk, lsh_bucket_topk
    from keenwa_spark.session import get_spark

    spark = get_spark("ann_recall")
    if os.environ.get("CLUSTERED"):
        from keenwa_spark.pipeline.fixtures import make_clustered_embeddings

        emb = make_clustered_embeddings(spark).localCheckpoint(eager=True)
        src = "clustered mixture-of-Gaussians (pipeline/fixtures.py)"
    else:
        emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        src = f"random testdata {SF_DIR}"
    queries = emb.filter(f"vec_id < {N_QUERIES}")
    n = emb.count()
    truth = cosine_topk(emb, queries, k=K).localCheckpoint(eager=True)

    print(f"corpus={n} vectors, {N_QUERIES} queries, k={K}, source={src}\n")
    print("| operator | params | recall@5 | corpus scored/query |")
    print("|---|---|---|---|")
    for bits in (4, 6, 8):
        for mp in (0, 1):
            r = recall_at_k(
                lsh_bucket_topk(emb, queries, k=K, bits=bits, multiprobe=mp), truth
            )
            frac = (bits + 1) / 2**bits if mp else 1 / 2**bits
            print(
                f"| sign-LSH | bits={bits} multiprobe={mp} | {r:.3f} | ~{frac:.1%} |"
            )
    for k_cells, nprobe in ((8, 1), (8, 2), (8, 4), (16, 2), (16, 4)):
        r = recall_at_k(
            ivf_search(emb, queries, k_cells=k_cells, nprobe=nprobe, k=K), truth
        )
        print(
            f"| IVF | K={k_cells} nprobe={nprobe} | {r:.3f} | ~{nprobe / k_cells:.1%} |"
        )


if __name__ == "__main__":
    main()
