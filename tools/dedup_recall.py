"""Measured recall of the banded MinHash-LSH near-dup path against
exact n-gram Jaccard ground truth — the dedup analog of
tools/ann_recall.py.

Corpus: pipeline/fixtures.make_near_dup_corpus (controlled variants at
graded edit rates + unrelated noise docs). Ground truth: the exact
inverted-index Jaccard pairs (pipeline/dedup.ngram_jaccard_pairs) at
each threshold. Candidates: minhash_lsh_pairs under several band
configs (k=12 signature split into b bands of 12/b rows; theoretical
candidate probability 1-(1-J^(12/b))^b). Verified: lsh_verified_pairs
— must be exactly (truth ∩ candidates), precision 1.0 by construction.

Usage: python tools/dedup_recall.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pairs_set(df) -> set[tuple[int, int]]:
    return {(r["id_a"], r["id_b"]) for r in df.select("id_a", "id_b").collect()}


def main() -> None:
    from keenwa_spark.pipeline.dedup import (
        lsh_verified_pairs,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from keenwa_spark.pipeline.fixtures import make_near_dup_corpus
    from keenwa_spark.session import get_spark

    spark = get_spark("dedup_recall")
    docs = make_near_dup_corpus(spark).localCheckpoint()

    print("| threshold | bands | truth pairs | candidates | recall | verified==truth∩cand |")
    print("|---|---|---|---|---|---|")
    for tau in (0.9, 0.7, 0.5, 0.3):
        truth = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(docs, threshold=tau).collect()
        }
        for bands in (4, 6):
            cand = pairs_set(minhash_lsh_pairs(docs, bands=bands))
            recall = len(truth & cand) / len(truth) if truth else 1.0
            ver = pairs_set(lsh_verified_pairs(docs, threshold=tau, bands=bands))
            ok = ver == (truth & cand)
            print(
                f"| {tau} | {bands} | {len(truth)} | {len(cand)} | "
                f"{recall:.3f} | {'yes' if ok else 'NO'} |"
            )


if __name__ == "__main__":
    main()
