"""One-round loop-body plan census for connected_components (r13
batch 3 evidence): rebuilds the hop+jump round body exactly as
clustering.connected_components does — in BOTH shapes — and prints the
executed-plan operator census, so the "7 Exchange / 3 SMJ -> 5
Exchange / 1 SMJ per round" claim in OPTIMIZATION_r13.md is
reproducible. The self-loop branch mirrors HEAD; the two-join branch
mirrors the r12 shape (git show ba85963^:keenwa_spark/pipeline/
clustering.py).

Usage: python tools/r13_cc_roundbody_probe.py [old|new]   (default both)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from keenwa_spark.queries import load_all
from keenwa_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def census(df) -> dict[str, int]:
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        pat: len(re.findall(pat, plan))
        for pat in (
            "Exchange", "BroadcastHashJoin", "SortMergeJoin",
            "ShuffledHashJoin", "HashAggregate",
        )
    }


def round_body(pairs, self_loop: bool):
    sel = [
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")),
    ]
    if self_loop:
        sel += [
            pairs.select(F.col("id_a").alias("src"), F.col("id_a").alias("dst")),
            pairs.select(F.col("id_b").alias("src"), F.col("id_b").alias("dst")),
        ]
    e = sel[0]
    for x in sel[1:]:
        e = e.union(x)
    edges = e.distinct().localCheckpoint(eager=False)
    labels = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(
            (F.min("dst") if self_loop
             else F.least(F.col("src"), F.min("dst"))).alias("label")
        )
        .localCheckpoint(eager=True)
    )
    if self_loop:
        hopped = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("label"))
        )
    else:
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy(F.col("src").alias("nnode"))
            .agg(F.min("label").alias("nlabel"))
        )
        hopped = (
            labels.join(nbr_min, labels.node == nbr_min.nnode, "left")
            .select(
                F.col("node"),
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
        )
    return (
        hopped.alias("a")
        .join(
            hopped.select(
                F.col("node").alias("jnode"), F.col("label").alias("jlabel")
            ),
            F.col("a.label") == F.col("jnode"),
            "left",
        )
        .select(
            F.col("a.node").alias("node"),
            F.least(F.col("a.label"), F.coalesce("jlabel", "a.label")).alias("label"),
        )
    )


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    registry = load_all()
    spark = get_spark("r13_cc_roundbody_probe")
    registry["pl_corpus_curation"].fn(spark, SF_DIR)  # registers views
    from keenwa_spark.pipeline.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(spark.table("documents")).localCheckpoint(
        eager=True
    )
    for shape, self_loop in (("old(two-join)", False), ("new(self-loop)", True)):
        if which != "both" and which not in shape:
            continue
        print(shape, census(round_body(pairs, self_loop)))


if __name__ == "__main__":
    main()
