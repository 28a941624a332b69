"""r14 CC observe-fusion A/B: committed shape vs the r13 lazy+collect
shape: job counts per full CC run and interleaved best-of-5 wall at
sf0.1, plus end-to-end pl_corpus_curation wall."""
import os, sys, time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from keenwa_spark.queries import load_all
from keenwa_spark.session import get_spark
from keenwa_spark.pipeline.clustering import connected_components as cc_new

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

registry = load_all()
spark = get_spark("cc_ab_final")
sc = spark.sparkContext
registry["pl_corpus_curation"].fn(spark, SF_DIR)


def cc_r13(pairs, max_rounds=25):
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .union(pairs.select(F.col("id_a").alias("src"), F.col("id_a").alias("dst")))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_b").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("label"))
        .localCheckpoint(eager=False)
    )

    def _label_sum(frame: DataFrame):
        return frame.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0].s

    prev_sum = _label_sum(labels)
    for _ in range(max_rounds):
        hopped = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("label"))
        )
        jumped = (
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
        labels = jumped.localCheckpoint(eager=False)
        new_sum = _label_sum(labels)
        if new_sum == prev_sum:
            return labels.select(
                F.col("node").alias("doc_id"), F.col("label").alias("component")
            )
        prev_sum = new_sum
    raise RuntimeError("no converge")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


from keenwa_spark.pipeline.dedup import minhash_lsh_pairs

pairs = minhash_lsh_pairs(spark.table("documents")).localCheckpoint(eager=True)

# equality of the actual implementation
a = sorted(cc_r13(pairs).collect())
b = sorted(cc_new(pairs).collect())
print("equal:", a == b, "n:", len(a))

# job counts
tracker = sc.statusTracker()
for label, fn in (("r13", cc_r13), ("r14", cc_new)):
    g = f"jobs_{label}"
    sc.setJobGroup(g, g)
    noop(fn(pairs))
    print(f"{label}: {len(tracker.getJobIdsForGroup(g))} jobs per CC run")
sc.setJobGroup("ab", "ab")

# interleaved best-of-5
best = {"r13": 9e9, "r14": 9e9}
for i in range(5):
    for label, fn in (("r13", cc_r13), ("r14", cc_new)):
        t0 = time.time()
        noop(fn(pairs))
        best[label] = min(best[label], time.time() - t0)
print("CC interleaved best-of-5:", {k: round(v, 3) for k, v in best.items()})

# end-to-end corpus_curation best-of-5 (current code)
bestq = 9e9
for i in range(5):
    t0 = time.time()
    noop(registry["pl_corpus_curation"].fn(spark, SF_DIR))
    bestq = min(bestq, time.time() - t0)
print("pl_corpus_curation end-to-end best-of-5 (r14 code):", round(bestq, 3))
spark.stop()
