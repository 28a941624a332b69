"""Round-10 (session 2) 100x scale probes for the new portable-sketch
operators, on the same staged corpora as tools/r10_scale100_probe.py:

1. **bloom_decontaminate** (pipeline/bloom.py): documents 5k -> 50k ->
   500k docs. The claim: the filter is a FIXED-size bitmap whatever
   the corpus size (here 2^20 bits = 32k packed words, sized to the
   benchmark side per the module contract), the corpus-side probe is a
   pure projection (zero joins), and the only shuffle is the per-doc
   aggregate — wall grows ~linearly, driver state is the constant
   word array. Recorded: wall, rows, filter words, plan counts.

2. **cms_build + cms_estimate** (pipeline/sketches.py): the corpus
   word stream, ~300k -> ~30M token occurrences. The claim: sketch
   state is <= d*w rows at ANY stream size (mergeable bit of the
   design), so the build is one map-side-combinable aggregation and
   the estimate join is against a constant-size broadcast side.
   Recorded: wall, sketch rows, estimate rows, plan counts.

Run: python tools/r10b_sketch_scale_probe.py [bloom cms]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from pyspark.sql import functions as F  # noqa: E402

from r10_scale100_probe import (  # noqa: E402
    _plan_counts,
    _time,
    stage_documents,
)


def probe_bloom(spark) -> None:
    from keenwa_spark.pipeline.bloom import bloom_decontaminate

    print(
        "## bloom_decontaminate (1x/10x/100x = 5k/50k/500k docs; "
        "m=2^20 bits, k=4)"
    )
    for factor in (1, 10, 100):
        path = stage_documents(spark, factor)
        runs = 3 if factor < 100 else 2

        def build(path=path):
            docs = spark.read.parquet(path)
            return bloom_decontaminate(
                docs.where(F.col("doc_id") % 97 != 0),
                docs.where(F.col("doc_id") % 97 == 0),
                n=4,
                m_bits=1 << 20,
            )

        out = build()
        wall, n = _time(build, runs)
        print(
            f"{factor}x: wall {wall:.2f}s rows {n} "
            f"driver_state={(1 << 20) // 32} words [{_plan_counts(out)}]"
        )


def probe_cms(spark) -> None:
    from keenwa_spark.pipeline.dedup import normalized_text
    from keenwa_spark.pipeline.hashing import spark_hash64
    from keenwa_spark.pipeline.sketches import cms_build, cms_estimate

    print("## cms_build + top-20 cms_estimate (1x/10x/100x token stream)")
    d, w = 4, 512
    for factor in (1, 10, 100):
        path = stage_documents(spark, factor)
        runs = 3 if factor < 100 else 2

        def build(path=path):
            docs = spark.read.parquet(path)
            hashed = (
                docs.select(
                    F.explode(
                        F.split(F.expr(normalized_text("text")), " ")
                    ).alias("tok")
                )
                .where(F.col("tok") != "")
                .select("tok", F.expr(spark_hash64("tok")).alias("h"))
            )
            sketch = cms_build(hashed.select("h"), "h", d=d, w=w)
            top = (
                hashed.groupBy("tok", "h")
                .agg(F.count(F.lit(1)).alias("true_cnt"))
                .orderBy(F.desc("true_cnt"), F.asc("tok"))
                .limit(20)
            )
            return cms_estimate(top, sketch, "h", key_cols=("tok", "true_cnt"), d=d, w=w)

        out = build()
        t0 = time.time()
        sketch_rows = cms_build(
            spark.read.parquet(path)
            .select(
                F.explode(F.split(F.expr(normalized_text("text")), " ")).alias(
                    "tok"
                )
            )
            .where(F.col("tok") != "")
            .select(F.expr(spark_hash64("tok")).alias("h")),
            "h",
            d=d,
            w=w,
        ).count()
        build_wall = time.time() - t0
        wall, n = _time(build, runs)
        print(
            f"{factor}x: e2e wall {wall:.2f}s (build-only {build_wall:.2f}s) "
            f"estimates {n} sketch_rows {sketch_rows} (cap {d * w}) "
            f"[{_plan_counts(out)}]"
        )


def probe_vote(spark) -> None:
    """Token-vote classifier: train once on the 1x slice, then classify
    1x/10x/100x corpora — the model is vocab-bounded, inference is one
    token join + one doc agg, both corpus-linear."""
    from pyspark.sql import functions as F

    from keenwa_spark.pipeline.classify import token_class_model, token_vote_classify

    print("## token_vote_classify (train on 1x, infer 1x/10x/100x docs)")
    model = token_class_model(
        spark.read.parquet(stage_documents(spark, 1)), "lang"
    ).localCheckpoint()
    n_model = model.count()
    for factor in (1, 10, 100):
        path = stage_documents(spark, factor)
        runs = 3 if factor < 100 else 2

        def build(path=path):
            return token_vote_classify(
                spark.read.parquet(path), model
            )

        out = build()
        wall, n = _time(build, runs)
        print(
            f"{factor}x: wall {wall:.2f}s rows {n} model_rows {n_model} "
            f"[{_plan_counts(out)}]"
        )


def main() -> None:
    from keenwa_spark.session import get_spark

    spark = get_spark("r10b_sketch_scale_probe")
    probes = sys.argv[1:] or ["bloom", "cms", "vote"]
    for p in probes:
        {"bloom": probe_bloom, "cms": probe_cms, "vote": probe_vote}[p](spark)


if __name__ == "__main__":
    main()
