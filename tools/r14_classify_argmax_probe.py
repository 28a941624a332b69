"""Interleaved A/B probe (guide §1): per-group top-1 argmax in
classify.py as a sort-based row_number window vs a min_by/max hash
aggregate. Measures the full pl_token_vote_classify composition with
the noop sink and asserts both shapes return identical rows.

Usage: python tools/r14_classify_argmax_probe.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from keenwa_spark.pipeline.classify import _tokens, token_class_model
from keenwa_spark.queries import load_all
from keenwa_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def model_minby(train, label_col, text_col="text", min_count=1):
    counts = (
        _tokens(train, text_col, [label_col])
        .groupBy("tok", label_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    order = F.struct((-F.col("n")).alias("nn"), F.col(label_col).alias("lb"))
    return (
        counts.groupBy("tok")
        .agg(
            F.min_by(F.col(label_col), order).alias("pred_label"),
            F.max("n").alias("n_train"),
        )
        .where(F.col("n_train") >= min_count)
        .select("tok", "pred_label", "n_train")
    )


def vote_minby(docs, model, text_col="text", id_col="doc_id"):
    votes = (
        _tokens(docs, text_col, [id_col])
        .join(model.select("tok", "pred_label"), "tok")
        .groupBy(id_col, "pred_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    order = F.struct(
        (-F.col("n_votes")).alias("nn"), F.col("pred_label").alias("lb")
    )
    return votes.groupBy(id_col).agg(
        F.min_by(F.col("pred_label"), order).alias("predicted"),
        F.max("n_votes").alias("n_votes"),
    )


def eval_minby(docs, train_filter, label_col="lang", text_col="text",
               id_col="doc_id", min_count=1):
    model = model_minby(docs.where(train_filter), label_col, text_col, min_count)
    test = docs.where(~train_filter)
    preds = vote_minby(test, model, text_col, id_col)
    return (
        test.select(id_col, label_col)
        .join(preds.select(id_col, "predicted"), id_col, "left")
        .select(
            id_col,
            label_col,
            "predicted",
            F.col("predicted").eqNullSafe(F.col(label_col)).alias("correct"),
        )
    )


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    registry = load_all()
    spark = get_spark("r14_classify_argmax_probe")
    sc = spark.sparkContext
    # register views + warmup via the declared query
    q = registry["pl_token_vote_classify"]
    q.fn(spark, SF_DIR).count()
    docs = spark.table("documents")
    train_filter = F.col("doc_id") % 3 != 0

    from keenwa_spark.pipeline.classify import classify_eval

    def run_window():
        noop(classify_eval(docs, train_filter, label_col="lang"))

    def run_minby():
        noop(eval_minby(docs, train_filter, label_col="lang"))

    # equality first (sorted collect of both)
    a = sorted(map(tuple, classify_eval(docs, train_filter, label_col="lang").collect()))
    b = sorted(map(tuple, eval_minby(docs, train_filter, label_col="lang").collect()))
    assert a == b, f"MISMATCH: {len(a)} vs {len(b)} rows"
    print(f"results identical: {len(a)} rows")

    best_w, best_m = float("inf"), float("inf")
    for i in range(runs):
        sc.setJobDescription(f"argmax probe window #{i}")
        t0 = time.time()
        run_window()
        best_w = min(best_w, time.time() - t0)
        sc.setJobDescription(f"argmax probe min_by #{i}")
        t0 = time.time()
        run_minby()
        best_m = min(best_m, time.time() - t0)
    print(f"window best-of-{runs}: {best_w:.3f}s")
    print(f"min_by best-of-{runs}: {best_m:.3f}s")


if __name__ == "__main__":
    main()
