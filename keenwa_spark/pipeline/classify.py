"""Token-profile text classification: a supervised, shuffle-light
classifier in the fastText/CCNet lineage (per-token class likelihoods
learned from labeled docs, per-doc aggregation at inference), built so
every step is EXACT integer arithmetic and therefore replayable on an
independent engine.

Why not full Naive Bayes log-likelihoods: summed ln() scores differ in
the last ulp across engines/libms, which this repo's oracle discipline
forbids (see pl_lm_surprisal / DSIR notes on rational scoring). The
majority-vote decision rule below keeps the same training statistics
(per-class token counts) and inference plan shape (token join +
per-doc aggregation) while every comparison is on integers:
- TRAIN: one (token, label) count aggregation over the labeled corpus;
  each token's vote goes to its count-argmax class (ties to the
  lexicographically first label — deterministic).
- INFER: tokens join the model (vocab-sized — broadcast when small,
  token-key shuffle when not), votes aggregate per doc, the doc takes
  the vote-argmax class (same tie-break). Docs with no in-vocabulary
  tokens abstain (NULL prediction).

Scale design (100 TB corpus): the model is a token-keyed DataFrame
that never collects to the driver; training is one aggregation + one
per-token window argmax over (token) groups — bounded by vocabulary,
not corpus; inference is one join + one doc aggregation. No Python
row path anywhere.

Beyond-reference surface (the reference optimizer has no executor;
SURVEY.md §2 additive-pipeline mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from keenwa_spark.pipeline.dedup import normalized_text


def _tokens(
    docs: DataFrame, text_col: str, keep: list[str]
) -> DataFrame:
    """(keep..., tok): one row per token occurrence, empty tokens
    dropped (normalization collapses whitespace first)."""
    return docs.select(
        *keep,
        F.explode(F.split(F.expr(normalized_text(text_col)), " ")).alias("tok"),
    ).where(F.col("tok") != "")


def token_class_model(
    train: DataFrame,
    label_col: str,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(tok, pred_label, n_train): each training token mapped to its
    count-argmax class. ``min_count`` drops rare tokens whose argmax is
    noise. One count aggregation + one per-token window argmax."""
    counts = (
        _tokens(train, text_col, [label_col])
        .groupBy("tok", label_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("tok").orderBy(
        F.desc("n"), F.asc(label_col)
    )
    return (
        counts.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .where(F.col("n") >= min_count)
        .select(
            "tok",
            F.col(label_col).alias("pred_label"),
            F.col("n").alias("n_train"),
        )
    )


def token_vote_classify(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, predicted, n_votes): per doc, the majority class over its
    in-vocabulary token occurrences (ties to the lexicographically
    first label). Docs with zero in-vocabulary tokens are ABSENT —
    left-join the result to keep them as NULL-prediction abstains."""
    votes = (
        _tokens(docs, text_col, [id_col])
        .join(model.select("tok", "pred_label"), "tok")
        .groupBy(id_col, "pred_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("n_votes"), F.asc("pred_label")
    )
    return (
        votes.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(id_col, F.col("pred_label").alias("predicted"), "n_votes")
    )


def classify_eval(
    docs: DataFrame,
    train_filter,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """Train on ``train_filter`` rows, classify the complement, report
    per test doc: (id, true label, predicted, correct). Abstains keep
    a NULL prediction and count as incorrect via null-safe equality."""
    model = token_class_model(
        docs.where(train_filter), label_col, text_col, min_count
    )
    test = docs.where(~train_filter)
    preds = token_vote_classify(test, model, text_col, id_col)
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
