"""Round-12 100x scale probes for the TEXT-MODEL TRAINING loops
(VERDICT r11 item 3): bpe_train and the token-vote classifier carried
correctness evidence but no 100x wall/driver-state measurement. This
stages the same REAL 100x documents corpus as tools/r10_scale100_probe.py
(id-shifted unions written to /tmp parquet, read back fresh) and probes
at 1x / 10x / 100x (sf0.1 documents: ~20k / ~200k / ~2M docs).

Claims under test:

1. **bpe_train** (pipeline/bpe.py:100): merges are learned on the WORD
   FREQUENCY table, so the only corpus-sized job is the initial
   word count; every merge round is vocab-bound (pair counts over
   distinct words) plus a 1-row driver argmax. The 100x corpus is
   copies of the same documents (plus a tiny c0..c99 marker vocab),
   so the vocab is ~FLAT in the factor and the claim predicts:
   word_freqs wall ~linear in corpus, PER-ROUND wall ~flat, driver
   state == 1 collected row per round, per-round Spark job count
   constant. The probe measures all four (job counts via a per-round
   job group on the status tracker; the word-frequency table row
   count IS the claimed state bound — measured, not asserted).

2. **token_class_model + token_vote_classify** (pipeline/classify.py):
   training is ONE (token, label) count aggregation + a per-token
   window argmax — bounded by vocabulary, never collected to the
   driver; inference is one model join + one per-doc aggregation.
   Expect: model rows ~flat (vocab-bound), train wall ~linear in the
   token stream, inference wall ~linear in docs, plan shape constant,
   zero driver state.

Prints SCALE.md-ready rows. Run SOLO (wall-clock rows go into
SCALE.md):
    python tools/r12_text_train_scale_probe.py [bpe|vote ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from r10_scale100_probe import _plan_counts, stage_documents  # noqa: E402

FACTORS = (1, 10, 100)


def _jobs_in_group(spark, group: str, fn):
    """Run fn() under a job group; returns (result, n_jobs, wall)."""
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    t0 = time.time()
    out = fn()
    wall = time.time() - t0
    sc.setJobGroup("", "")
    jobs = spark._jsc.sc().statusTracker().getJobIdsForGroup(group)
    return out, len(jobs), wall


def probe_bpe(spark) -> None:
    from keenwa_spark.pipeline.bpe import (_initial_encoding, _merge,
                                           _pair_counts, word_freqs)

    print("## bpe_train 1x/10x/100x (instrumented copy of the "
          "bpe.py:100 loop — same ops, per-round measurement)")
    # JIT/codegen warmup so the 1x row isn't first-run-contaminated
    warm = spark.read.parquet(stage_documents(spark, 1))
    word_freqs(warm).count()
    _pair_counts(_initial_encoding(word_freqs(warm))).count()
    for factor in FACTORS:
        path = stage_documents(spark, factor)
        docs = spark.read.parquet(path)
        t0 = time.time()
        freqs = word_freqs(docs).localCheckpoint(eager=True)
        vocab_rows = freqs.count()
        w_wall = time.time() - t0
        enc = _initial_encoding(freqs).localCheckpoint(eager=False)
        rounds = []
        for rnd in range(1, 5):
            def _one_round():
                return (_pair_counts(enc)
                        .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
                        .limit(1).collect())
            best, n_jobs, wall = _jobs_in_group(
                spark, f"bpe_{factor}x_r{rnd}", _one_round)
            if not best:
                break
            l, r = best[0]["l"], best[0]["r"]
            rounds.append((rnd, l + r, int(best[0]["n"]), wall, n_jobs))
            enc = _merge(enc, l, r).localCheckpoint(eager=False)
        per_round = ", ".join(
            f"r{rnd}:{m}({n}) {w:.2f}s/{j}j" for rnd, m, n, w, j in rounds)
        print(f"bpe {factor:>3}x: word_freqs {w_wall:6.2f}s, "
              f"vocab(word-freq state) {vocab_rows} rows, "
              f"driver state 1 row/round; rounds: {per_round}",
              flush=True)


def probe_vote(spark) -> None:
    from keenwa_spark.pipeline.classify import (token_class_model,
                                                token_vote_classify)

    print("## token-vote classifier 1x/10x/100x")
    warm = spark.read.parquet(stage_documents(spark, 1))
    token_class_model(warm.where("doc_id % 10 < 8"), "lang").count()
    for factor in FACTORS:
        path = stage_documents(spark, factor)
        docs = spark.read.parquet(path)
        train = docs.where("doc_id % 10 < 8")
        test = docs.where("doc_id % 10 >= 8")

        def _fit():
            m = token_class_model(train, "lang").localCheckpoint(eager=True)
            return m, m.count()
        (model, model_rows), fit_jobs, fit_wall = _jobs_in_group(
            spark, f"vote_fit_{factor}x", _fit)

        def _infer():
            return token_vote_classify(test, model).count()
        n_pred, inf_jobs, inf_wall = _jobs_in_group(
            spark, f"vote_inf_{factor}x", _infer)
        plan = _plan_counts(token_vote_classify(test, model))
        print(f"vote {factor:>3}x: fit {fit_wall:6.2f}s/{fit_jobs}j "
              f"model {model_rows} rows (vocab-bound, never collected); "
              f"infer {inf_wall:6.2f}s/{inf_jobs}j preds {n_pred}; {plan}",
              flush=True)


def main() -> None:
    from keenwa_spark.session import get_spark

    spark = get_spark("r12_text_train_scale")
    which = set(sys.argv[1:]) or {"bpe", "vote"}
    if "bpe" in which:
        probe_bpe(spark)
    if "vote" in which:
        probe_vote(spark)


if __name__ == "__main__":
    main()
