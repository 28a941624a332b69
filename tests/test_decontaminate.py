"""Benchmark decontamination: semantics on hand-computable frames,
broadcast plan shape on the documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from keenwa_spark.pipeline.decontaminate import (
    benchmark_ngram_hashes,
    decontaminate,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            # contains the benchmark 3-gram "the quick fox" verbatim
            (1, "run the quick fox jumps again"),
            # same words, different order: no shared 3-gram
            (2, "fox quick the jumps run again"),
            # too short for any 3-gram
            (3, "hi there"),
            # benchmark phrase twice: distinct hits still counted once
            (4, "the quick fox and the quick fox"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def bench_set(spark):
    return spark.createDataFrame(
        [(100, "the quick fox jumps")], "doc_id long, text string"
    )


class TestDecontaminate:
    def test_flags_and_counts(self, corpus, bench_set):
        out = {
            r.doc_id: (r.n_hits, r.contaminated)
            for r in decontaminate(corpus, bench_set, n=3).collect()
        }
        # doc 1 shares "the quick fox" and "quick fox jumps"
        assert out[1] == (2, True)
        assert out[2] == (0, False)
        assert 3 not in out  # < n words: no n-grams, vacuously clean
        assert out[4] == (1, True)  # repeated phrase counted once (distinct)

    def test_min_hits_threshold(self, corpus, bench_set):
        out = {
            r.doc_id: r.contaminated
            for r in decontaminate(corpus, bench_set, n=3, min_hits=2).collect()
        }
        assert out[1] is True  # 2 distinct hits
        assert out[4] is False  # only 1

    def test_benchmark_index_is_distinct(self, spark):
        bench = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
        )
        # identical docs: the index must still hold each n-gram once
        assert benchmark_ngram_hashes(bench, n=3).count() == 2

    def test_benchmark_side_is_broadcast(self, views):
        docs = views.table("documents")
        plan = (
            decontaminate(
                docs.where(F.col("doc_id") % 97 != 0),
                docs.where(F.col("doc_id") % 97 == 0),
                n=4,
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan and "Cartesian" not in plan
