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


class TestBloom:
    """Distributed Bloom filter: build/probe semantics and the
    zero-false-negative contract (pipeline/bloom.py)."""

    M, K = 1024, 4

    @pytest.fixture(scope="class")
    def key_hashes(self, spark):
        from keenwa_spark.pipeline.hashing import spark_hash64

        keys = spark.createDataFrame(
            [(f"key{i}",) for i in range(40)], "s string"
        )
        return keys.select(F.expr(spark_hash64("s")).alias("h"))

    @pytest.fixture(scope="class")
    def probe_hashes(self, spark):
        from keenwa_spark.pipeline.hashing import spark_hash64

        # 40 members + 200 non-members
        probes = spark.createDataFrame(
            [(f"key{i}",) for i in range(40)]
            + [(f"other{i}",) for i in range(200)],
            "s string",
        )
        return probes.select(
            "s", F.expr(spark_hash64("s")).alias("h")
        )

    def test_no_false_negatives(self, key_hashes, probe_hashes):
        from keenwa_spark.pipeline.bloom import (
            bloom_build,
            bloom_dense_words,
            bloom_probe_dense,
        )

        words = bloom_dense_words(
            bloom_build(key_hashes, self.M, self.K), self.M
        )
        out = {
            r.s: r.member
            for r in bloom_probe_dense(
                probe_hashes, words, self.M, self.K
            ).collect()
        }
        # every true member is flagged — the Bloom guarantee
        assert all(out[f"key{i}"] for i in range(40))
        # filter is not saturated: most non-members are rejected
        fps = sum(out[f"other{i}"] for i in range(200))
        assert fps < 40

    def test_dense_and_join_probes_agree(self, key_hashes, probe_hashes):
        from keenwa_spark.pipeline.bloom import (
            bloom_build,
            bloom_dense_words,
            bloom_probe_dense,
            bloom_probe_join,
        )

        bloom = bloom_build(key_hashes, self.M, self.K)
        words = bloom_dense_words(bloom, self.M)
        dense = {
            r.s: r.member
            for r in bloom_probe_dense(
                probe_hashes, words, self.M, self.K
            ).collect()
        }
        joined = {
            r.s: r.member
            for r in bloom_probe_join(
                probe_hashes, bloom, self.M, self.K, key_cols=("s", "h")
            ).select("s", "member").collect()
        }
        assert dense == joined

    def test_build_is_mergeable(self, spark, key_hashes):
        from keenwa_spark.pipeline.bloom import bloom_build

        # bit_or-merging two half builds == one full build
        half1 = bloom_build(key_hashes.limit(20), self.M, self.K)
        half2 = bloom_build(
            key_hashes.subtract(key_hashes.limit(20)), self.M, self.K
        )
        merged = {
            r.word_idx: r.word_val
            for r in half1.unionAll(half2)
            .groupBy("word_idx")
            .agg(F.expr("bit_or(word_val)").alias("word_val"))
            .collect()
        }
        full = {
            r.word_idx: r.word_val
            for r in bloom_build(key_hashes, self.M, self.K).collect()
        }
        assert merged == full

    def test_rejects_bad_m(self):
        from keenwa_spark.pipeline.bloom import _position_exprs

        with pytest.raises(ValueError):
            _position_exprs("h", 1000, 4)
        with pytest.raises(ValueError):
            _position_exprs("h", 1024, 99)

    def test_probe_plan_is_join_free(self, views):
        from keenwa_spark.pipeline.bloom import bloom_decontaminate

        docs = views.table("documents")
        plan = (
            bloom_decontaminate(
                docs.where(F.col("doc_id") % 97 != 0),
                docs.where(F.col("doc_id") % 97 == 0),
                n=4,
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # dense probe: the corpus side sees NO join of any kind
        assert "Join" not in plan and "Cartesian" not in plan

    def test_superset_of_exact_decontaminate(self, views):
        from keenwa_spark.pipeline.bloom import bloom_decontaminate

        docs = views.table("documents")
        train = docs.where(F.col("doc_id") % 97 != 0)
        bench = docs.where(F.col("doc_id") % 97 == 0)
        exact = {
            r.doc_id: r.n_hits
            for r in decontaminate(train, bench, n=4).collect()
        }
        bloomed = {
            r.doc_id: r.n_flagged
            for r in bloom_decontaminate(train, bench, n=4).collect()
        }
        assert set(exact) == set(bloomed)
        # zero false negatives: bloom flags at least every exact hit
        assert all(bloomed[d] >= exact[d] for d in exact)


class TestDecontaminationPanel:
    """The three-arm panel agrees with its arms and with itself
    (queries/pipeline.py pl_decontamination_panel)."""

    def test_bloom_dominates_exact_and_verdict_is_or(self, views):
        from keenwa_spark.queries import REGISTRY
        import keenwa_spark.queries.pipeline  # noqa: F401
        import tests.conftest as c

        rows = REGISTRY["pl_decontamination_panel"].fn(views, c.SF_DIR).collect()
        assert rows
        for r in rows:
            # zero false negatives: the Bloom arm flags every exact hit
            assert r.n_flagged >= r.n_hits
            assert r.any_contaminated == (
                r.n_hits >= 1 or r.n_flagged >= 1 or r.n_band_hits >= 1
            )
