"""Unit tests for sampling, tf-idf, and quantization operators
(the round-3 additions to the LLM-pipeline layer)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from keenwa_spark.pipeline.quantization import quantize_int8, reconstruction_error
from keenwa_spark.pipeline.sampling import hash_sample, hash_split, stratified_sample
from keenwa_spark.pipeline.tfidf import top_terms


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"word{i % 7} filler text common", ["en", "de"][i % 2]) for i in range(40)]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")


def test_hash_sample_deterministic_and_salted(docs):
    a1 = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5).collect()}
    a2 = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5).collect()}
    b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5, salt="other").collect()}
    assert a1 == a2  # reproducible
    assert a1 != b  # independent draw per salt
    assert hash_sample(docs, "doc_id", 0.0).count() == 0
    assert hash_sample(docs, "doc_id", 1.0).count() == 40


def test_hash_sample_rate_validation(docs):
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 1.5)


def test_hash_split_disjoint_and_total(docs):
    out = hash_split(docs, "doc_id", {"train": 0.7, "test": 0.3}).collect()
    assert len(out) == 40  # fractions sum to 1 -> total
    by_id = {}
    for r in out:
        by_id.setdefault(r.doc_id, []).append(r.split)
    assert all(len(v) == 1 for v in by_id.values())  # disjoint
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"a": 0.8, "b": 0.4})


def test_stratified_sample_exact_counts(docs):
    out = stratified_sample(docs, "lang", 5, "doc_id")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 5, "de": 5}
    # a stratum smaller than n returns all of it
    small = stratified_sample(docs.filter("doc_id < 3"), "lang", 5, "doc_id")
    assert small.count() == 3


def test_top_terms_ranks_distinctive_term_first(spark):
    rows = [
        (1, "unique common common"),
        (2, "common common shared"),
        (3, "shared common common"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    top = top_terms(df, k=1, min_df=1).collect()
    best = {r.doc_id: r.term for r in top}
    # 'unique' (df=1) outranks 'common' (df=3) for doc 1 despite lower tf
    assert best[1] == "unique"


def test_quantize_roundtrip_error_bound(spark):
    rows = [(1, [1.0, -2.0, 0.5]), (2, [100.0, 0.0, -100.0]), (3, [0.0, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    q = {r.vid: r for r in quantize_int8(emb).collect()}
    assert all(-127 <= x <= 127 for r in q.values() for x in r.qvec)
    assert q[3].scale == 0.0 and q[3].qvec == [0, 0, 0]  # zero-vector guard
    # reconstruction error per element is at most scale/2
    err = {r.vid: r for r in reconstruction_error(emb).collect()}
    for vid, r in err.items():
        assert r.mse <= (r.scale / 2) ** 2 + 1e-12
