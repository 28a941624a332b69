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


def test_hash_split_edges_cover_last_bucket():
    """Edges come from ROUNDED cumulative fractions: any fraction set
    summing to 1 must end exactly at _BUCKETS (float-truncated edges
    could stop at _BUCKETS - 1 and silently drop keys hashing to the
    final bucket), and decimal-round fractions must hit the round
    edges an oracle hardcodes."""
    from keenwa_spark.pipeline.sampling import _BUCKETS, _split_edges

    for splits in (
        {"a": 0.583, "b": 0.285, "c": 0.132},  # advisor's truncation repro
        {"train": 0.8, "val": 0.1, "test": 0.1},
        {"x": 0.7, "y": 0.3},
        {"only": 1.0},
    ):
        edges = _split_edges(splits)
        assert edges[0][1] == 0
        assert edges[-1][2] == _BUCKETS, (splits, edges)
        for (_, _, hi), (_, lo2, _) in zip(edges, edges[1:]):
            assert hi == lo2  # contiguous, disjoint
    assert [e[2] for e in _split_edges({"train": 0.8, "val": 0.1, "test": 0.1})] == [
        800000,
        900000,
        1000000,
    ]


def test_sampling_quote_safe(docs):
    """Quoted salts / split names / domain names must not break or
    alter the generated SQL."""
    from keenwa_spark.pipeline.sampling import mixture_sample

    n = hash_sample(docs, "doc_id", 0.5, salt="o'hare").count()
    assert 0 < n < 40
    out = hash_split(docs, "doc_id", {"tr'ain": 0.5, "te'st": 0.5}, salt="s'1")
    assert set(r.split for r in out.collect()) <= {"tr'ain", "te'st"}
    assert out.count() == 40
    mixed = mixture_sample(
        docs.withColumn("dom", F.lit("d'0")), "dom", {"d'0": 1.0}, "doc_id"
    )
    assert mixed.count() == 40


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


def test_quality_gates_flag_junk(spark):
    from keenwa_spark.pipeline.quality import drop_reason_stats, quality_gates

    # 40 distinct letter-only words: passes every gate (a repeated
    # sentence would fail g_repetition — that's the gate working)
    import itertools

    good = " ".join(
        "".join(p) for p in itertools.product("abcdefgh", repeat=2)
    )[: 40 * 3 - 1]
    rows = [
        (1, good),
        (2, "spam " * 60),  # repetition: distinct ratio 1/60
        (3, ("1234 " * 35) + "x"),  # digit-heavy
        (4, " ".join(f"http://x{i}.com" for i in range(31))),  # link farm / no alpha words ok but urls>5
        (5, good + " " + "a" * 50),  # 50-char junk token
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    g = {r.doc_id: r for r in quality_gates(df).collect()}
    assert g[1].keep
    assert not g[2].g_repetition and not g[2].keep
    assert not g[3].g_digits
    assert not g[4].g_urls
    assert not g[5].g_word_len
    stats = drop_reason_stats(quality_gates(df)).collect()[0]
    assert stats.kept == 1 and stats.total == 5
    assert stats.fail_g_repetition >= 1 and stats.fail_g_urls >= 1


def test_mixture_sample_rates_and_determinism(docs):
    from keenwa_spark.pipeline.sampling import mixture_sample

    d = docs.withColumn("domain", F.col("lang"))
    rates = {"en": 1.0, "de": 0.0}
    out = {r.doc_id for r in mixture_sample(d, "domain", rates, "doc_id").collect()}
    # rate-1.0 domain keeps everything, rate-0.0 domain drops everything
    assert out == {i for i in range(40) if i % 2 == 0}
    # reproducible
    out2 = {r.doc_id for r in mixture_sample(d, "domain", rates, "doc_id").collect()}
    assert out == out2


def test_mixture_sample_default_rate_and_subset(docs):
    from keenwa_spark.pipeline.sampling import hash_sample, mixture_sample

    d = docs.withColumn("domain", F.col("lang"))
    # unknown domains fall back to default_rate
    none_kept = mixture_sample(d, "domain", {"fr": 1.0}, "doc_id").count()
    assert none_kept == 0
    # a domain at rate r is exactly hash_sample(r) restricted to it:
    # same salt => same buckets => identical row set
    mixed = {
        r.doc_id
        for r in mixture_sample(d, "domain", {"en": 0.5}, "doc_id", salt="s0").collect()
    }
    plain = {
        r.doc_id
        for r in hash_sample(d.where("domain = 'en'"), "doc_id", 0.5, salt="s0").collect()
    }
    assert mixed == plain


def test_mixture_sample_rate_validation(docs):
    from keenwa_spark.pipeline.sampling import mixture_sample

    with pytest.raises(ValueError, match="rate"):
        mixture_sample(docs, "lang", {"en": 1.5}, "doc_id")
    with pytest.raises(ValueError, match="rate"):
        mixture_sample(docs, "lang", {"en": 0.5}, "doc_id", default_rate=-0.1)


def test_weighted_sample_probability_scales_with_weight(spark):
    from keenwa_spark.pipeline.sampling import weighted_bernoulli_sample

    rows = [(i, w) for i in range(2000) for w in [(i % 2) * 2000.0]]
    df = spark.createDataFrame(rows, "doc_id BIGINT, wt DOUBLE")
    kept = weighted_bernoulli_sample(df, "wt", 0.00025, "doc_id").collect()
    # weight 0 rows can never be kept; weight 2000 rows keep at p=0.5
    assert all(r.wt > 0 for r in kept)
    assert 350 <= len(kept) <= 650  # ~500 expected of 1000 eligible
    # deterministic
    again = weighted_bernoulli_sample(df, "wt", 0.00025, "doc_id").collect()
    assert {r.doc_id for r in kept} == {r.doc_id for r in again}


def test_weighted_sample_probability_caps_at_one(spark):
    from keenwa_spark.pipeline.sampling import weighted_bernoulli_sample

    df = spark.createDataFrame(
        [(i, 1e9) for i in range(50)], "doc_id BIGINT, wt DOUBLE"
    )
    # min(1, scale*w) == 1 -> everything kept
    assert weighted_bernoulli_sample(df, "wt", 1.0, "doc_id").count() == 50
    with pytest.raises(ValueError, match="scale"):
        weighted_bernoulli_sample(df, "wt", -1.0, "doc_id")
