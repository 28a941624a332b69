"""Unit tests for the retrieval operators: lexical search, filtered
vector search, and RRF fusion determinism."""

from __future__ import annotations

import pytest


def test_search_topk_scoring_and_order(spark):
    from keenwa_spark.pipeline.tfidf import search_topk

    rows = [
        (1, "spark spark spark"),      # tf=3 on a rare-ish term
        (2, "spark table"),            # matches two terms
        (3, "table table table table"),# tf=4 on a common term
        (4, "nothing relevant here"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = search_topk(df, "spark table", k=10).collect()
    ids = [r.doc_id for r in out]
    assert 4 not in ids                      # no matched term -> absent
    assert set(ids) == {1, 2, 3}
    # doc 2 matched both terms
    matched = {r.doc_id: r.n_terms_matched for r in out}
    assert matched[2] == 2 and matched[1] == 1
    # N=4 docs; df(spark)=2 -> idf_r=(4-2+.5)/(2+.5)=1.0;
    # df(table)=2 -> 1.0. relevance: d1=3, d2=2, d3=4
    rel = {r.doc_id: r.relevance for r in out}
    assert rel[1] == pytest.approx(3.0) and rel[3] == pytest.approx(4.0)
    assert ids == [3, 1, 2]


def test_search_topk_empty_query_raises(spark):
    from keenwa_spark.pipeline.tfidf import search_topk

    df = spark.createDataFrame([(1, "x")], "doc_id BIGINT, text STRING")
    with pytest.raises(ValueError):
        search_topk(df, "   ")


def test_filtered_cosine_topk_respects_predicate(spark):
    from keenwa_spark.pipeline.similarity import filtered_cosine_topk

    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.9, 0.1], 1),   # closest, but label 1
        (2, [0.5, 0.5], 2),
        (3, [0.0, 1.0], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    out = filtered_cosine_topk(
        df, df.where("vec_id = 0"), "label = 2", k=2
    ).collect()
    assert [r.neighbor_id for r in out] == [2, 3]  # label-1 rows excluded


def test_semantic_dedup_flags_and_assignment(spark):
    """Engineered two-cluster fixture: assignment goes to the nearest
    centroid (cosine, smaller-cent-id tie-break), dup flags follow the
    greedy keep-lowest-id rule within clusters only — the cross-cluster
    near-identical pair must NOT flag."""
    from keenwa_spark.pipeline.similarity import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0]),    # cluster 10
        (1, [0.99, 0.01, 0.0]),  # near-dup of 0, same cluster -> dup
        (2, [0.0, 1.0, 0.0]),    # cluster 20
        (3, [0.0, 0.99, 0.01]),  # near-dup of 2, same cluster -> dup
        (4, [0.6, 0.0, 0.8]),    # cluster 10 (cos .6 vs 0), far -> kept
        (5, [0.7, 0.7, 0.0]),    # equidistant: tie-break -> cluster 10
    ]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    cents = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (20, [0.0, 1.0, 0.0])],
        "cent_id BIGINT, cv ARRAY<FLOAT>",
    )
    out = {
        r.vec_id: r
        for r in semantic_dedup(emb, cents, threshold=0.95).collect()
    }
    assert len(out) == 6
    assert {i: out[i].cluster_id for i in out} == {
        0: 10, 1: 10, 2: 20, 3: 20, 4: 10, 5: 10
    }
    assert {i: out[i].is_dup for i in out} == {
        0: False, 1: True, 2: False, 3: True, 4: False, 5: False
    }
    assert out[0].cos_to_centroid == pytest.approx(1.0)
    # threshold low enough to chain 5 behind 0 (cos(0,5)=.7/ sqrt(.98))
    out2 = {
        r.vec_id: r.is_dup
        for r in semantic_dedup(emb, cents, threshold=0.7).collect()
    }
    assert out2[5] is True and out2[0] is False


def test_bm25_topk_saturation_and_length_norm(spark):
    """BM25 vs plain tf*idf: tf saturates (a 4x term count does not
    score 4x) and above-average-length docs are penalized. Expected
    values recomputed in-test with the documented formula, including
    the NULL-text denominator convention (NULL dl out of sum_dl, row
    still in n_rows)."""
    from keenwa_spark.pipeline.tfidf import bm25_topk

    rows = [
        (1, "spark spark spark spark"),  # tf=4, dl=4
        (2, "spark x"),                  # tf=1, dl=2
        (3, "y z w q"),                  # no match, dl=4
        (4, None),                       # NULL text
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = bm25_topk(df, "spark", k=10).collect()
    assert [r.doc_id for r in out] == [1, 2]

    n_docs, sum_dl, n_rows, df_t = 4, 10, 4, 2
    avgdl = sum_dl / n_rows
    idf = max((n_docs - df_t + 0.5) / (df_t + 0.5), 0.0)

    def score(tf, dl):
        return idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))

    rel = {r.doc_id: r.relevance for r in out}
    assert rel[1] == pytest.approx(score(4, 4))
    assert rel[2] == pytest.approx(score(1, 2))
    # saturation: 4x the term frequency buys well under 4x the score
    assert rel[1] / rel[2] < 2.5
