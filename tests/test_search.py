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
