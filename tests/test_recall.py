"""ANN approximation-quality gate (judge round-3 item 4): recall@k of
the LSH and IVF operators against exact cosine_topk ground truth.

The oracle checks prove these operators DETERMINISTIC; these tests pin
their QUALITY. Data and algorithms are fully deterministic, so recall
is a fixed number per SF_DIR — floors carry a safety margin anyway
(measured at sf0.001: lsh(4,mp)=0.47, ivf(8,2)=0.58, ivf(8,4)=0.78;
full sweep in SCALE.md / tools/ann_recall.py).
"""

from __future__ import annotations

import pytest

K = 5
N_QUERIES = 25


@pytest.fixture(scope="module")
def emb(views):
    return views.table("embeddings")


@pytest.fixture(scope="module")
def truth(emb):
    from keenwa_spark.pipeline.similarity import cosine_topk

    return cosine_topk(
        emb, emb.filter(f"vec_id < {N_QUERIES}"), k=K
    ).localCheckpoint(eager=True)


def test_multiprobe_lifts_lsh_recall(emb, truth):
    from keenwa_spark.pipeline.recall import recall_at_k
    from keenwa_spark.pipeline.similarity import lsh_bucket_topk

    queries = emb.filter(f"vec_id < {N_QUERIES}")
    for bits in (4, 8):
        single = recall_at_k(
            lsh_bucket_topk(emb, queries, k=K, bits=bits, multiprobe=0), truth
        )
        multi = recall_at_k(
            lsh_bucket_topk(emb, queries, k=K, bits=bits, multiprobe=1), truth
        )
        assert multi >= 2 * single, (bits, single, multi)
    assert multi > 0  # bits=8 multiprobe recovers something even here


def test_lsh_multiprobe_recall_floor(emb, truth):
    from keenwa_spark.pipeline.recall import recall_at_k
    from keenwa_spark.pipeline.similarity import lsh_bucket_topk

    r = recall_at_k(
        lsh_bucket_topk(emb, emb.filter(f"vec_id < {N_QUERIES}"), k=K, bits=4, multiprobe=1),
        truth,
    )
    assert r >= 0.35, r


def test_ivf_recall_monotone_in_nprobe_with_floor(emb, truth):
    from keenwa_spark.pipeline.ivf import ivf_search
    from keenwa_spark.pipeline.recall import recall_at_k

    queries = emb.filter(f"vec_id < {N_QUERIES}")
    recalls = [
        recall_at_k(ivf_search(emb, queries, k_cells=8, nprobe=p, k=K), truth)
        for p in (1, 2, 4)
    ]
    assert recalls == sorted(recalls), recalls  # more probes, never worse
    assert recalls[1] >= 0.45, recalls  # documented default nprobe=2
    assert recalls[2] >= 0.65, recalls


def test_exact_topk_perfect_recall(emb, truth):
    """The harness itself: exact-vs-exact must be 1.0."""
    from keenwa_spark.pipeline.recall import recall_at_k

    assert recall_at_k(truth, truth) == 1.0


class TestClusteredFixture:
    """Recall on the realistic regime (judge round-4 item 3): the
    deterministic mixture-of-Gaussians corpus (pipeline/fixtures.py)
    with topic-like cluster structure. Floors sit under the measured
    values (CLUSTERED=1 tools/ann_recall.py, tables in SCALE.md):
    LSH bits=8 multiprobe 0.744, IVF K=8 nprobe=1 1.000."""

    @pytest.fixture(scope="class")
    def cemb(self, spark):
        from keenwa_spark.pipeline.fixtures import make_clustered_embeddings

        return make_clustered_embeddings(spark).localCheckpoint(eager=True)

    @pytest.fixture(scope="class")
    def ctruth(self, cemb):
        from keenwa_spark.pipeline.similarity import cosine_topk

        return cosine_topk(
            cemb, cemb.filter(f"vec_id < {N_QUERIES}"), k=K
        ).localCheckpoint(eager=True)

    def test_lsh_default_multiprobe_floor(self, cemb, ctruth):
        from keenwa_spark.pipeline.recall import recall_at_k
        from keenwa_spark.pipeline.similarity import lsh_bucket_topk

        # shipped defaults (bits=8, multiprobe=1) — measured 0.744
        r = recall_at_k(
            lsh_bucket_topk(cemb, cemb.filter(f"vec_id < {N_QUERIES}"), k=K),
            ctruth,
        )
        assert r >= 0.6, r

    def test_ivf_single_probe_floor(self, cemb, ctruth):
        from keenwa_spark.pipeline.ivf import ivf_search
        from keenwa_spark.pipeline.recall import recall_at_k

        # clustered data matches IVF's model — measured 1.000 at
        # nprobe=1; floor leaves margin for query-slice variation
        r = recall_at_k(
            ivf_search(
                cemb, cemb.filter(f"vec_id < {N_QUERIES}"),
                k_cells=8, nprobe=1, k=K,
            ),
            ctruth,
        )
        assert r >= 0.9, r


class TestDedupRecall:
    """Measured LSH near-dup recall vs exact n-gram Jaccard truth on
    the controlled-variant corpus (tools/dedup_recall.py is the full
    sweep; these floors pin the shipped defaults). Theory for k=12:
    P(candidate) = 1 - (1 - J^(12/b))^b — the measured points track it
    within a few points (e.g. J~0.74 at b=4 -> 0.875 predicted)."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        from keenwa_spark.pipeline.fixtures import make_near_dup_corpus

        return make_near_dup_corpus(spark).localCheckpoint()

    def _truth(self, corpus, tau):
        from keenwa_spark.pipeline.dedup import ngram_jaccard_pairs

        return {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(corpus, threshold=tau).collect()
        }

    def test_high_jaccard_recall_floor(self, corpus):
        from keenwa_spark.pipeline.dedup import minhash_lsh_pairs

        truth = self._truth(corpus, 0.9)
        assert len(truth) >= 50  # the fixture provides a J>=0.9 tier
        cand = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(corpus, bands=4).collect()
        }
        recall = len(truth & cand) / len(truth)
        assert recall >= 0.95, recall  # measured 1.000

    def test_mid_jaccard_recall_floor_and_band_tradeoff(self, corpus):
        from keenwa_spark.pipeline.dedup import minhash_lsh_pairs

        truth = self._truth(corpus, 0.7)
        c4 = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(corpus, bands=4).collect()
        }
        c6 = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(corpus, bands=6).collect()
        }
        r4 = len(truth & c4) / len(truth)
        r6 = len(truth & c6) / len(truth)
        assert r4 >= 0.8, r4   # measured 0.922
        assert r6 >= 0.95, r6  # measured 1.000 — more bands = higher recall
        assert len(c6) >= len(c4)  # ...bought with more candidates

    def test_verified_pairs_are_exactly_truth_within_candidates(self, corpus):
        """Verification precision is 1.0 BY CONSTRUCTION: the verified
        set must equal truth ∩ candidates exactly."""
        from keenwa_spark.pipeline.dedup import (
            lsh_verified_pairs,
            minhash_lsh_pairs,
        )

        truth = self._truth(corpus, 0.7)
        cand = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(corpus, bands=4).collect()
        }
        ver = {
            (r["id_a"], r["id_b"])
            for r in lsh_verified_pairs(corpus, threshold=0.7, bands=4).collect()
        }
        assert ver == (truth & cand)


class TestPqRecall:
    """PQ/ADC quality (pipeline/pq.py) vs exact squared-L2 truth (PQ
    ranks by L2, so cosine truth would measure the wrong thing).
    Measured on the clustered fixture: unrefined recall@5 rises with
    codebook resolution (m=4,k=8: 0.048 -> m=8,k=64: 0.32 — ADC
    distances within a cluster collapse to few values), and exact
    refinement over the ADC top-50 shortlist recovers 0.896."""

    @pytest.fixture(scope="class")
    def cemb(self, spark):
        from keenwa_spark.pipeline.fixtures import make_clustered_embeddings

        return make_clustered_embeddings(spark).localCheckpoint(eager=True)

    @pytest.fixture(scope="class")
    def l2_truth(self, cemb):
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from keenwa_spark.pipeline.ivf import _as_vecs

        q = _as_vecs(cemb.filter(f"vec_id < {N_QUERIES}"), "vec_id", "embedding").select(
            F.col("vid").alias("query_id"), F.col("v").alias("qv")
        )
        c = _as_vecs(cemb, "vec_id", "embedding").select(
            F.col("vid").alias("neighbor_id"), F.col("v").alias("cv")
        )
        sq = (
            "aggregate(zip_with(cv, qv, (x, y) -> (x - y) * (x - y)), "
            "CAST(0 AS DOUBLE), (a, z) -> a + z)"
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("d").asc(), F.col("neighbor_id")
        )
        return (
            c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
            .withColumn("d", F.expr(sq))
            .withColumn("rnk", F.row_number().over(w))
            .filter(f"rnk <= {K}")
            .select("query_id", "neighbor_id")
            .localCheckpoint(eager=True)
        )

    def _recall(self, got, l2_truth):
        t = {(r.query_id, r.neighbor_id) for r in l2_truth.collect()}
        g = {(r.query_id, r.neighbor_id) for r in got.collect()}
        return len(g & t) / len(t)

    def test_unrefined_recall_rises_with_codebook_resolution(self, cemb, l2_truth):
        from keenwa_spark.pipeline.pq import pq_search

        queries = cemb.filter(f"vec_id < {N_QUERIES}")
        coarse = self._recall(
            pq_search(cemb, queries, m=4, k_codes=8, topk=K), l2_truth
        )
        fine = self._recall(
            pq_search(cemb, queries, m=8, k_codes=64, topk=K), l2_truth
        )
        assert fine > coarse, (coarse, fine)
        assert fine >= 0.25, fine  # measured 0.32, margin for slices

    def test_refined_recall_floor(self, cemb, l2_truth):
        from keenwa_spark.pipeline.pq import pq_search

        r = self._recall(
            pq_search(
                cemb, cemb.filter(f"vec_id < {N_QUERIES}"),
                m=8, k_codes=64, topk=K, refine=50,
            ),
            l2_truth,
        )
        assert r >= 0.8, r  # measured 0.896

    def test_validation_and_dim_divisibility(self, cemb):
        from keenwa_spark.pipeline.pq import pq_search, pq_train

        with pytest.raises(ValueError, match="must divide"):
            pq_train(cemb, m=7)
        with pytest.raises(ValueError, match="refine"):
            pq_search(cemb, cemb.filter("vec_id < 2"), topk=5, refine=3)


class TestIvfPqRecall:
    """IVF-PQ residual composition (pipeline/pq.py ivfpq_search) vs
    exact squared-L2 truth. The whole stack is deterministic, so every
    number here reproduces exactly.

    Measured on the clustered fixture (k_cells=20, nprobe=2, the
    engine's 2 deterministic iterations): residual codebooks lift
    unrefined recall@5 over plain PQ at EVERY bit budget —
    m=8/k=64: 0.32 -> 0.40, m=16/k=64: 0.30 -> 0.51. The 0.40 at
    m=8/k=64 is the fixture's information-theoretic ceiling for 48
    bits, not a training artifact: tools/ivfpq_ceiling.py shows
    unrestricted-quality k-means tops out at 0.35-0.40 there (the
    residuals are isotropic, so no rotation recovers it), while one
    step up the bit budget (m=16, 1.5 bits/dim) clears 0.5."""

    @pytest.fixture(scope="class")
    def cemb(self, spark):
        from keenwa_spark.pipeline.fixtures import make_clustered_embeddings

        return make_clustered_embeddings(spark).localCheckpoint(eager=True)

    @pytest.fixture(scope="class")
    def l2_truth(self, cemb):
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from keenwa_spark.pipeline.ivf import _as_vecs

        q = _as_vecs(
            cemb.filter(f"vec_id < {N_QUERIES}"), "vec_id", "embedding"
        ).select(F.col("vid").alias("query_id"), F.col("v").alias("qv"))
        c = _as_vecs(cemb, "vec_id", "embedding").select(
            F.col("vid").alias("neighbor_id"), F.col("v").alias("cv")
        )
        sq = (
            "aggregate(zip_with(cv, qv, (x, y) -> (x - y) * (x - y)), "
            "CAST(0 AS DOUBLE), (a, z) -> a + z)"
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("d").asc(), F.col("neighbor_id")
        )
        return (
            c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
            .withColumn("d", F.expr(sq))
            .withColumn("rnk", F.row_number().over(w))
            .filter(f"rnk <= {K}")
            .select("query_id", "neighbor_id")
            .localCheckpoint(eager=True)
        )

    def _recall(self, got, l2_truth):
        t = {(r.query_id, r.neighbor_id) for r in l2_truth.collect()}
        g = {(r.query_id, r.neighbor_id) for r in got.collect()}
        return len(g & t) / len(t)

    def test_residual_beats_plain_pq_and_clears_half(self, cemb, l2_truth):
        from keenwa_spark.pipeline.pq import ivfpq_search, pq_search

        queries = cemb.filter(f"vec_id < {N_QUERIES}")
        plain = self._recall(
            pq_search(cemb, queries, m=16, k_codes=64, topk=K), l2_truth
        )
        composed = self._recall(
            ivfpq_search(
                cemb, queries, k_cells=20, nprobe=2, m=16, k_codes=64, topk=K
            ),
            l2_truth,
        )
        assert composed >= 0.5, composed  # measured 0.510 (deterministic)
        assert composed > plain, (plain, composed)  # measured 0.300

    def test_residual_lifts_the_verdict_config(self, cemb, l2_truth):
        """m=8/k=64: the ceiling-bound config still must BEAT plain PQ."""
        from keenwa_spark.pipeline.pq import ivfpq_search, pq_search

        queries = cemb.filter(f"vec_id < {N_QUERIES}")
        plain = self._recall(
            pq_search(cemb, queries, m=8, k_codes=64, topk=K), l2_truth
        )
        composed = self._recall(
            ivfpq_search(
                cemb, queries, k_cells=20, nprobe=2, m=8, k_codes=64, topk=K
            ),
            l2_truth,
        )
        assert composed >= 0.37, composed  # measured 0.376; ceiling ~0.40
        assert composed > plain, (plain, composed)

    def test_refine_validation(self, cemb):
        from keenwa_spark.pipeline.pq import ivfpq_search

        with pytest.raises(ValueError, match="refine"):
            ivfpq_search(cemb, cemb.filter("vec_id < 2"), topk=5, refine=3)


class TestPqEncodeBackends:
    """The two pq encode backends must be BIT-IDENTICAL (same IEEE
    fold order, same lowest-pos tie-break) — the property that lets
    'auto' switch to the numpy scale path without touching the
    DuckDB-replayed oracle rows (pipeline/pq.py _encode_vecs; measured
    crossover in tools/pq_crossover.py / SCALE.md)."""

    @pytest.fixture(scope="class")
    def cemb(self, spark):
        from keenwa_spark.pipeline.fixtures import make_clustered_embeddings

        return make_clustered_embeddings(spark).localCheckpoint(eager=True)

    def test_sql_and_numpy_codes_identical(self, cemb):
        from keenwa_spark.pipeline.pq import pq_encode, pq_train

        for m, k in ((4, 8), (16, 64)):
            books = pq_train(cemb, m=m, k_codes=k)
            a = {r.vid: r.codes for r in pq_encode(cemb, books, backend="sql").collect()}
            b = {r.vid: r.codes for r in pq_encode(cemb, books, backend="numpy").collect()}
            assert a == b, (m, k)

    def test_composed_search_identical_across_backends(self, cemb):
        from keenwa_spark.pipeline.pq import ivfpq_search

        q = cemb.filter("vec_id < 10")
        out = {}
        for be in ("sql", "numpy"):
            out[be] = sorted(
                map(
                    tuple,
                    ivfpq_search(
                        cemb, q, k_cells=4, m=4, k_codes=8, encode_backend=be
                    ).collect(),
                )
            )
        assert out["sql"] == out["numpy"]

    def test_fused_corpus_pass_matches_unfused(self, cemb):
        """r13 optimization round: the fused assign+residual+encode
        Arrow pass (pq._fused_assign_encode_numpy — the numpy-backend
        corpus side of ivfpq_search) must emit the exact (vid, cid,
        codes) rows of the unfused sql chain (coarse-assign HOF ->
        broadcast residual join -> encode), for shared AND per-cell
        codebooks. Guards the fusion's bit-exactness claims: same
        sequential-over-dims IEEE folds, same lowest-id tie-breaks."""
        from pyspark.sql import functions as F

        from keenwa_spark.litdf import model_df
        from keenwa_spark.pipeline.ivf import _as_vecs, ivf_assign
        from keenwa_spark.pipeline.pq import (
            _encode_vecs,
            _encode_vecs_local,
            _fused_assign_encode_numpy,
            ivfpq_train,
        )

        spark = cemb.sparkSession
        for local in (False, True):
            cents, books = ivfpq_train(
                cemb, k_cells=4, m=4, k_codes=8, local_books=local
            )
            fused = {
                r.vid: (r.cid, tuple(r.codes))
                for r in _fused_assign_encode_numpy(
                    _as_vecs(cemb, "vec_id", "embedding"),
                    cents, books, local,
                ).collect()
            }
            cells_kv = model_df(
                spark, [(cid, cv) for cid, cv in cents],
                "cid INT, cv ARRAY<DOUBLE>",
            )
            residual = (
                ivf_assign(cemb, cents, backend="sql")
                .join(F.broadcast(cells_kv), "cid")
                .withColumn("v", F.expr("zip_with(v, cv, (x, y) -> x - y)"))
                .select("vid", "cid", "v")
            )
            enc = (
                _encode_vecs_local(residual, books, "sql") if local
                else _encode_vecs(residual, books, "sql", keep=("cid",))
            )
            unfused = {
                r.vid: (r.cid, tuple(r.codes)) for r in enc.collect()
            }
            assert fused == unfused, f"local_books={local}"

    def test_books_roundtrip_parquet_bit_exactly(self, cemb, tmp_path):
        """pq_save/pq_load: a loaded model must encode IDENTICALLY to
        the in-memory one (float64 roundtrips parquet bit-exactly) —
        the reusable-index contract that makes stored codes stable
        across sessions (ivf_save's twin)."""
        from keenwa_spark.pipeline.pq import (
            pq_encode,
            pq_load,
            pq_save,
            pq_train,
        )

        spark = cemb.sparkSession
        books = pq_train(cemb, m=8, k_codes=16)
        pq_save(spark, books, str(tmp_path / "books"))
        loaded = pq_load(spark, str(tmp_path / "books"))
        assert loaded == books
        a = {r.vid: r.codes for r in pq_encode(cemb, books).collect()}
        b = {r.vid: r.codes for r in pq_encode(cemb, loaded).collect()}
        assert a == b

    def test_prebuilt_model_reuse_skips_refit_and_matches(self, cemb, tmp_path):
        """The production pattern: fit once, persist, search many times
        with the stored model — results must be IDENTICAL to the
        fit-inline path for all three searchers (pq, ivf, ivfpq), and
        the roundtrip through parquet must not perturb them."""
        from keenwa_spark.pipeline.ivf import ivf_load, ivf_save, ivf_search, _train
        from keenwa_spark.pipeline.pq import (
            ivfpq_search,
            ivfpq_train,
            pq_load,
            pq_save,
            pq_search,
            pq_train,
        )

        spark = cemb.sparkSession
        q = cemb.filter("vec_id < 10")

        books = pq_train(cemb, m=4, k_codes=8)
        pq_save(spark, books, str(tmp_path / "b"))
        inline = sorted(map(tuple, pq_search(cemb, q, m=4, k_codes=8).collect()))
        reused = sorted(map(tuple, pq_search(
            cemb, q, books=pq_load(spark, str(tmp_path / "b"))
        ).collect()))
        assert inline == reused

        cents = _train(cemb, 8, 2, "vec_id", "embedding")
        ivf_save(spark, cents, str(tmp_path / "c"))
        inline = sorted(map(tuple, ivf_search(cemb, q, k_cells=8).collect()))
        reused = sorted(map(tuple, ivf_search(
            cemb, q, cents=ivf_load(spark, str(tmp_path / "c"))
        ).collect()))
        assert inline == reused

        model = ivfpq_train(cemb, k_cells=4, m=4, k_codes=8)
        inline = sorted(map(tuple, ivfpq_search(
            cemb, q, k_cells=4, m=4, k_codes=8
        ).collect()))
        reused = sorted(map(tuple, ivfpq_search(cemb, q, model=model).collect()))
        assert inline == reused


class TestIvfPqAnisotropic:
    """VERDICT r09 item 6: the isotropic-fixture conclusions re-checked
    on per-cluster ANISOTROPIC noise (scaled covariance rotated into a
    random basis per cluster — the regime real embedding residuals
    live in). Measured, fully deterministic: anisotropy RAISES plain
    IVF-PQ recall (m=8: 0.40 -> 0.51, m=16: 0.51 -> 0.62; noise
    energy concentrates, effective noise dimension drops), and the
    OPQ-rotation study (tools/ivfpq_ceiling.py) shows a global
    eigen-allocation rotation does NOT lift recall on either variant
    (per-cluster bases can't be aligned by one rotation; even a
    shared basis loses more to the degraded k-means init than
    decorrelation buys) — shipping without OPQ is justified on both
    fixture families."""

    @pytest.fixture(scope="class")
    def aemb(self, spark):
        from keenwa_spark.pipeline.fixtures import make_clustered_embeddings

        return make_clustered_embeddings(
            spark, anisotropy=1.0
        ).localCheckpoint(eager=True)

    @pytest.fixture(scope="class")
    def a_truth(self, aemb):
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from keenwa_spark.pipeline.ivf import _as_vecs

        q = _as_vecs(
            aemb.filter(f"vec_id < {N_QUERIES}"), "vec_id", "embedding"
        ).select(F.col("vid").alias("query_id"), F.col("v").alias("qv"))
        c = _as_vecs(aemb, "vec_id", "embedding").select(
            F.col("vid").alias("neighbor_id"), F.col("v").alias("cv")
        )
        sq = (
            "aggregate(zip_with(cv, qv, (x, y) -> (x - y) * (x - y)), "
            "CAST(0 AS DOUBLE), (a, z) -> a + z)"
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("d").asc(), F.col("neighbor_id")
        )
        return (
            c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
            .withColumn("d", F.expr(sq))
            .withColumn("rnk", F.row_number().over(w))
            .filter(f"rnk <= {K}")
            .select("query_id", "neighbor_id")
            .localCheckpoint(eager=True)
        )

    def _recall(self, got, truth):
        t = {(r.query_id, r.neighbor_id) for r in truth.collect()}
        g = {(r.query_id, r.neighbor_id) for r in got.collect()}
        return len(g & t) / len(t)

    def test_aniso_floors_both_bit_budgets(self, aemb, a_truth):
        from keenwa_spark.pipeline.pq import ivfpq_search, pq_search

        queries = aemb.filter(f"vec_id < {N_QUERIES}")
        for m, floor in ((8, 0.45), (16, 0.55)):  # measured 0.51 / 0.62 at NQ=20
            plain = self._recall(
                pq_search(aemb, queries, m=m, k_codes=64, topk=K), a_truth
            )
            composed = self._recall(
                ivfpq_search(
                    aemb, queries, k_cells=20, nprobe=2, m=m, k_codes=64, topk=K
                ),
                a_truth,
            )
            assert composed >= floor, (m, composed)
            assert composed > plain, (m, plain, composed)

    def test_isotropic_default_unchanged(self, spark):
        """anisotropy=0 must reproduce the original fixture BIT-EXACTLY
        (every pinned isotropic recall floor depends on it)."""
        import numpy as np

        from keenwa_spark.pipeline.fixtures import make_clustered_embeddings

        a = make_clustered_embeddings(spark, n=50).collect()
        rng = np.random.default_rng(7)
        centers = rng.standard_normal((20, 64))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        labels = np.arange(50) % 20
        pts = centers[labels] + 0.35 * rng.standard_normal((50, 64)) / np.sqrt(64)
        want = [[float(x) for x in np.float32(pts[i])] for i in range(50)]
        got = {r.vec_id: r.embedding for r in a}
        assert all(got[i] == want[i] for i in range(50))


class TestLocalBooks:
    """Round-11 per-cell study (VERDICT r10 item 5, the 'per-cell OPQ'
    residual gap). Outcome, measured with held-out queries in
    tools/ivfpq_ceiling.py main_r11 and reproduced engine-side here:

    - per-cell OPQ ROTATION: REJECTED — it degrades recall on every
      (fixture, m) combination, the same failure mode as the r10
      global-rotation null (eigen-permuted coordinates break the
      deterministic first-k k-means init harder than decorrelation
      helps at these code rates);
    - per-cell CODEBOOKS (rotation-free LOPQ, pipeline/pq.py
      local_books=True): ADOPTED — engine-measured recall@5 at
      k_cells=20/nprobe=2/k=64 (NQ=25): isotropic m=8 0.376 -> 0.520,
      m=16 0.520 -> 0.752; anisotropic m=8 0.504 -> 0.744, m=16
      0.632 -> 0.768. Deterministic: every number reproduces exactly.
    """

    @pytest.fixture(scope="class")
    def fixtures(self, spark):
        from keenwa_spark.pipeline.fixtures import make_clustered_embeddings

        iso = make_clustered_embeddings(spark).localCheckpoint(eager=True)
        aniso = make_clustered_embeddings(
            spark, anisotropy=1.0
        ).localCheckpoint(eager=True)
        return iso, aniso

    def _truth(self, emb):
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from keenwa_spark.pipeline.ivf import _as_vecs

        q = _as_vecs(
            emb.filter(f"vec_id < {N_QUERIES}"), "vec_id", "embedding"
        ).select(F.col("vid").alias("query_id"), F.col("v").alias("qv"))
        c = _as_vecs(emb, "vec_id", "embedding").select(
            F.col("vid").alias("neighbor_id"), F.col("v").alias("cv")
        )
        sq = (
            "aggregate(zip_with(cv, qv, (x, y) -> (x - y) * (x - y)), "
            "CAST(0 AS DOUBLE), (a, z) -> a + z)"
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("d").asc(), F.col("neighbor_id")
        )
        return (
            c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
            .withColumn("d", F.expr(sq))
            .withColumn("rnk", F.row_number().over(w))
            .filter(f"rnk <= {K}")
            .select("query_id", "neighbor_id")
            .localCheckpoint(eager=True)
        )

    def _recall(self, got, truth):
        t = {(r.query_id, r.neighbor_id) for r in truth.collect()}
        g = {(r.query_id, r.neighbor_id) for r in got.collect()}
        return len(g & t) / len(t)

    def test_local_books_lift_both_fixtures(self, fixtures):
        from keenwa_spark.pipeline.pq import ivfpq_search

        floors = {  # measured engine values minus a hair of slack
            (0, 8): 0.50, (0, 16): 0.73, (1, 8): 0.72, (1, 16): 0.74,
        }
        for fi, emb in enumerate(fixtures):
            truth = self._truth(emb)
            queries = emb.filter(f"vec_id < {N_QUERIES}")
            for m in (8, 16):
                shared = self._recall(
                    ivfpq_search(emb, queries, k_cells=20, nprobe=2, m=m,
                                 k_codes=64, topk=K),
                    truth,
                )
                local = self._recall(
                    ivfpq_search(emb, queries, k_cells=20, nprobe=2, m=m,
                                 k_codes=64, topk=K, local_books=True),
                    truth,
                )
                assert local > shared, (fi, m, shared, local)
                assert local >= floors[(fi, m)], (fi, m, local)

    def test_local_backends_identical_and_model_reuse(self, fixtures):
        """sql/numpy local encodes are bit-identical, and a prebuilt
        (cents, {cid: books}) model reproduces the inline path."""
        from keenwa_spark.pipeline.pq import ivfpq_search, ivfpq_train

        iso, _ = fixtures
        q = iso.filter("vec_id < 10")
        runs = {
            be: sorted(map(tuple, ivfpq_search(
                iso, q, k_cells=4, m=4, k_codes=8, topk=5,
                local_books=True, encode_backend=be,
            ).collect()))
            for be in ("sql", "numpy")
        }
        assert runs["sql"] == runs["numpy"]
        model = ivfpq_train(iso, k_cells=4, m=4, k_codes=8, local_books=True)
        reused = sorted(map(tuple, ivfpq_search(iso, q, model=model).collect()))
        assert reused == runs["sql"]

    def test_lopq_books_roundtrip_parquet_bit_exactly(self, fixtures, tmp_path):
        """lopq_save/lopq_load: a loaded per-cell model must search
        IDENTICALLY to the in-memory one (pq_save's contract, local)."""
        from keenwa_spark.pipeline.pq import (ivfpq_search, ivfpq_train,
                                              lopq_load, lopq_save)

        iso, _ = fixtures
        spark = iso.sparkSession
        q = iso.filter("vec_id < 10")
        cents, lbooks = ivfpq_train(iso, k_cells=4, m=4, k_codes=8,
                                    local_books=True)
        lopq_save(spark, lbooks, str(tmp_path / "lopq"))
        loaded = lopq_load(spark, str(tmp_path / "lopq"))
        assert loaded == lbooks
        a = sorted(map(tuple, ivfpq_search(
            iso, q, model=(cents, lbooks)).collect()))
        b = sorted(map(tuple, ivfpq_search(
            iso, q, model=(cents, loaded)).collect()))
        assert a == b

    def test_every_cell_gets_books(self, spark):
        """ivfpq_train(local_books=True) returns one codebook set per
        surviving coarse cell, each with positions renumbered 1..n —
        the invariant the encode join relies on. (An empty cell is
        unreachable through _lloyd, which drops emptied centroids; the
        train-time guard for it is defense-in-depth.)"""
        from keenwa_spark.pipeline.fixtures import make_clustered_embeddings
        from keenwa_spark.pipeline.pq import ivfpq_train

        emb = make_clustered_embeddings(spark, n=400)
        cents, lbooks = ivfpq_train(emb, k_cells=8, m=4, k_codes=8,
                                    local_books=True)
        assert set(lbooks) == {cid for cid, _ in cents}
        for bks in lbooks.values():
            assert len(bks) == 4
            for book in bks:
                assert [p for p, _ in book] == list(range(1, len(book) + 1))


    def test_trimmed_model_raises_loud_on_both_backends(self, fixtures):
        """ADVICE r11: a coarse cell present in cents but missing from
        the per-cell codebooks (stale lopq_load vs fresh centroids, or
        a trimmed model) must raise the same loud ValueError on BOTH
        encode backends — never silently drop that cell's corpus rows
        via the sql backend's inner join on cid."""
        from keenwa_spark.pipeline.pq import ivfpq_search, ivfpq_train

        iso, _ = fixtures
        q = iso.filter("vec_id < 5")
        cents, lbooks = ivfpq_train(iso, k_cells=4, m=4, k_codes=8,
                                    local_books=True)
        dropped = max(lbooks)
        trimmed = {cid: bks for cid, bks in lbooks.items() if cid != dropped}
        for be in ("sql", "numpy"):
            with pytest.raises(ValueError, match="missing codebooks"):
                ivfpq_search(iso, q, model=(cents, trimmed),
                             encode_backend=be).collect()
