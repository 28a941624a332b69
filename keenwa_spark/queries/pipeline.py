"""LLM-data-pipeline query registrations with DuckDB oracle replication.

Every operator in ``keenwa_spark.pipeline`` registers here. The Spark
side runs the package's DataFrame implementations; the oracle REPLAYS
the same math in DuckDB SQL — possible because all hashing is
md5-derived (portable) and all folds are sequential. Near-dup/LSH
results are therefore *exactly* oracle-checked, not rows-only.

DuckDB dialect notes: regexp_replace needs the 'g' flag, lists are
1-based, string_split/len/list_filter replace split/size/filter,
generate_subscripts+unnest zip for posexplode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from keenwa_spark.pipeline.hashing import MINHASH_AB, MINHASH_P, duck_hash64
from keenwa_spark.queries import REGISTRY, df_query

# --- DuckDB-dialect building blocks ----------------------------------------

_D_NORM = "trim(regexp_replace(lower({c}), '\\s+', ' ', 'g'))"
_D_WORDS = f"string_split({_D_NORM}, ' ')"
_D_SHINGLES = (
    "CASE WHEN len(w) >= 3 "
    "THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)] "
    "ELSE [] END"
)


def _duck_docs_cte(text_col: str = "text") -> str:
    words = _D_WORDS.format(c=text_col)
    return f"""
    docs AS (SELECT doc_id, {words} AS w FROM documents),
    shingles AS (
      SELECT doc_id, unnest({_D_SHINGLES}) AS shingle FROM docs
    ),
    hashed AS (
      SELECT doc_id, {duck_hash64('shingle')} AS h FROM shingles
    )"""


def _duck_minhash_sig() -> str:
    mins = ",\n        ".join(
        f"MIN(({a} * h + {b}) % {MINHASH_P}) AS mh{j}"
        for j, (a, b) in enumerate(MINHASH_AB)
    )
    return f"""
    sig AS (
      SELECT doc_id,
        {mins}
      FROM hashed GROUP BY doc_id
    )"""


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@df_query(
    "pl_dedup_exact",
    oracle=f"""
    SELECT md5({_D_NORM.format(c='text')}) AS content_hash,
           MIN(doc_id) AS doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    doc="Exact dedup: md5 over normalized text, one groupBy shuffle on the "
    "16-byte digest, lowest doc_id kept as representative "
    "(pipeline/dedup.py exact_dedup).",
    tags=("pipeline", "dedup"),
)
def pl_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.dedup import exact_dedup

    return exact_dedup(spark.table("documents"))


# ---------------------------------------------------------------------------
# MinHash signatures + LSH candidate pairs
# ---------------------------------------------------------------------------


@df_query(
    "pl_minhash_signatures",
    oracle=f"""
    WITH {_duck_docs_cte()},
    {_duck_minhash_sig()}
    SELECT * FROM sig
    """,
    doc="MinHash signatures (k=12, md5-derived portable hashes, fixed "
    "affine constants — pipeline/hashing.py): explode shingles -> "
    "map-side partial MIN -> one doc_id shuffle. Oracle replays the "
    "identical arithmetic in DuckDB.",
    tags=("pipeline", "dedup", "minhash"),
)
def pl_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.dedup import minhash_signatures

    return minhash_signatures(spark.table("documents"))


def _duck_lsh_pair_ctes() -> str:
    """The CTE chain ending in ``lsh_pairs`` (reused by the pair query
    and the clustering oracle)."""
    rows_per_band = len(MINHASH_AB) // 4
    band_selects = []
    for b in range(4):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        key = " || '-' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_selects.append(
            f"SELECT doc_id, {b} AS band, {key} AS bkey FROM sig"
        )
    bands_union = "\n      UNION ALL\n      ".join(band_selects)
    return f"""{_duck_docs_cte()},
    {_duck_minhash_sig()},
    buckets AS (
      {bands_union}
    ),
    sized AS (
      SELECT *, COUNT(*) OVER (PARTITION BY band, bkey) AS bucket_n FROM buckets
    ),
    ok_buckets AS (SELECT * FROM sized WHERE bucket_n <= 1000),
    lsh_pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ok_buckets a JOIN ok_buckets b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )"""


def _duck_lsh_pairs_sql() -> str:
    return f"""
    WITH {_duck_lsh_pair_ctes()}
    SELECT id_a, id_b FROM lsh_pairs
    """


@df_query(
    "pl_minhash_lsh_pairs",
    oracle=_duck_lsh_pairs_sql(),
    doc="Banded LSH near-dup candidates (4 bands x 3 rows): shuffle by "
    "(band, bucket-key), within-bucket self-join, distinct pairs — NEVER "
    "an all-pairs crossJoin; candidate count is data-dependent. Degenerate "
    "buckets (>1000 docs) dropped, the production skew guard "
    "(pipeline/dedup.py minhash_lsh_pairs).",
    tags=("pipeline", "dedup", "minhash", "lsh"),
)
def pl_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(spark.table("documents"))


@df_query(
    "pl_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_duck_lsh_pair_ctes()},
    cc_edges AS (
      SELECT id_a AS src, id_b AS dst FROM lsh_pairs
      UNION SELECT id_b, id_a FROM lsh_pairs
    ),
    reach(node, lab) AS (
      SELECT src, src FROM cc_edges
      UNION
      SELECT e.src, r.lab FROM cc_edges e JOIN reach r ON e.dst = r.node
    ),
    comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node)
    SELECT d.doc_id,
           COALESCE(c.component, d.doc_id) AS component,
           d.doc_id = COALESCE(c.component, d.doc_id) AS keep
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    """,
    doc="Near-dup CLUSTERING: LSH pairs -> connected components (iterative "
    "min-label propagation, O(log diameter) join+agg rounds — the "
    "GraphX-style large-graph CC pattern) -> per-doc keep/drop decision "
    "(representative = min id). Oracle computes the same closure with a "
    "DuckDB recursive CTE (pipeline/clustering.py). Note: WITH RECURSIVE "
    "lives in the ORACLE only — the engine's own dialect rejects it, "
    "matching the reference (sql/mod.rs:210).",
    tags=("pipeline", "dedup", "clustering"),
)
def pl_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.clustering import dedup_groups
    from keenwa_spark.pipeline.dedup import minhash_lsh_pairs

    docs = spark.table("documents")
    return dedup_groups(docs, minhash_lsh_pairs(docs))


# ---------------------------------------------------------------------------
# SimHash fingerprints
# ---------------------------------------------------------------------------


def _duck_simhash_sql(bits: int = 32) -> str:
    votes = ",\n        ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN CAST(1 AS BIGINT) << {j} ELSE 0 END)"
        for j in range(bits)
    )
    words = _D_WORDS.format(c="text")
    return f"""
    WITH words AS (
      SELECT doc_id, unnest({words}) AS word FROM documents
    ),
    hashed AS (SELECT doc_id, {duck_hash64('word')} AS h FROM words),
    votes AS (
      SELECT doc_id,
        {votes}
      FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes
    """


@df_query(
    "pl_simhash",
    oracle=_duck_simhash_sql(),
    doc="SimHash fingerprints (32-bit, token-multiset bit voting): near-dup "
    "docs land within small hamming distance. One explode + one doc_id "
    "shuffle (pipeline/dedup.py simhash_fingerprints).",
    tags=("pipeline", "dedup", "simhash"),
)
def pl_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.dedup import simhash_fingerprints

    return simhash_fingerprints(spark.table("documents"))


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs
# ---------------------------------------------------------------------------


@df_query(
    "pl_ngram_jaccard",
    oracle=f"""
    WITH {_duck_docs_cte()},
    sets AS (SELECT DISTINCT doc_id, h AS sh FROM hashed),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sets GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM sets a JOIN sets b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter) >= 0.5
    """,
    doc="EXACT word-3-gram Jaccard pairs >= 0.5 via inverted shingle index "
    "(shuffle on shingle hash, then pair aggregate) — at 100 TB this runs "
    "on LSH candidates only; standalone here for oracle verification "
    "(pipeline/dedup.py ngram_jaccard_pairs).",
    tags=("pipeline", "dedup", "jaccard"),
)
def pl_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(spark.table("documents"), threshold=0.5)


# ---------------------------------------------------------------------------
# Embedding similarity
# ---------------------------------------------------------------------------

_D_VEC_D = "[CAST(x AS DOUBLE) for x in embedding]"
_D_DOT = "list_sum([{a}[i] * {b}[i] for i in range(1, len({a}) + 1)])"


def _duck_cosine(a: str, b: str) -> str:
    return (
        f"{_D_DOT.format(a=a, b=b)}"
        f" / sqrt({_D_DOT.format(a=a, b=a)})"
        f" / sqrt({_D_DOT.format(a=b, b=b)})"
    )


def _duck_safe_cosine(a: str, b: str) -> str:
    """DuckDB twin of similarity._safe_cos: zero-norm vector -> 0
    (no direction, competes on relevance alone). The MMR engine path
    guards its diversity cosine this way, so the oracle must carry the
    SAME guard or a zero vector in a fixture would diverge engine vs
    oracle (ADVICE r08). When the guard is false the expression IS the
    bare _duck_cosine, bit-identical as before."""
    nsq_a = _D_DOT.format(a=a, b=a)
    nsq_b = _D_DOT.format(a=b, b=b)
    return (
        f"CASE WHEN {nsq_a} = CAST(0 AS DOUBLE) "
        f"OR {nsq_b} = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE) "
        f"ELSE {_duck_cosine(a, b)} END"
    )


@df_query(
    "pl_ann_cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, {_D_VEC_D} AS qv FROM embeddings WHERE vec_id < 10
    ),
    c AS (SELECT vec_id AS neighbor_id, {_D_VEC_D} AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id, {_duck_cosine('qv', 'cv')} AS cos_sim
      FROM c, q WHERE query_id <> neighbor_id
    ),
    ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
      ) AS BIGINT) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
    """,
    doc="Brute-force cosine top-5 (the exactness baseline): query side "
    "broadcast, corpus streamed once through codegen zip_with/aggregate "
    "folds — sequential fold order makes scores bit-identical to the "
    "DuckDB oracle (pipeline/similarity.py cosine_topk).",
    tags=("pipeline", "similarity", "ann"),
)
def pl_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.similarity import cosine_topk

    emb = spark.table("embeddings")
    return cosine_topk(emb, emb.filter("vec_id < 10"), k=5)


def _duck_sign_bucket(vec: str, bits: int = 8) -> str:
    terms = " + ".join(
        f"(CASE WHEN {vec}[{i + 1}] > 0 THEN CAST(1 AS BIGINT) << {i} ELSE 0 END)"
        for i in range(bits)
    )
    return f"({terms})"


@df_query(
    "pl_ann_lsh_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, {_D_VEC_D} AS qv,
             {_duck_sign_bucket('embedding')} AS bucket
      FROM embeddings WHERE vec_id < 10
    ),
    c AS (
      SELECT vec_id AS neighbor_id, {_D_VEC_D} AS cv,
             {_duck_sign_bucket('embedding')} AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT query_id, neighbor_id, {_duck_cosine('qv', 'cv')} AS cos_sim
      FROM c JOIN q USING (bucket) WHERE query_id <> neighbor_id
    ),
    ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
      ) AS BIGINT) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
    """,
    doc="Sign-LSH bucketed approximate top-5 (the scale path): corpus "
    "bucketed once by leading-dimension sign bits (256 buckets), "
    "candidates bucket-local — the join shuffles on the bucket key, "
    "never corpus^2 (pipeline/similarity.py lsh_bucket_topk; "
    "multiprobe=0 pinned here to exercise the minimal single-bucket "
    "plan — the shipped default is multiprobe=1, covered by "
    "pl_ann_lsh_multiprobe).",
    tags=("pipeline", "similarity", "ann", "lsh"),
)
def pl_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.similarity import lsh_bucket_topk

    emb = spark.table("embeddings")
    return lsh_bucket_topk(emb, emb.filter("vec_id < 10"), k=5, multiprobe=0)


@df_query(
    "pl_ann_lsh_multiprobe",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, {_D_VEC_D} AS qv,
             {_duck_sign_bucket('embedding')} AS bucket
      FROM embeddings WHERE vec_id < 10
    ),
    probes AS (
      SELECT query_id, qv,
             CASE WHEN i = 0 THEN bucket
                  ELSE xor(bucket, CAST(1 AS BIGINT) << (i - 1)) END AS bucket
      FROM q, generate_series(0, 8) AS t(i)
    ),
    c AS (
      SELECT vec_id AS neighbor_id, {_D_VEC_D} AS cv,
             {_duck_sign_bucket('embedding')} AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT query_id, neighbor_id, {_duck_cosine('qv', 'cv')} AS cos_sim
      FROM c JOIN probes USING (bucket) WHERE query_id <> neighbor_id
    ),
    ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
      ) AS BIGINT) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
    """,
    doc="Multi-probe sign-LSH top-5: each query probes its own bucket "
    "plus all 8 Hamming-1 neighbor buckets — the standard multi-probe "
    "recall lift (recall@5 0.01 -> 0.10 at bits=8 on the synthetic "
    "embeddings at sf0.1, ~8x; SCALE.md) with the fan-out confined to "
    "the tiny broadcast QUERY side; the corpus is still bucketed once "
    "and scanned once (pipeline/similarity.py "
    "lsh_bucket_topk(multiprobe=1)).",
    tags=("pipeline", "similarity", "ann", "lsh"),
)
def pl_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.similarity import lsh_bucket_topk

    emb = spark.table("embeddings")
    return lsh_bucket_topk(emb, emb.filter("vec_id < 10"), k=5, multiprobe=1)


def _duck_ivf_sql(
    k_cells: int = 8,
    iters: int = 2,
    nprobe: int = 2,
    k: int = 5,
    train_rows: int = 100_000,
) -> str:
    """Replay IVF training + search: one (assign, means, centroids) CTE
    triple per Lloyd iteration. Training reads only the bounded sample
    (``tvecs``, vid < train_rows — the driver-side model-fit set);
    search reads the full corpus."""
    sqdist = "list_sum([(v[i] - cv[i]) * (v[i] - cv[i]) for i in range(1, len(v) + 1)])"
    cos = (
        "list_sum([v[i] * qv[i] for i in range(1, len(v) + 1)])"
        " / sqrt(list_sum([v[i] * v[i] for i in range(1, len(v) + 1)]))"
        " / sqrt(list_sum([qv[i] * qv[i] for i in range(1, len(qv) + 1)]))"
    )
    parts = [
        f"""vecs AS (SELECT vec_id AS vid, {_D_VEC_D} AS v FROM embeddings),
    tvecs AS (SELECT * FROM vecs WHERE vid < {train_rows}),
    c0 AS (
      SELECT CAST(vid AS INT) AS cid, v AS cv FROM tvecs WHERE vid < {k_cells}
    )"""
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        parts.append(f"""a{it} AS (
      SELECT vid, cid FROM (
        SELECT tvecs.vid, {prev}.cid,
               ROW_NUMBER() OVER (PARTITION BY tvecs.vid ORDER BY {sqdist}, cid) AS rn
        FROM tvecs, {prev}
      ) WHERE rn = 1
    ),
    m{it} AS (
      SELECT cid, dim, list_sum(list_sort(list(val))) / COUNT(val) AS mval
      FROM (
        SELECT a{it}.cid, generate_subscripts(v, 1) AS dim, unnest(v) AS val
        FROM a{it} JOIN tvecs USING (vid)
      ) GROUP BY cid, dim
    ),
    c{it} AS (SELECT cid, list(mval ORDER BY dim) AS cv FROM m{it} GROUP BY cid)""")
        prev = f"c{it}"
    parts.append(f"""inverted AS (
      SELECT vid, cid FROM (
        SELECT vecs.vid, {prev}.cid,
               ROW_NUMBER() OVER (PARTITION BY vecs.vid ORDER BY {sqdist}, cid) AS rn
        FROM vecs, {prev}
      ) WHERE rn = 1
    ),
    probed AS (
      SELECT vid AS query_id, v AS qv, cid FROM (
        SELECT vecs.vid, vecs.v, {prev}.cid,
               ROW_NUMBER() OVER (PARTITION BY vecs.vid ORDER BY {sqdist}, cid) AS rn
        FROM vecs, {prev} WHERE vecs.vid < 10
      ) WHERE rn <= {nprobe}
    ),
    scored AS (
      SELECT p.query_id, i.vid AS neighbor_id, {cos} AS cos_sim
      FROM inverted i JOIN vecs ON vecs.vid = i.vid JOIN probed p ON p.cid = i.cid
      WHERE i.vid <> p.query_id
    )""")
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT query_id, neighbor_id, cos_sim,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
      ) AS rnk FROM scored
    ) WHERE rnk <= {k}
    """


@df_query(
    "pl_ann_ivf_topk",
    oracle=_duck_ivf_sql(),
    doc="IVF approximate top-5 (pipeline/ivf.py): deterministic coarse "
    "k-means fit in-driver on a bounded sample (fixed init, sorted-fold "
    "means, 2 Lloyd iterations — the faiss train-on-sample recipe) -> "
    "one shuffle-free corpus assignment pass (centroids broadcast as a "
    "1-row array<struct> model column) -> nprobe=2 probed search. The "
    "ENTIRE pipeline incl. training is oracle-replayed in DuckDB "
    "(chained CTEs per iteration) — bit-exact centroids, assignments, "
    "and scores.",
    tags=("pipeline", "similarity", "ann", "ivf"),
)
def pl_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.ivf import ivf_search

    emb = spark.table("embeddings")
    return ivf_search(emb, emb.filter("vec_id < 10"), k=5)


@df_query(
    "pl_embedding_centroids",
    oracle="""
    WITH expl AS (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
             unnest(embedding) AS v
      FROM embeddings
    )
    SELECT label, dim,
           list_sum(list_sort(list(CAST(v AS DOUBLE)))) / COUNT(v) AS centroid_v,
           COUNT(v) AS n_vecs
    FROM expl GROUP BY label, dim
    """,
    doc="Per-label centroids: posexplode -> (label, dim) partial-agg "
    "shuffle; float sums folded in SORTED order for partition-order "
    "independence (decimal routes diverge cross-engine on float casts — "
    "pipeline/similarity.py label_centroids).",
    tags=("pipeline", "similarity"),
)
def pl_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.similarity import label_centroids

    return label_centroids(spark.table("embeddings"))


@df_query(
    "pl_near_dup_cosine",
    oracle=f"""
    WITH c AS (
      SELECT vec_id, {_D_VEC_D} AS v, {_duck_sign_bucket('embedding')} AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_duck_cosine('a.v', 'b.v')} AS cos_sim
    FROM c a JOIN c b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_duck_cosine('a.v', 'b.v')} >= 0.3
    """,
    doc="Embedding-space near-duplicate pairs within sign-LSH buckets — "
    "bucketed self-join, candidates bucket-local (pipeline/similarity.py "
    "near_dup_cosine_pairs). Threshold 0.3 (not the 0.9 one would use on "
    "real embeddings): the synthetic vectors' max in-bucket cosine is "
    "~0.47, so 0.9 made the check a vacuous empty-vs-empty match; 0.3 "
    "yields 24 pairs at sf0.01, so the bucket-join + threshold logic is "
    "actually exercised.",
    tags=("pipeline", "dedup", "similarity"),
)
def pl_near_dup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.similarity import near_dup_cosine_pairs

    return near_dup_cosine_pairs(spark.table("embeddings"), threshold=0.3)


@df_query(
    "pl_semantic_dedup",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, {_D_VEC_D} AS cv FROM embeddings WHERE vec_id < 8
    ),
    c AS (SELECT vec_id, {_D_VEC_D} AS v FROM embeddings),
    scored AS (
      SELECT vec_id, cent_id, {_duck_cosine('v', 'cv')} AS cos_c FROM c, cents
    ),
    asg AS (
      SELECT vec_id, cent_id AS cluster_id, cos_c AS cos_to_centroid
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY cos_c DESC, cent_id
        ) AS rn FROM scored
      ) WHERE rn = 1
    ),
    dups AS (
      SELECT DISTINCT b.vec_id
      FROM asg a JOIN asg b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      JOIN c ca ON ca.vec_id = a.vec_id
      JOIN c cb ON cb.vec_id = b.vec_id
      WHERE {_duck_cosine('ca.v', 'cb.v')} >= 0.3
    )
    SELECT asg.vec_id, cluster_id, cos_to_centroid,
           (dups.vec_id IS NOT NULL) AS is_dup
    FROM asg LEFT JOIN dups ON asg.vec_id = dups.vec_id
    """,
    doc="SemDeDup-style semantic dedup (Abbas et al. 2023): broadcast "
    "nearest-centroid assignment (struct-max argmax, map-side partial "
    "agg), then greedy keep-lowest-id duplicate flags over "
    "CLUSTER-LOCAL cosine pairs — never corpus^2 "
    "(pipeline/similarity.py semantic_dedup). Centroids here are the "
    "deterministic seed pick vec_id < 8 so the oracle replicates the "
    "assignment exactly; threshold 0.3 for the same non-vacuity reason "
    "as pl_near_dup_cosine.",
    tags=("pipeline", "dedup", "similarity"),
)
def pl_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.similarity import semantic_dedup

    emb = spark.table("embeddings")
    cents = emb.filter("vec_id < 8").select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv")
    )
    return semantic_dedup(emb, cents, threshold=0.3)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@df_query(
    "pl_text_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, text,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_words,
           CAST(length(regexp_replace(norm, ' ', '', 'g')) AS DOUBLE)
             / len(string_split(norm, ' ')) AS mean_word_len,
           CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
             / length(text) AS punct_ratio,
           CAST(len(list_filter(string_split(norm, ' '),
                    x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
             / len(string_split(norm, ' ')) AS stopword_ratio,
           CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
             / length(text) AS upper_ratio
    FROM t
    """,
    doc="Quality-scoring features: char/word counts, mean word length, "
    "punctuation/stopword/uppercase ratios — all codegen string ops, no "
    "Python (pipeline/text.py text_stats).",
    tags=("pipeline", "text"),
)
def pl_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.text import text_stats

    return text_stats(spark.table("documents"))


def _duck_lang_sql() -> str:
    from keenwa_spark.pipeline.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    scores = ",\n      ".join(
        "CAST(len(list_filter(w, x -> x IN ('"
        + "', '".join(LANG_MARKERS[lang])
        + f"'))) AS BIGINT) AS score_{lang}"
        for lang in langs
    )
    best = "CASE " + " ".join(
        f"WHEN score_{l} >= GREATEST({', '.join('score_' + m for m in langs if m != l)}) THEN '{l}'"
        for l in langs
    ) + " END"
    words = _D_WORDS.format(c="text")
    return f"""
    WITH w AS (SELECT doc_id, {words} AS w FROM documents),
    scored AS (
      SELECT doc_id,
      {scores}
      FROM w
    )
    SELECT doc_id, score_de, score_en, score_es, score_fr, {best} AS pred_lang
    FROM scored
    """


@df_query(
    "pl_language_id",
    oracle=_duck_lang_sql(),
    doc="Marker-word language-ID with deterministic argmax (score desc, "
    "code asc). The synthetic corpus shares one vocabulary across langs, "
    "so predictions are a stable constant — the mechanism (not the "
    "profile) is under test (pipeline/text.py language_id).",
    tags=("pipeline", "text", "langid"),
)
def pl_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.text import language_id

    return language_id(spark.table("documents"))


@df_query(
    "pl_token_counts",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT doc_id,
           CAST(len(string_split(norm, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
             AS bpe_ish_tokens,
           CAST(len(list_distinct(string_split(norm, ' '))) AS BIGINT) AS uniq_words
    FROM t
    """,
    doc="Token budgeting features: whitespace tokens, BPE-ish regex "
    "pre-tokens, unique words (pipeline/text.py token_counts).",
    tags=("pipeline", "text", "tokens"),
)
def pl_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.text import token_counts

    return token_counts(spark.table("documents"))


@df_query(
    "pl_text_fingerprint",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
      FROM documents
    ),
    w AS (SELECT doc_id, norm, string_split(norm, ' ') AS w FROM t)
    SELECT doc_id,
           CAST(list_sum([({duck_hash64('w[i]')} * i) % {MINHASH_P}
                          for i in range(1, len(w) + 1)]) % {MINHASH_P} AS BIGINT)
             AS fingerprint,
           md5(norm) AS content_md5
    FROM w
    """,
    doc="Order-sensitive positional fingerprint (hash64(word)*position "
    "summed mod P) + md5 digest — reordering words changes the value, "
    "unlike a bag-of-words digest (pipeline/text.py text_fingerprint).",
    tags=("pipeline", "text", "fingerprint"),
)
def pl_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.text import text_fingerprint

    return text_fingerprint(spark.table("documents"))


#: deterministic synthetic PII appended to each doc in BOTH engines so
#: the redaction regexes are genuinely exercised (the corpus itself is
#: PII-free word salad — without this the oracle check would be the
#: vacuous 0-redactions-vs-0-redactions match)
_PII_SUFFIX_SPARK = (
    "concat(text, ' contact user', CAST(doc_id AS STRING), '@example.com"
    " or +1 (555) 010-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'),"
    " ' ip 10.0.', CAST(doc_id % 256 AS STRING), '.1')"
)
_PII_SUFFIX_DUCK = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com"
    " or +1 (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'"
)


def _pii_doc_query() -> str:
    from keenwa_spark.pipeline.text import PII_PATTERNS

    email, phone, ipv4 = (
        PII_PATTERNS["email"],
        PII_PATTERNS["phone"],
        PII_PATTERNS["ipv4"],
    )
    return f"""
    WITH t AS (SELECT doc_id, {_PII_SUFFIX_DUCK} AS text FROM documents),
    staged AS (SELECT doc_id, text,
             regexp_replace(regexp_replace(text, '{email}', '<EMAIL>', 'g'),
                            '{ipv4}', '<IP>', 'g') AS no_ip
           FROM t)
    SELECT doc_id,
           regexp_replace(no_ip, '{phone}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text, '{email}', 0)) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{ipv4}', 0)) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(no_ip, '{phone}', 0)) AS BIGINT) AS n_phones
    FROM staged
    """


@df_query(
    "pl_pii_redact",
    oracle=_pii_doc_query(),
    doc="PII scrubbing: emails / phone-like digit runs / IPv4 replaced "
    "with typed tags + per-category counts, patterns restricted to the "
    "Java-regex/RE2 common subset so DuckDB replays the redaction "
    "byte-for-byte. Pure regex map in codegen, zero shuffle "
    "(pipeline/text.py redact_pii). Synthetic PII is appended "
    "deterministically in both engines — the corpus itself is PII-free, "
    "which would make an unmodified check vacuous.",
    tags=("pipeline", "text", "pii"),
)
def pl_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.pipeline.text import redact_pii

    docs = spark.table("documents").select(
        "doc_id", F.expr(_PII_SUFFIX_SPARK).alias("text")
    )
    return redact_pii(docs)


@df_query(
    "pl_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, doc_id % 8 AS shard,
             CAST(len(string_split({_D_NORM.format(c='text')}, ' ')) AS BIGINT)
               AS n_tokens
      FROM documents WHERE len(trim(text)) > 0
    ),
    cum AS (
      SELECT *, CAST(SUM(n_tokens) OVER (
        PARTITION BY shard ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_after
      FROM toks
    ),
    spans AS (
      SELECT *, cum_after - n_tokens AS cum_before,
             unnest(generate_series(
               CAST((cum_after - n_tokens) // 128 AS BIGINT),
               CAST((cum_after - 1) // 128 AS BIGINT))) AS win
      FROM cum
    )
    SELECT doc_id, shard,
           shard * {1 << 40} + win AS seq_id,
           win,
           GREATEST(0, win * 128 - cum_before) AS tok_start,
           LEAST(n_tokens, (win + 1) * 128 - cum_before) AS tok_end,
           n_tokens
    FROM spans
    """,
    doc="GPT-style fixed-context sequence packing (seq_len=128, 8 "
    "shards): docs concatenated in id order within each shard and cut "
    "into fixed token windows; output maps every doc to its sequence(s) "
    "with exact in-doc token ranges. ONE shuffle (shard) + one window "
    "cumsum, integer math end-to-end — embarrassingly parallel across "
    "shards at 100 TB (pipeline/packing.py pack_training_sequences).",
    tags=("pipeline", "packing"),
)
def pl_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.packing import pack_training_sequences

    return pack_training_sequences(
        spark.table("documents"), seq_len=128, n_shards=8
    )


@df_query(
    "pl_doc_chunks",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split({_D_NORM.format(c='text')}, ' ') AS w
      FROM documents WHERE len(trim(text)) > 0
    ),
    chunks AS (
      SELECT doc_id, w,
             unnest(generate_series(0, (len(w) - 1) // 24)) AS chunk_id
      FROM w
    )
    SELECT doc_id,
           CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(chunk_id * 24 AS BIGINT) AS chunk_start,
           CAST(len(w[chunk_id * 24 + 1 : chunk_id * 24 + 32]) AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(w[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ')
             AS chunk_text
    FROM chunks
    """,
    doc="Sliding-window document chunking (32-token chunks, 8-token "
    "overlap — the RAG/embedding-input shape): pure per-row explode "
    "over the word array, zero shuffles "
    "(pipeline/packing.py chunk_documents).",
    tags=("pipeline", "packing", "chunking"),
)
def pl_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.packing import chunk_documents

    return chunk_documents(spark.table("documents"), chunk_tokens=32, overlap=8)


@df_query(
    "pl_corpus_curation",
    oracle=f"""
    WITH RECURSIVE {_duck_lsh_pair_ctes()},
    cc_edges AS (
      SELECT id_a AS src, id_b AS dst FROM lsh_pairs
      UNION SELECT id_b, id_a FROM lsh_pairs
    ),
    reach(node, lab) AS (
      SELECT src, src FROM cc_edges
      UNION
      SELECT e.src, r.lab FROM cc_edges e JOIN reach r ON e.dst = r.node
    ),
    comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node),
    stats AS (
      SELECT doc_id,
             len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))
               AS n_words
      FROM documents
    )
    SELECT d.doc_id,
           CAST(s.n_words AS BIGINT) AS n_words,
           COALESCE(c.component, d.doc_id) AS component
    FROM documents d
    JOIN stats s ON s.doc_id = d.doc_id
    LEFT JOIN comp c ON c.node = d.doc_id
    WHERE s.n_words >= 30
      AND d.doc_id = COALESCE(c.component, d.doc_id)
    """,
    doc="END-TO-END training-data curation: quality gate (word-count "
    "threshold from text_stats) AND near-dup representative selection "
    "(LSH -> connected components -> keep component minimum) in one "
    "declarative plan — the actual composition a 100 TB corpus build "
    "runs. Oracle replays the full chain incl. the recursive closure.",
    tags=("pipeline", "curation", "composition"),
)
def pl_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.pipeline.clustering import connected_components
    from keenwa_spark.pipeline.dedup import minhash_lsh_pairs
    from keenwa_spark.pipeline.text import text_stats

    docs = spark.table("documents")
    # stats already carries doc_id: no docs⋈stats self-join needed. The
    # ONE remaining doc_id join (stats ⋈ components) is algorithmically
    # required — and its right side is only the docs that appear in
    # near-dup pairs, not the corpus (singletons coalesce to
    # themselves), so it is BROADCAST (r14): the components side is
    # bounded by the LSH candidate set — the same tiny-by-construction
    # argument lsh_verified_pairs broadcasts its candidate ids on —
    # and the checkpointed-RDD side carries no stats, so AQE never
    # converts the SortMergeJoin on its own (executed-plan probe:
    # tools/r14_curation_bcast_probe.py, SMJ 1 -> 0, Exchange 2 -> 1).
    # Without the hint the CORPUS-sized stats frame pays the join's
    # exchange + sort.
    stats = text_stats(docs).select("doc_id", "n_words")
    comp = connected_components(minhash_lsh_pairs(docs))
    return (
        stats.join(F.broadcast(comp), "doc_id", "left")
        .withColumn("component", F.coalesce("component", F.col("doc_id")))
        .filter((F.col("n_words") >= 30) & (F.col("doc_id") == F.col("component")))
        .select("doc_id", "n_words", "component")
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (Arrow-batched mapInPandas decode)
# ---------------------------------------------------------------------------


@df_query(
    "pl_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS width,
           CAST(ascii(substr(text, 2, 1)) AS BIGINT) AS height,
           CASE WHEN text IS NULL THEN NULL
                WHEN ascii(substr(text, 1, 1)) % 2 = 0
                THEN 'fake-a' ELSE 'fake-b' END AS format
    FROM documents
    """,
    doc="Multimodal decode plumbing: binary payload column + Arrow-batched "
    "mapInPandas decoder (one Python roundtrip per batch, never per row). "
    "The codec is a deterministic header-byte fake (real libs absent — "
    "pipeline/multimodal.py); the batch shape, schema, and oracle are "
    "real. Text is ASCII so the byte-arithmetic oracle replicates exactly.",
    tags=("pipeline", "multimodal"),
)
def pl_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.multimodal import attach_binary_payload, decode_batch

    docs = attach_binary_payload(spark.table("documents"))
    return decode_batch(docs)


def _video_sample_oracle() -> str:
    from keenwa_spark.pipeline.mm_fixtures import video_frames_oracle_sql

    return video_frames_oracle_sql(every_n=2)


@df_query(
    "pl_video_frame_sample",
    oracle=_video_sample_oracle(),
    doc="Real video decode composed with pure-DataFrame frame "
    "sampling: YUV4MPEG2 payloads decode to per-frame rows "
    "(pipeline/y4m.py via explode_video_frames — the r7 stub slicer is "
    "retired), then every 2nd frame survives via the windowed sampler "
    "(frame_sample_plan — keep-every-n needs no Python even when "
    "decode does). Arrow-batched decode, shuffle only for the "
    "per-asset window; the oracle is the fixture corpus's per-frame "
    "crc32 rows recomputed from the raw planar buffers, filtered to "
    "even indices.",
    tags=("pipeline", "multimodal", "video"),
)
def pl_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.mm_fixtures import fixture_videos
    from keenwa_spark.pipeline.multimodal import (
        explode_video_frames,
        frame_sample_plan,
    )

    vids = spark.createDataFrame(
        fixture_videos(), "doc_id LONG NOT NULL, payload BINARY NOT NULL"
    )
    sampled = frame_sample_plan(explode_video_frames(vids), every_n=2)
    return sampled.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
        F.col("frame_bytes").cast("bigint").alias("frame_bytes"),
        F.col("frame_crc").cast("bigint").alias("frame_crc"),
    ).orderBy("doc_id", "frame_idx")


# ---------------------------------------------------------------------------
# Deterministic sampling (pipeline/sampling.py)
# ---------------------------------------------------------------------------

#: DuckDB twin of pipeline.hashing bucket: md5(key || salt) -> 32-bit
#: int64 -> mod 1e6 (sampling._bucket_expr)
def _duck_bucket(key: str, salt: str) -> str:
    return f"(('0x' || substr(md5(CAST({key} AS VARCHAR) || '{salt}'), 1, 8))::BIGINT) % 1000000"


@df_query(
    "pl_sample_hash",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {_duck_bucket('doc_id', 's0')} < 250000
    """,
    doc="Deterministic Bernoulli-by-hash sample (rate 0.25): pure map, "
    "no RNG, no shuffle — the same rows are selected on any engine, "
    "cluster layout, or re-run (pipeline/sampling.py hash_sample).",
    tags=("pipeline", "sampling"),
)
def pl_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.sampling import hash_sample

    return hash_sample(spark.table("documents"), "doc_id", 0.25).select(
        "doc_id", "lang", "source"
    )


@df_query(
    "pl_token_budget",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(string_split({_D_NORM.format(c='text')}, ' ')) AS BIGINT)
               AS n_tokens,
             {_duck_bucket('doc_id', 'tb0')} AS bk
      FROM documents
    ),
    cum AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY bk, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
      FROM toks
    )
    SELECT doc_id, source, n_tokens, cum_tokens FROM cum
    WHERE cum_tokens <= CASE WHEN source = 'src0' THEN CAST(800 AS BIGINT)
                             WHEN source = 'src1' THEN CAST(10000 AS BIGINT)
                             WHEN source = 'src2' THEN CAST(100 AS BIGINT)
                             ELSE CAST(0 AS BIGINT) END
    """,
    doc="Token-budget corpus cap — the 'data recipe' operator ('use N "
    "tokens of domain X'): docs taken per domain in deterministic "
    "(hash, key) order, kept while the running token total fits the "
    "domain budget (maximal prefix; src0 capped mid-domain, src1 "
    "uncapped, src2 nearly empty, unknown domains dropped). One window "
    "shuffle on the domain key "
    "(pipeline/sampling.py token_budget_cap).",
    tags=("pipeline", "sampling", "budget"),
)
def pl_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.sampling import token_budget_cap

    return token_budget_cap(
        spark.table("documents"),
        "source",
        {"src0": 800, "src1": 10000, "src2": 100},
        "doc_id",
    ).select("doc_id", "source", "n_tokens", "cum_tokens")


@df_query(
    "pl_sample_split",
    oracle=f"""
    WITH b AS (SELECT doc_id, {_duck_bucket('doc_id', 'split0')} AS bk FROM documents),
    s AS (
      SELECT doc_id,
             CASE WHEN bk >= 0 AND bk < 800000 THEN 'train'
                  WHEN bk >= 800000 AND bk < 900000 THEN 'val'
                  WHEN bk >= 900000 AND bk < 1000000 THEN 'test' END AS split
      FROM b
    )
    SELECT split, COUNT(*) AS n, CAST(MIN(doc_id) AS BIGINT) AS min_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_id
    FROM s WHERE split IS NOT NULL GROUP BY split
    """,
    doc="Hash-range train/val/test split (80/10/10): every key lands in "
    "exactly one split, stable across runs/engines — no leakage between "
    "incremental rebuilds (pipeline/sampling.py hash_split).",
    tags=("pipeline", "sampling"),
)
def pl_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.pipeline.sampling import hash_split

    return (
        hash_split(
            spark.table("documents"),
            "doc_id",
            {"train": 0.8, "val": 0.1, "test": 0.1},
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n"),
            F.min("doc_id").cast("bigint").alias("min_id"),
            F.max("doc_id").cast("bigint").alias("max_id"),
        )
    )


@df_query(
    "pl_sample_stratified",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {_duck_bucket('doc_id', 'strat0')} ASC, doc_id ASC
             ) AS rk
      FROM documents
    )
    SELECT doc_id, lang FROM r WHERE rk <= 5
    """,
    doc="Exactly-5-per-language stratified sample: rank by (hash, key) "
    "inside each stratum — a total ordering, so the draw is unique and "
    "oracle-replayable (pipeline/sampling.py stratified_sample).",
    tags=("pipeline", "sampling"),
)
def pl_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.sampling import stratified_sample

    return stratified_sample(
        spark.table("documents"), "lang", 5, "doc_id"
    ).select("doc_id", "lang")


@df_query(
    "pl_stratified_split",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {_duck_bucket('doc_id', 'ssplit0')} ASC, doc_id ASC
             ) AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN rk <= (60 * n) // 100 THEN 'train'
                WHEN rk <= (80 * n) // 100 THEN 'val'
                WHEN rk <= (100 * n) // 100 THEN 'test' END AS split
    FROM r
    """,
    doc="EXACT per-stratum proportional 60/20/20 splits: rank by "
    "(hash, key) inside each language, integer-percent boundaries on "
    "the stratum count — every stratum hits its percentage exactly "
    "(+-1 row), where hash_split is proportional only in expectation "
    "and only corpus-wide. One window shuffle "
    "(pipeline/sampling.py stratified_split).",
    tags=("pipeline", "sampling", "splits"),
)
def pl_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.sampling import stratified_split

    return stratified_split(
        spark.table("documents"),
        "lang",
        {"train": 60, "val": 20, "test": 20},
        "doc_id",
    ).select("doc_id", "lang", "split")


@df_query(
    "pl_cluster_split",
    oracle=f"""
    WITH RECURSIVE {_duck_lsh_pair_ctes()},
    cc_edges AS (
      SELECT id_a AS src, id_b AS dst FROM lsh_pairs
      UNION SELECT id_b, id_a FROM lsh_pairs
    ),
    reach(node, lab) AS (
      SELECT src, src FROM cc_edges
      UNION
      SELECT e.src, r.lab FROM cc_edges e JOIN reach r ON e.dst = r.node
    ),
    comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node),
    rooted AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    ),
    b AS (
      SELECT doc_id, component,
             {_duck_bucket('component', 'csplit0')} AS bk
      FROM rooted
    )
    SELECT doc_id, component,
           CASE WHEN bk < 800000 THEN 'train'
                WHEN bk < 1000000 THEN 'test' END AS split
    FROM b WHERE bk < 1000000
    """,
    doc="Near-dup-cluster-aware splits: LSH pairs -> connected "
    "components -> hash_split keyed on the COMPONENT root, so every "
    "near-duplicate lands in the same split — the leakage path that "
    "row-wise and even domain-wise splits miss (a paraphrased doc in "
    "train and its twin in eval silently inflates metrics). Same "
    "deterministic bucket math as hash_split; oracle replays the CC "
    "closure with a recursive CTE and the identical bucket arithmetic "
    "(pipeline/clustering.py + sampling.py composition).",
    tags=("pipeline", "sampling", "splits", "dedup"),
)
def pl_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.clustering import dedup_groups
    from keenwa_spark.pipeline.dedup import minhash_lsh_pairs
    from keenwa_spark.pipeline.sampling import hash_split

    docs = spark.table("documents")
    comp = dedup_groups(docs, minhash_lsh_pairs(docs)).select(
        "doc_id", "component"
    )
    return hash_split(
        comp, "component", {"train": 0.8, "test": 0.2}, salt="csplit0"
    ).select("doc_id", "component", "split")


# ---------------------------------------------------------------------------
# TF-IDF (pipeline/tfidf.py)
# ---------------------------------------------------------------------------


@df_query(
    "pl_tfidf_top_terms",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (
        SELECT doc_id, unnest({_D_WORDS.format(c='text')}) AS term
        FROM documents
      )
      WHERE term <> '' GROUP BY doc_id, term
    ),
    dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df_t FROM tf GROUP BY term),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * (CAST(n.n_docs AS DOUBLE) - dft.df_t + 0.5) / (dft.df_t + 0.5)
               AS score
      FROM tf JOIN dft USING (term) CROSS JOIN n
      WHERE dft.df_t >= 2
    ),
    r AS (
      SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC)
               AS rnk
      FROM scored
    )
    SELECT doc_id, term, score, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 3
    """,
    doc="Top-3 characteristic terms per document by tf-idf. idf is the "
    "BM25-style RATIONAL form (N - df + .5)/(df + .5) — ln() differs in "
    "the last ulp between engines (measured ~5% of inputs), the rational "
    "form is bit-exact (pipeline/tfidf.py module doc).",
    tags=("pipeline", "text", "tfidf"),
)
def pl_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.tfidf import top_terms

    return top_terms(spark.table("documents"), k=3, min_df=2)


# ---------------------------------------------------------------------------
# Embedding quantization (pipeline/quantization.py)
# ---------------------------------------------------------------------------

#: DuckDB twin of quantization._SCALE / _QUANT (per-vector symmetric int8)
_D_QSCALE = "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0"
_D_QUANT = (
    "list_transform(embedding, x -> CAST(greatest(least("
    "floor(CAST(x AS DOUBLE) / scale + 0.5), 127.0), -127.0) AS INT))"
)


@df_query(
    "pl_embed_quantize",
    oracle=f"""
    WITH s AS (SELECT vec_id, embedding, {_D_QSCALE} AS scale FROM embeddings),
    q AS (
      SELECT vec_id, scale,
             CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0)
                  ELSE {_D_QUANT} END AS qvec
      FROM s
    )
    SELECT vec_id AS vid, scale, array_to_string(qvec, ',') AS qstr FROM q
    """,
    doc="Per-vector symmetric int8 quantization (4x smaller vector "
    "corpus): scale = amax/127, explicit floor(x+0.5) rounding (round() "
    "is half-even vs half-away cross-engine). Pure map, zero shuffle. "
    "Codes serialized to CSV strings for hash-friendly comparison "
    "(pipeline/quantization.py quantize_int8).",
    tags=("pipeline", "similarity", "quantization"),
)
def pl_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.pipeline.quantization import quantize_int8

    return quantize_int8(spark.table("embeddings")).select(
        "vid", "scale", F.array_join("qvec", ",").alias("qstr")
    )


@df_query(
    "pl_embed_quant_error",
    oracle=f"""
    WITH s AS (SELECT vec_id, embedding, {_D_QSCALE} AS scale FROM embeddings),
    q AS (
      SELECT vec_id, embedding, scale,
             CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0)
                  ELSE {_D_QUANT} END AS qvec
      FROM s
    )
    SELECT vec_id AS vid, scale,
           list_sum(list_transform(range(1, len(embedding) + 1), i ->
             (CAST(embedding[i] AS DOUBLE) - qvec[i] * scale)
             * (CAST(embedding[i] AS DOUBLE) - qvec[i] * scale)))
             / len(embedding) AS mse
    FROM q
    """,
    doc="int8 round-trip reconstruction MSE per vector — the quality "
    "gate before swapping an fp index for the quantized one. Fuses "
    "quantize + reconstruct + error into one projection "
    "(pipeline/quantization.py reconstruction_error).",
    tags=("pipeline", "similarity", "quantization"),
)
def pl_embed_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.quantization import reconstruction_error

    return reconstruction_error(spark.table("embeddings"))


# ---------------------------------------------------------------------------
# Quality gates (pipeline/quality.py)
# ---------------------------------------------------------------------------

_D_QSIG = f"""
    sig AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(len(list_distinct(w)) AS DOUBLE) / nullif(len(w), 0)
               AS distinct_word_ratio,
             CAST(len(regexp_extract_all(lower(text), 'https?://[^ ]+', 0)) AS BIGINT)
               AS url_hits,
             CAST(len(regexp_extract_all(lower(text),
               '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}', 0)) AS BIGINT)
               AS email_hits,
             CAST(len(regexp_replace(norm, '[^0-9]', '', 'g')) AS DOUBLE)
               / nullif(len(replace(norm, ' ', '')), 0) AS digit_ratio,
             CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
               / nullif(len(w), 0) AS alpha_word_ratio,
             CAST(list_max(list_transform(w, x -> length(x))) AS BIGINT)
               AS max_word_len
      FROM (SELECT doc_id, text, {_D_NORM.format(c='text')} AS norm,
                   {_D_WORDS.format(c='text')} AS w
            FROM documents)
    ),
    gates AS (
      SELECT *,
             (n_words >= 30 AND n_words <= 100000) AS g_len,
             (distinct_word_ratio >= 0.2) AS g_repetition,
             (digit_ratio <= 0.3) AS g_digits,
             (alpha_word_ratio >= 0.7) AS g_alpha,
             (max_word_len <= 40) AS g_word_len,
             (url_hits <= 5) AS g_urls
      FROM sig
    )"""


@df_query(
    "pl_quality_gates",
    oracle=f"""
    WITH {_D_QSIG}
    SELECT doc_id, n_words, distinct_word_ratio, url_hits, email_hits,
           digit_ratio, alpha_word_ratio, max_word_len,
           g_len, g_repetition, g_digits, g_alpha, g_word_len, g_urls,
           (g_len AND g_repetition AND g_digits AND g_alpha
            AND g_word_len AND g_urls) AS keep
    FROM gates
    """,
    doc="Gopher/C4-style quality filter bank: repetition, digit/alpha "
    "ratios, URL/email density, junk-token length — per-doc signals plus "
    "named boolean gates and the keep conjunction, one codegen projection "
    "over the scan (pipeline/quality.py quality_gates). The gate TABLE is "
    "the output: audits need why a doc dropped, not just the survivors.",
    tags=("pipeline", "text", "quality"),
)
def pl_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.quality import quality_gates

    return quality_gates(spark.table("documents"))


@df_query(
    "pl_quality_drop_stats",
    oracle=f"""
    WITH {_D_QSIG}
    SELECT CAST(sum(CASE WHEN NOT g_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_g_len,
           CAST(sum(CASE WHEN NOT g_repetition THEN 1 ELSE 0 END) AS BIGINT) AS fail_g_repetition,
           CAST(sum(CASE WHEN NOT g_digits THEN 1 ELSE 0 END) AS BIGINT) AS fail_g_digits,
           CAST(sum(CASE WHEN NOT g_alpha THEN 1 ELSE 0 END) AS BIGINT) AS fail_g_alpha,
           CAST(sum(CASE WHEN NOT g_word_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_g_word_len,
           CAST(sum(CASE WHEN NOT g_urls THEN 1 ELSE 0 END) AS BIGINT) AS fail_g_urls,
           CAST(sum(CASE WHEN g_len AND g_repetition AND g_digits AND g_alpha
                          AND g_word_len AND g_urls THEN 1 ELSE 0 END) AS BIGINT) AS kept,
           COUNT(*) AS total
    FROM gates
    """,
    doc="Corpus-level drop-reason audit: per-gate failure counts + kept "
    "total in ONE partial-aggregated global agg — a handful of longs per "
    "partition (pipeline/quality.py drop_reason_stats).",
    tags=("pipeline", "text", "quality"),
)
def pl_quality_drop_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.quality import drop_reason_stats, quality_gates

    return drop_reason_stats(quality_gates(spark.table("documents")))


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

_D_4GRAMS = (
    "CASE WHEN len(w) >= 4 "
    "THEN [array_to_string(w[i:i+3], ' ') for i in range(1, len(w)-2)] "
    "ELSE [] END"
)


@df_query(
    "pl_decontaminate",
    oracle=f"""
    WITH splitd AS (
      SELECT doc_id, {_D_WORDS.format(c='text')} AS w FROM documents
    ),
    dsh AS (
      SELECT doc_id, unnest({_D_4GRAMS}) AS s
      FROM splitd WHERE doc_id % 97 <> 0
    ),
    bsh AS (
      SELECT DISTINCT unnest({_D_4GRAMS}) AS s
      FROM splitd WHERE doc_id % 97 = 0
    )
    SELECT d.doc_id AS doc_id,
           COUNT(DISTINCT d.s) AS n_ngrams,
           COUNT(DISTINCT b.s) AS n_hits,
           COUNT(DISTINCT b.s) >= 1 AS contaminated
    FROM dsh d LEFT JOIN bsh b ON d.s = b.s
    GROUP BY d.doc_id
    """,
    doc="Benchmark decontamination (GPT-3-appendix-C-style): training docs "
    "(doc_id % 97 != 0) flagged by distinct word-4-gram overlap with the "
    "held-out benchmark slice (doc_id % 97 = 0). Spark side broadcasts the "
    "benchmark's DISTINCT 64-bit n-gram hashes — the corpus is scanned "
    "once, text never shuffles (pipeline/decontaminate.py). Oracle joins "
    "raw n-gram STRINGS, so a hash-collision divergence would surface as "
    "a mismatch.",
    tags=("pipeline", "text", "decontamination"),
)
def pl_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.pipeline.decontaminate import decontaminate

    docs = spark.table("documents")
    return decontaminate(
        docs.where(F.col("doc_id") % 97 != 0),
        docs.where(F.col("doc_id") % 97 == 0),
        n=4,
    )


@df_query(
    "pl_domain_mixture",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, source, {_duck_bucket('doc_id', 'mix0')} AS bk
      FROM documents
    )
    SELECT doc_id, source FROM b
    WHERE bk < (CASE WHEN source = 'src0' THEN 1000000
                     WHEN source = 'src1' THEN 600000
                     WHEN source = 'src2' THEN 200000
                     ELSE 50000 END)
    """,
    doc="Domain-mixture sampling (training-data recipe): per-source "
    "deterministic Bernoulli rates (src0 1.0 / src1 0.6 / src2 0.2 / "
    "others 0.05) as ONE codegen CASE filter fused into the scan — no "
    "join, no shuffle, no RNG (pipeline/sampling.py mixture_sample).",
    tags=("pipeline", "sampling"),
)
def pl_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.sampling import mixture_sample

    return mixture_sample(
        spark.table("documents"),
        "source",
        {"src0": 1.0, "src1": 0.6, "src2": 0.2},
        key_col="doc_id",
        default_rate=0.05,
    ).select("doc_id", "source")


@df_query(
    "pl_weighted_sample",
    oracle=f"""
    SELECT doc_id, n_chars FROM documents
    WHERE {_duck_bucket('doc_id', 'wb0')} <
          CAST(floor(least(CAST(n_chars AS DOUBLE) * 0.0005, 1.0) * 1000000) AS BIGINT)
    """,
    doc="Weighted (importance) sampling: keep-probability proportional "
    "to document length, min(1, 5e-4 * n_chars), as a deterministic "
    "hash-Bernoulli draw — zero shuffle, no RNG, and only IEEE ops "
    "(no libm pow/ln) so the draw is bit-identical across engines "
    "(pipeline/sampling.py weighted_bernoulli_sample).",
    tags=("pipeline", "sampling"),
)
def pl_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.sampling import weighted_bernoulli_sample

    return weighted_bernoulli_sample(
        spark.table("documents"), "n_chars", 0.0005, key_col="doc_id"
    ).select("doc_id", "n_chars")


# ---------------------------------------------------------------------------
# Repetition / vocabulary / per-domain curation
# ---------------------------------------------------------------------------


@df_query(
    "pl_repetition_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_D_NORM.format(c='text')} AS norm FROM documents),
    w AS (SELECT doc_id, string_split(norm, ' ') AS w FROM t),
    g AS (
      SELECT doc_id,
             [w[i] || ' ' || w[i+1] for i in range(1, len(w))] AS bi,
             [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
              for i in range(1, len(w) - 1)] AS tri
      FROM w
    )
    SELECT doc_id,
           CASE WHEN len(bi) > 0
                THEN 1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / len(bi)
                ELSE CAST(0.0 AS DOUBLE) END AS dup_bigram_ratio,
           CASE WHEN len(tri) > 0
                THEN 1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) / len(tri)
                ELSE CAST(0.0 AS DOUBLE) END AS dup_trigram_ratio,
           CASE WHEN len(bi) > 0
                THEN CAST(list_max(list_transform(list_distinct(bi),
                          x -> len(list_filter(bi, y -> y = x)))) AS DOUBLE)
                     / len(bi)
                ELSE CAST(0.0 AS DOUBLE) END AS top_bigram_frac
    FROM g
    """,
    doc="Gopher-style within-document repetition: duplicate bigram/"
    "trigram fractions and the top-bigram occupancy share — the n-gram-"
    "level complement to quality_signals' word-level distinct ratio. "
    "Pure array-lambda projection, zero shuffle "
    "(pipeline/text.py repetition_stats).",
    tags=("pipeline", "text", "quality"),
)
def pl_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.text import repetition_stats

    return repetition_stats(spark.table("documents"))


@df_query(
    "pl_vocab_topk",
    oracle=f"""
    WITH t AS (SELECT {_D_NORM.format(c='text')} AS norm FROM documents),
    w AS (SELECT unnest(string_split(norm, ' ')) AS word FROM t)
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n
    FROM w
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 50
    """,
    doc="Corpus vocabulary top-k: explode (flatMap, no shuffle) -> one "
    "word-keyed partial-agg shuffle (map-side combine collapses each "
    "partition to its distinct words; stopword skew lands in the "
    "combiner, not a hot reducer) -> TakeOrderedAndProject "
    "(pipeline/text.py vocab_topk).",
    tags=("pipeline", "text", "vocab"),
)
def pl_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.text import vocab_topk

    return vocab_topk(spark.table("documents"), k=50)


@df_query(
    "pl_quality_topk_per_domain",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, text, {_D_NORM.format(c='text')} AS norm
      FROM documents
    ),
    s AS (
      SELECT doc_id, source,
             CAST(len(list_distinct(string_split(norm, ' '))) AS DOUBLE)
               / len(string_split(norm, ' ')) * length(text) AS score
      FROM t
    ),
    r AS (
      SELECT doc_id, source, score,
             row_number() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id) AS rk
      FROM s
    )
    SELECT doc_id, source, score FROM r WHERE rk <= 3
    ORDER BY source, score DESC, doc_id
    """,
    doc="Per-domain curation quota: keep the 3 best documents per "
    "source by a lexical-diversity x length score — one window shuffle "
    "keyed by domain, doc_id tie-break for engine-reproducible "
    "selection (pipeline/quality.py select_top_k_per_group).",
    tags=("pipeline", "quality", "curation"),
)
def pl_quality_topk_per_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.quality import select_top_k_per_group
    from keenwa_spark.pipeline.dedup import normalized_text

    docs = spark.table("documents")
    norm = normalized_text("text")
    words = f"split({norm}, ' ')"
    scored = docs.selectExpr(
        "doc_id",
        "source",
        f"CAST(size(array_distinct({words})) AS DOUBLE) / size({words})"
        " * char_length(text) AS score",
    )
    top = select_top_k_per_group(scored, "source", "score", 3)
    return top.orderBy("source", F.desc("score"), "doc_id")


@df_query(
    "pl_ann_filtered_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, {_D_VEC_D} AS qv FROM embeddings WHERE vec_id < 10
    ),
    c AS (
      SELECT vec_id AS neighbor_id, {_D_VEC_D} AS cv
      FROM embeddings WHERE label = 3
    ),
    scored AS (
      SELECT query_id, neighbor_id, {_duck_cosine('qv', 'cv')} AS cos_sim
      FROM c, q WHERE query_id <> neighbor_id
    ),
    ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
      ) AS BIGINT) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
    """,
    doc="Filtered vector search: exact top-5 among label=3 vectors "
    "only. The metadata predicate applies BEFORE the broadcast join — "
    "it reaches the corpus scan (pushdown/pruning at scale) and the "
    "cosine folds never touch non-qualifying vectors; with a selective "
    "predicate this exact plan beats an approximate index over the "
    "full corpus (pipeline/similarity.py filtered_cosine_topk).",
    tags=("pipeline", "similarity", "ann"),
)
def pl_ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.similarity import filtered_cosine_topk

    emb = spark.table("embeddings")
    return filtered_cosine_topk(
        emb, emb.filter("vec_id < 10"), "label = 3", k=5
    )


@df_query(
    "pl_search_topk",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, unnest({_D_WORDS.format(c='text')}) AS term
      FROM documents
    ),
    tfc AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tf
      WHERE term IN ('join', 'spark', 'table')
      GROUP BY doc_id, term
    ),
    dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df_t FROM tfc GROUP BY term),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, tfc.term,
             tf * GREATEST((CAST(n_docs AS DOUBLE) - df_t + 0.5)
                           / (df_t + 0.5), CAST(0 AS DOUBLE)) AS score
      FROM tfc JOIN dft ON tfc.term = dft.term CROSS JOIN n
    ),
    agg AS (
      SELECT doc_id,
             list_sum(list_sort(list(score))) AS relevance,
             CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms_matched
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, relevance, n_terms_matched
    FROM agg ORDER BY relevance DESC, doc_id LIMIT 10
    """,
    doc="Lexical keyword search: top-10 documents for the query 'spark "
    "table join' by summed tf*idf_r. The term filter lands directly "
    "after the explode, so the corpus vocabulary is never shuffled — "
    "df_t over the filtered pairs is still exact for the query terms; "
    "per-doc relevance folds scores in sorted order (bit-identical to "
    "the DuckDB oracle) (pipeline/tfidf.py search_topk).",
    tags=("pipeline", "tfidf", "search"),
)
def pl_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.tfidf import search_topk

    return search_topk(spark.table("documents"), "spark table join", k=10)


@df_query(
    "pl_hybrid_search_rrf",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, unnest({_D_WORDS.format(c='text')}) AS term
      FROM documents
    ),
    tfc AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tf
      WHERE term IN ('join', 'spark', 'table')
      GROUP BY doc_id, term
    ),
    dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df_t FROM tfc GROUP BY term),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id,
             tf * GREATEST((CAST(n_docs AS DOUBLE) - df_t + 0.5)
                           / (df_t + 0.5), CAST(0 AS DOUBLE)) AS score
      FROM tfc JOIN dft ON tfc.term = dft.term CROSS JOIN n
    ),
    lex AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (
        ORDER BY list_sum(list_sort(list(score))) DESC, doc_id
      ) AS BIGINT) AS lrank
      FROM scored GROUP BY doc_id
      ORDER BY lrank LIMIT 50
    ),
    q AS (SELECT {_D_VEC_D} AS qv FROM embeddings WHERE vec_id = 0),
    c AS (SELECT vec_id, {_D_VEC_D} AS cv FROM embeddings WHERE vec_id < 500),
    vec AS (
      SELECT vec_id AS doc_id, CAST(ROW_NUMBER() OVER (
        ORDER BY {_duck_cosine('qv', 'cv')} DESC, vec_id
      ) AS BIGINT) AS vrank
      FROM c, q WHERE vec_id <> 0
      ORDER BY vrank LIMIT 50
    )
    SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
           COALESCE(1.0 / (60 + lrank), 0) + COALESCE(1.0 / (60 + vrank), 0)
             AS rrf,
           lrank, vrank
    FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
    ORDER BY rrf DESC, doc_id LIMIT 10
    """,
    doc="Hybrid retrieval: the lexical arm (tf-idf top-50 for 'spark "
    "table join') fused with the vector arm (cosine top-50 around "
    "vec_id 0, restricted to the doc-id range) by reciprocal-rank "
    "fusion 1/(60+rank) — rank-based exact rationals, so the fusion is "
    "bit-deterministic cross-engine. Both arms are bounded top-k "
    "DataFrames; the fusion is a full-outer join of two 50-row sides — "
    "driver-free, broadcast-size at any corpus scale.",
    tags=("pipeline", "search", "ann"),
)
def pl_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from keenwa_spark.pipeline.similarity import cosine_topk
    from keenwa_spark.pipeline.tfidf import search_topk

    docs = spark.table("documents")
    emb = spark.table("embeddings").where("vec_id < 500")
    lex = (
        search_topk(docs, "spark table join", k=50)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("relevance").desc(), F.col("doc_id")))
            .cast("bigint")
            .alias("lrank"),
        )
    )
    vec = (
        cosine_topk(emb, emb.where("vec_id = 0"), k=50)
        .select(F.col("neighbor_id").alias("doc_id"), F.col("rnk").alias("vrank"))
    )
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.coalesce(1.0 / (60 + F.col("lrank")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("vrank")), F.lit(0.0))
        ).alias("rrf"),
        "lrank",
        "vrank",
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(10)


@df_query(
    "pl_profile_columns",
    oracle="""
    SELECT 'o_custkey' AS col_name,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_custkey) AS DOUBLE) AS min_value,
           CAST(MAX(o_custkey) AS DOUBLE) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(MIN(o_totalprice) AS DOUBLE),
           CAST(MAX(o_totalprice) AS DOUBLE)
    FROM orders
    ORDER BY col_name
    """,
    doc="Column profiling (the ANALYZE-style data profile a pipeline "
    "runs before choosing layouts and join strategies): null count, "
    "exact distinct count, min/max per column in ONE aggregation pass "
    "+ a driver-free stack unpivot (pipeline/quality.py "
    "profile_columns). Feeds Catalog row-count/broadcast statistics.",
    tags=("pipeline", "profile", "stats"),
)
def pl_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.quality import profile_columns

    return profile_columns(
        spark.table("orders"), ["o_custkey", "o_totalprice"]
    ).orderBy("col_name")


@df_query(
    "pl_negative_samples",
    oracle="""
    WITH n AS (SELECT COUNT(DISTINCT doc_id) AS nn FROM documents),
    probes AS (SELECT unnest([0, 1, 2]) AS j),
    cand AS (
      SELECT d.doc_id, p.j, n.nn,
             (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
                 || CAST(p.j AS VARCHAR) || ':neg'), 1, 8))::BIGINT) % n.nn
               AS c
      FROM documents d CROSS JOIN n CROSS JOIN probes p
    )
    SELECT doc_id AS anchor_id,
           CAST(j AS BIGINT) AS j,
           CASE WHEN c = doc_id THEN (c + 1) % nn ELSE c END AS negative_id
    FROM cand
    WHERE CASE WHEN c = doc_id THEN (c + 1) % nn ELSE c END <> doc_id
    ORDER BY anchor_id, j
    """,
    doc="Deterministic negative sampling (contrastive-pair mining): 3 "
    "pseudo-random negatives per anchor from the portable md5 hash of "
    "(anchor, probe, salt) mod N — a zero-shuffle projection, "
    "reproducible across engines and runs (never a rand() corpus "
    "sort); self-collisions step to the adjacent id "
    "(pipeline/sampling.py negative_samples).",
    tags=("pipeline", "sampling", "contrastive"),
)
def pl_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.sampling import negative_samples

    return negative_samples(spark.table("documents"), k=3).select(
        "anchor_id", "j", "negative_id"
    ).orderBy("anchor_id", "j")


@df_query(
    "pl_fuzzy_decontaminate",
    oracle=f"""
    WITH {_duck_docs_cte()},
    {_duck_minhash_sig()},
    bands AS (
      {" UNION ALL ".join(
        "SELECT doc_id, " + str(b) + " AS band, "
        + " || '-' || ".join(
            "CAST(mh" + str(b * 3 + r) + " AS VARCHAR)" for r in range(3)
        )
        + " AS bkey FROM sig"
        for b in range(4)
      )}
    ),
    eval_keys AS (
      SELECT DISTINCT band, bkey FROM bands WHERE doc_id % 97 = 0
    ),
    corpus AS (SELECT * FROM bands WHERE doc_id % 97 <> 0)
    SELECT c.doc_id,
           CAST(SUM(CASE WHEN e.bkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_band_hits,
           SUM(CASE WHEN e.bkey IS NOT NULL THEN 1 ELSE 0 END) >= 1
             AS contaminated
    FROM corpus c
    LEFT JOIN eval_keys e ON c.band = e.band AND c.bkey = e.bkey
    GROUP BY c.doc_id
    """,
    doc="Fuzzy (near-duplicate) decontamination: training docs flagged "
    "when their MinHash signature agrees with any benchmark doc on a "
    "full LSH band — the paraphrase-tolerant complement to "
    "pl_decontaminate's exact n-gram overlap. Benchmark reduces to "
    "DISTINCT broadcast (band, key) rows; corpus text never shuffles "
    "(pipeline/decontaminate.py fuzzy_decontaminate).",
    tags=("pipeline", "dedup", "decontamination"),
)
def pl_fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.decontaminate import fuzzy_decontaminate

    docs = spark.table("documents")
    return fuzzy_decontaminate(
        docs.where(F.col("doc_id") % 97 != 0),
        docs.where(F.col("doc_id") % 97 == 0),
    )


def _duck_bloom_sql(m_bits: int = 4096, k: int = 4) -> str:
    """Exact DuckDB replay of the Bloom build + dense probe: same
    frozen md5-affine positions, same 32-bit word packing, so the
    deterministic false-positive set matches bit for bit."""
    from keenwa_spark.pipeline.bloom import WORD_BITS, _position_exprs

    pos_list = ", ".join(_position_exprs("h", m_bits, k))
    return f"""
    WITH splitd AS (
      SELECT doc_id, {_D_WORDS.format(c='text')} AS w FROM documents
    ),
    dsh AS (
      SELECT DISTINCT doc_id, {duck_hash64('s')} AS h
      FROM (SELECT doc_id, unnest({_D_4GRAMS}) AS s
            FROM splitd WHERE doc_id % 97 <> 0)
    ),
    bh AS (
      SELECT DISTINCT {duck_hash64('s')} AS h
      FROM (SELECT unnest({_D_4GRAMS}) AS s
            FROM splitd WHERE doc_id % 97 = 0)
    ),
    bpos AS (SELECT DISTINCT unnest([{pos_list}]) AS pos FROM bh),
    wrds AS (
      SELECT pos // {WORD_BITS} AS word_idx,
             bit_or(1::BIGINT << (pos % {WORD_BITS})::INT) AS word_val
      FROM bpos GROUP BY 1
    ),
    ppos AS (SELECT doc_id, h, unnest([{pos_list}]) AS pos FROM dsh),
    pmem AS (
      SELECT p.doc_id, p.h,
             bool_and(w.word_val IS NOT NULL AND
                      ((w.word_val >> (p.pos % {WORD_BITS})::INT) & 1) = 1)
               AS member
      FROM ppos p LEFT JOIN wrds w ON p.pos // {WORD_BITS} = w.word_idx
      GROUP BY p.doc_id, p.h
    )
    SELECT doc_id,
           COUNT(*) AS n_ngrams,
           COUNT(*) FILTER (WHERE member) AS n_flagged,
           COUNT(*) FILTER (WHERE member) >= 1 AS contaminated
    FROM pmem GROUP BY doc_id
    """


@df_query(
    "pl_bloom_decontaminate",
    oracle=_duck_bloom_sql(),
    doc="Bloom-filtered decontamination: benchmark word-4-grams folded "
    "into a 4096-bit / 4-hash Bloom filter (one mergeable bit_or agg); "
    "training docs probed by a pure codegen projection over the dense "
    "broadcast word array — zero joins, one doc_id aggregation, the "
    "corpus never shuffles on text. Zero false negatives by "
    "construction; the false-positive set is deterministic (frozen "
    "md5-affine hash family) and the oracle replays build AND probe "
    "exactly, FPs included (pipeline/bloom.py).",
    tags=("pipeline", "text", "decontamination", "sketch"),
)
def pl_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.bloom import bloom_decontaminate

    docs = spark.table("documents")
    return bloom_decontaminate(
        docs.where(F.col("doc_id") % 97 != 0),
        docs.where(F.col("doc_id") % 97 == 0),
        n=4,
    )


@df_query(
    "pl_seeded_shuffle",
    oracle=f"""
    WITH k AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'shuf0'), 1, 8))::BIGINT
               AS hk
      FROM documents
    ),
    p AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY hk ASC, doc_id ASC) - 1 AS position
      FROM k
    )
    SELECT doc_id, position, CAST(position % 8 AS BIGINT) AS shard
    FROM p
    """,
    doc="Deterministic corpus shuffle for training order: every doc "
    "gets a seeded pseudo-random GLOBAL position (hash order made "
    "total by the id tie-break) and a round-robin shard — the 'shuffle "
    "your corpus, reproducibly' step every training run needs, stable "
    "across runs, engines and cluster layouts. The global row number "
    "is the TWO-PASS range-bucket operator (operators/ordered.py), "
    "never a single-partition window; round-robin sharding balances "
    "shard sizes exactly (+-1) where hash-mod sharding only balances "
    "in expectation.",
    tags=("pipeline", "sampling", "ordering"),
)
def pl_seeded_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.ordered import with_global_row_number
    from keenwa_spark.pipeline.hashing import spark_hash64

    keyed = spark.table("documents").select(
        "doc_id",
        F.expr(
            spark_hash64("concat(CAST(doc_id AS STRING), 'shuf0')")
        ).alias("hk"),
    )
    pos = with_global_row_number(
        keyed, order_by=["hk", "doc_id"], bucket_col="hk", out_col="position"
    )
    return pos.select(
        "doc_id",
        (F.col("position") - 1).alias("position"),
        ((F.col("position") - 1) % 8).alias("shard"),
    )


@df_query(
    "pl_feature_hash",
    oracle=f"""
    WITH tokf AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id,
               unnest(string_split({_D_NORM.format(c='text')}, ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    h AS (SELECT doc_id, {duck_hash64('tok')} AS h FROM tokf),
    agg AS (
      SELECT doc_id, h % 16 AS dim,
             SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS w
      FROM h GROUP BY 1, 2
    )
    SELECT doc_id, CAST(dim AS INT) AS dim, CAST(w AS DOUBLE) AS w
    FROM agg WHERE w <> 0
    """,
    doc="Hashing-trick bag-of-words features (Weinberger et al. 2009): "
    "each token hashed into one of 16 buckets with a sign bit so "
    "collisions cancel in expectation — fixed-width vectors with NO "
    "vocabulary state, a pure zero-shuffle per-row projection at any "
    "corpus size. The registry row posexplodes the dense vector to "
    "(doc, dim, weight) long form for the compare; the dense "
    "array<double> output plugs straight into the ANN stack "
    "(pipeline/features.py feature_hash_vectors).",
    tags=("pipeline", "text", "features"),
)
def pl_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.features import feature_hash_vectors

    vecs = feature_hash_vectors(spark.table("documents"), dim=16)
    return (
        vecs.select(
            "doc_id", F.posexplode("fvec").alias("dim", "w")
        )
        .where(F.col("w") != 0)
        .select("doc_id", F.col("dim").cast("int").alias("dim"), "w")
    )


@df_query(
    "pl_semantic_decontaminate",
    oracle=f"""
    WITH t AS (SELECT vec_id, {_D_VEC_D} AS tv FROM embeddings
               WHERE vec_id % 97 <> 0),
    b AS (SELECT {_D_VEC_D} AS bv FROM embeddings WHERE vec_id % 97 = 0),
    scored AS (
      SELECT t.vec_id, {_duck_safe_cosine('tv', 'bv')} AS sim FROM t, b
    )
    SELECT vec_id,
           COUNT(*) FILTER (WHERE sim >= 0.3) AS n_hits,
           MAX(sim) AS max_sim,
           COUNT(*) FILTER (WHERE sim >= 0.3) >= 1 AS contaminated
    FROM scored GROUP BY vec_id
    """,
    doc="Embedding-space decontamination: training vectors flagged when "
    "cosine to ANY benchmark vector (vec_id % 97 = 0) reaches 0.3 (the fixture's clustered-noise similarity range tops out at ~0.47) — the "
    "paraphrase/translation-tolerant complement to the n-gram and "
    "MinHash-band checks, which miss semantically-equivalent rewrites "
    "sharing no surface form. Benchmark broadcast, corpus scanned once "
    "through codegen fold cosines (order-independent MAX keeps it "
    "oracle-exact); compose with sign-LSH bucketing for very large "
    "eval sets (pipeline/similarity.py semantic_decontaminate).",
    tags=("pipeline", "similarity", "decontamination"),
)
def pl_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.similarity import semantic_decontaminate

    emb = spark.table("embeddings")
    return semantic_decontaminate(
        emb.where(F.col("vec_id") % 97 != 0),
        emb.where(F.col("vec_id") % 97 == 0),
        threshold=0.3,
    )


def _duck_bpe_ctes(
    rounds: int = 4, source: str = "documents", text_col: str = "text"
) -> str:
    """The chained-CTE DuckDB replay of the full BPE training loop: per
    round, pair counts over the current vocab segmentation, a 1-row
    argmax, and the same fixed-pass pipe-delimited merge replace
    (pipeline/bpe.py MERGE_PASSES). Ends with best1..best{rounds}.
    ``source``/``text_col`` are parameterized so the randomized
    corpora of the text fuzzer can replay the same loop inline."""
    from keenwa_spark.pipeline.bpe import MERGE_PASSES

    norm = _D_NORM.format(c=text_col)
    syms = "list_filter(string_split(enc, '|'), x -> x <> '')"
    ctes = [
        f"""wf AS (
      SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest(string_split({norm}, ' ')) AS word FROM {source}
      ) WHERE regexp_matches(word, '^[a-z]+$')
      GROUP BY word
    ),
    enc0 AS (
      SELECT regexp_replace(word, '(.)', '|\\1', 'g') || '|' AS enc, cnt
      FROM wf
    )"""
    ]
    for r in range(1, rounds + 1):
        prev = f"enc{r - 1}"
        pat = f"(SELECT '|' || l || '|' || r || '|' FROM best{r})"
        rep = f"(SELECT '|' || l || r || '|' FROM best{r})"
        merged = "enc"
        for _ in range(MERGE_PASSES):
            merged = f"replace({merged}, {pat}, {rep})"
        ctes.append(
            f"""pairs{r} AS MATERIALIZED (
      SELECT u.l AS l, u.r AS r, SUM(cnt) AS n FROM (
        SELECT unnest([{{'l': s[i], 'r': s[i+1]}}
                       for i in range(1, len(s))]) AS u, cnt
        FROM (SELECT {syms} AS s, cnt FROM {prev}) WHERE len(s) >= 2
      ) GROUP BY 1, 2
    ),
    best{r} AS MATERIALIZED (
      SELECT l, r, n FROM pairs{r} ORDER BY n DESC, l ASC, r ASC LIMIT 1
    ),
    enc{r} AS MATERIALIZED (
      SELECT {merged} AS enc, cnt FROM {prev}
    )"""
        )
    return "WITH " + ",\n    ".join(ctes)


def _duck_bpe_sql(rounds: int = 4) -> str:
    """Training-loop oracle: the learned merge table."""
    arms = "\n      UNION ALL ".join(
        f"SELECT {r} AS round, l AS left_sym, r AS right_sym, "
        f"l || r AS merged, CAST(n AS BIGINT) AS pair_count FROM best{r}"
        for r in range(1, rounds + 1)
    )
    return (
        _duck_bpe_ctes(rounds)
        + f"\n    SELECT * FROM (\n      {arms}\n    ) ORDER BY round"
    )


def _duck_bpe_encode_sql(rounds: int = 4) -> str:
    """Tokenizer-application oracle: re-learn the merges (same CTEs),
    then apply them in round order to every word of every doc. An
    early-exhausted round (empty best{r}) must be a no-op, matching the
    engine's early stop — COALESCE to a chr(1) sentinel pattern that
    never occurs in ^[a-z]+$ text."""
    from keenwa_spark.pipeline.bpe import MERGE_PASSES

    norm = _D_NORM.format(c="text")
    enc = "regexp_replace(word, '(.)', '|\\1', 'g') || '|'"
    for r in range(1, rounds + 1):
        pat = f"COALESCE((SELECT '|' || l || '|' || r || '|' FROM best{r}), chr(1))"
        rep = f"COALESCE((SELECT '|' || l || r || '|' FROM best{r}), chr(1))"
        for _ in range(MERGE_PASSES):
            enc = f"replace({enc}, {pat}, {rep})"
    return (
        _duck_bpe_ctes(rounds)
        + f""",
    dwords AS (
      SELECT doc_id, word FROM (
        SELECT doc_id, unnest(string_split({norm}, ' ')) AS word
        FROM documents
      ) WHERE regexp_matches(word, '^[a-z]+$')
    )
    SELECT doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(len(word)) AS BIGINT) AS n_chars,
           CAST(SUM(len(list_filter(string_split({enc}, '|'),
                                    x -> x <> ''))) AS BIGINT) AS n_tokens
    FROM dwords GROUP BY doc_id
    """
    )


@df_query(
    "pl_bpe_merge_rounds",
    oracle=_duck_bpe_sql(),
    doc="BPE tokenizer-merge learning (Sennrich et al. 2016): 4 rounds "
    "of most-frequent-adjacent-pair fusion, trained on the WORD "
    "FREQUENCY table so iteration state is vocabulary-sized at any "
    "corpus size (the one corpus-sized job is the initial word count). "
    "Deterministic argmax (count DESC, pair ASC), fixed-pass "
    "pipe-delimited merges, exact integer counts end to end — the "
    "oracle replays the ENTIRE training loop as one chained-CTE SQL "
    "statement, per-round argmax included (pipeline/bpe.py bpe_train). "
    "Driver state: one collected argmax row per round.",
    tags=("pipeline", "text", "tokenizer"),
)
def pl_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.bpe import bpe_merge_table

    return bpe_merge_table(spark.table("documents"), rounds=4)


@df_query(
    "pl_bpe_encode",
    oracle=_duck_bpe_encode_sql(),
    doc="BPE tokenizer APPLICATION: learn 4 merges (pl_bpe_merge_rounds' "
    "loop), then encode every word of every doc with them in round "
    "order — a pure codegen replace-chain projection plus ONE doc "
    "aggregation; the corpus is scanned once and never joins. Output "
    "per doc: alpha words, pre-merge symbols (chars) and post-merge "
    "symbols — the compression the learned vocab buys. Oracle re-learns "
    "the merges in the same chained CTEs and applies them identically "
    "(pipeline/bpe.py bpe_encode).",
    tags=("pipeline", "text", "tokenizer"),
)
def pl_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.bpe import bpe_encode, bpe_train

    docs = spark.table("documents")
    merges = [(m[1], m[2]) for m in bpe_train(docs, rounds=4)]
    return bpe_encode(docs, merges)


@df_query(
    "pl_token_vote_classify",
    oracle=f"""
    WITH tokf AS (
      SELECT doc_id, lang, tok FROM (
        SELECT doc_id, lang,
               unnest(string_split({_D_NORM.format(c='text')}, ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    counts AS (
      SELECT tok, lang, COUNT(*) AS n FROM tokf
      WHERE doc_id % 3 <> 0 GROUP BY 1, 2
    ),
    model AS (
      SELECT tok, lang AS pred_label FROM (
        SELECT tok, lang,
               ROW_NUMBER() OVER (PARTITION BY tok
                                  ORDER BY n DESC, lang ASC) AS rk
        FROM counts
      ) WHERE rk = 1
    ),
    votes AS (
      SELECT t.doc_id, m.pred_label, COUNT(*) AS n_votes
      FROM tokf t JOIN model m USING (tok)
      WHERE t.doc_id % 3 = 0
      GROUP BY 1, 2
    ),
    pred AS (
      SELECT doc_id, pred_label AS predicted FROM (
        SELECT doc_id, pred_label,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY n_votes DESC, pred_label ASC) AS rk
        FROM votes
      ) WHERE rk = 1
    )
    SELECT d.doc_id, d.lang, p.predicted,
           p.predicted IS NOT DISTINCT FROM d.lang AS correct
    FROM documents d LEFT JOIN pred p USING (doc_id)
    WHERE d.doc_id % 3 = 0
    """,
    doc="Supervised token-profile classifier (fastText/CCNet lineage, "
    "integer-exact): per-token class counts from the labeled 2/3 train "
    "slice, each token voting its count-argmax class; test docs take "
    "the majority vote (deterministic tie-breaks, NULL abstain for "
    "out-of-vocabulary docs, null-safe correctness flag). Training is "
    "one agg + one vocab-bounded window argmax; inference is one token "
    "join + one doc agg — the model never touches the driver. Exact "
    "integer decisions end to end, so the oracle replays the full "
    "train+infer pipeline (pipeline/classify.py).",
    tags=("pipeline", "text", "classify"),
)
def pl_token_vote_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.classify import classify_eval

    return classify_eval(
        spark.table("documents"), F.col("doc_id") % 3 != 0, label_col="lang"
    )


def _duck_decon_panel_sql() -> str:
    """Join the exact, Bloom, and fuzzy decontamination oracles into
    one per-doc panel. Each arm is a full WITH-query, legal as a
    parenthesized derived table in both engines. Docs with >= 4 words
    appear in the exact/bloom arms and always have a MinHash signature
    (>= 3 words), so the fuzzy arm joins LEFT only for safety on the
    n-gram-less boundary."""
    exact = REGISTRY["pl_decontaminate"].oracle
    bloom = REGISTRY["pl_bloom_decontaminate"].oracle
    fuzzy = REGISTRY["pl_fuzzy_decontaminate"].oracle
    return f"""
    SELECT e.doc_id,
           e.n_hits,
           b.n_flagged,
           COALESCE(f.n_band_hits, 0) AS n_band_hits,
           (e.n_hits >= 1 OR b.n_flagged >= 1
            OR COALESCE(f.n_band_hits, 0) >= 1) AS any_contaminated
    FROM ({exact}) e
    JOIN ({bloom}) b USING (doc_id)
    LEFT JOIN ({fuzzy}) f USING (doc_id)
    """


@df_query(
    "pl_decontamination_panel",
    oracle=None,  # set right after registration (needs REGISTRY rows)
    doc="The decontamination PANEL: exact n-gram overlap, Bloom-filtered "
    "probe, and MinHash-band fuzzy match joined into one per-doc "
    "report with a combined any_contaminated verdict — the production "
    "shape (run the cheap probabilistic screens, keep the exact "
    "counts for audit; bloom n_flagged >= exact n_hits by "
    "construction). One plan, three arms over one corpus scan family; "
    "oracle is the three registry oracles joined "
    "(queries/pipeline.py _duck_decon_panel_sql).",
    tags=("pipeline", "text", "decontamination"),
)
def pl_decontamination_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.bloom import bloom_decontaminate
    from keenwa_spark.pipeline.decontaminate import (
        decontaminate,
        fuzzy_decontaminate,
    )

    docs = spark.table("documents")
    train = docs.where(F.col("doc_id") % 97 != 0)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    e = decontaminate(train, bench, n=4).select("doc_id", "n_hits")
    b = bloom_decontaminate(train, bench, n=4).select("doc_id", "n_flagged")
    f = fuzzy_decontaminate(train, bench).select("doc_id", "n_band_hits")
    return (
        e.join(b, "doc_id")
        .join(f, "doc_id", "left")
        .select(
            "doc_id",
            "n_hits",
            "n_flagged",
            F.coalesce(F.col("n_band_hits"), F.lit(0)).alias("n_band_hits"),
            (
                (F.col("n_hits") >= 1)
                | (F.col("n_flagged") >= 1)
                | (F.coalesce(F.col("n_band_hits"), F.lit(0)) >= 1)
            ).alias("any_contaminated"),
        )
    )


REGISTRY["pl_decontamination_panel"].oracle = _duck_decon_panel_sql()


@df_query(
    "pl_group_split",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, source, {_duck_bucket('source', 'gsplit0')} AS bk
      FROM documents
    )
    SELECT doc_id, source,
           CASE WHEN bk < 800000 THEN 'train'
                WHEN bk < 1000000 THEN 'test' END AS split
    FROM b
    WHERE bk < 1000000
    ORDER BY doc_id
    """,
    doc="Group-aware (leakage-safe) splits: the hash key is the SOURCE "
    "domain, not the doc id, so every document of a source lands in "
    "the same split — near-duplicates and templated content within a "
    "domain can never straddle train/test (the classic contamination "
    "path of row-wise splits). Same zero-shuffle deterministic bucket "
    "math as hash_split (pipeline/sampling.py), keyed by group. A NULL "
    "group key hashes to a NULL bucket and is dropped (hash_split's "
    "documented split-IS-NULL filter; oracle's WHERE replays it).",
    tags=("pipeline", "sampling", "splits"),
)
def pl_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.sampling import hash_split

    return hash_split(
        spark.table("documents"), "source",
        {"train": 0.8, "test": 0.2}, salt="gsplit0",
    ).select("doc_id", "source", "split").orderBy("doc_id")


@df_query(
    "pl_incremental_dedup",
    oracle=f"""
    WITH old AS (
      SELECT DISTINCT md5({_D_NORM.format(c='text')}) AS h
      FROM documents WHERE doc_id < 250
    ),
    new_docs AS (
      SELECT doc_id, md5({_D_NORM.format(c='text')}) AS h
      FROM documents WHERE doc_id >= 250
    )
    SELECT n.doc_id
    FROM new_docs n LEFT JOIN old o ON n.h = o.h
    WHERE o.h IS NULL
    ORDER BY n.doc_id
    """,
    doc="Incremental exact dedup: the arriving batch (doc_id >= 250) "
    "anti-joined on content digest against the persisted corpus state "
    "(digests of doc_id < 250) — corpus TEXT is never re-read; the "
    "state side is 16 bytes/doc and typically broadcast "
    "(operators/incremental.py incremental_exact_dedup).",
    tags=("pipeline", "dedup", "incremental"),
)
def pl_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.incremental import incremental_exact_dedup
    from keenwa_spark.pipeline.dedup import normalized_text

    docs = spark.table("documents")
    known = docs.where("doc_id < 250").select(
        F.expr(f"md5({normalized_text('text')})").alias("content_hash")
    ).distinct()
    return (
        incremental_exact_dedup(docs.where("doc_id >= 250"), known)
        .select("doc_id")
        .orderBy("doc_id")
    )


@df_query(
    "op_salted_join",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    ORDER BY e.event_id
    """,
    doc="Skew-salted join equals the plain join (the oracle IS the "
    "plain join): the big side scatters each key across 16 "
    "deterministic sub-keys, the small side replicates per salt, and "
    "the (key, salt) equi-join reassembles exactly the unsalted "
    "result — proving salting is purely a physical rebalance "
    "(operators/skew.py salted_join; hot-key splitting rationale in "
    "its module doc).",
    tags=("operator", "skew", "join"),
)
def op_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.skew import salted_join

    events = spark.table("events").where("event_type = 'purchase'")
    customers = spark.table("customer").select("c_custkey", "c_name")
    return (
        salted_join(
            events, customers.withColumnRenamed("c_custkey", "user_id"),
            on="user_id", salts=16,
        )
        .select("event_id", "user_id", "c_name")
        .orderBy("event_id")
    )


@df_query(
    "op_skew_report",
    oracle="""
    WITH counts AS (
      SELECT o_custkey AS key, COUNT(*) AS key_count
      FROM orders GROUP BY o_custkey
    ),
    summary AS (
      SELECT COUNT(*) AS n_keys,
             SUM(key_count) AS n_rows,
             MAX(key_count) AS max_count,
             quantile_cont(key_count, 0.5) AS p50_count,
             quantile_cont(key_count, 0.99) AS p99_count
      FROM counts
    ),
    top AS (
      SELECT key, key_count,
             CAST(ROW_NUMBER() OVER (ORDER BY key_count DESC, key) AS BIGINT)
               AS rnk
      FROM counts ORDER BY key_count DESC, key LIMIT 5
    )
    SELECT rnk, key, key_count,
           CAST(key_count AS DOUBLE) / n_rows AS share,
           n_keys, max_count, p50_count, p99_count,
           max_count / p50_count AS max_over_p50
    FROM top CROSS JOIN summary
    ORDER BY rnk
    """,
    doc="Join-key skew diagnostics: per-key count distribution "
    "(n_keys, max/p50/p99) + top-5 heavy hitters with their share — "
    "the measurement that decides when op_salted_join/AQE skew-join "
    "is warranted. One map-side-combinable count per key + a "
    "distributed top-k (TakeOrderedAndProject, never a global window "
    "over all keys); exact percentiles are the cross-engine-verified "
    "percentile/quantile_cont pair (operators/skew.py skew_report).",
    tags=("operator", "skew", "diagnostics"),
)
def op_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.skew import skew_report

    return skew_report(spark.table("orders"), key_col="o_custkey", top_k=5)


@df_query(
    "pl_winsorize",
    oracle="""
    WITH bounds AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS q_lo,
             quantile_cont(value, 0.95) AS q_hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           LEAST(GREATEST(CAST(e.value AS DOUBLE), b.q_lo), b.q_hi)
             AS value_w,
           b.q_lo, b.q_hi
    FROM events e JOIN bounds b ON e.event_type = b.event_type
    ORDER BY e.event_id
    """,
    doc="Per-group winsorization: clamp each event's value to its "
    "event_type's exact [p05, p95] — the outlier treatment a numeric "
    "feature needs before feeding training or sampling weights. One "
    "group-aggregate for the bounds (exact percentile == DuckDB "
    "quantile_cont, the verified pair) + a broadcast join-back; at "
    "100 TB approx_percentile drops the per-group sort with the same "
    "plan shape (pipeline/quality.py winsorize).",
    tags=("pipeline", "quality", "winsorize"),
)
def pl_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.quality import winsorize

    events = spark.table("events")
    out = winsorize(
        events, value_col="value", group_col="event_type",
        lower_q=0.05, upper_q=0.95,
    )
    return out.select(
        "event_id", "event_type", "value", "value_w", "q_lo", "q_hi"
    ).orderBy("event_id")


@df_query(
    "pl_feature_scale",
    oracle="""
    WITH md AS (
      SELECT event_type,
             COUNT(value) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS s1d,
             SUM(CAST(value AS DECIMAL(18,6))
                 * CAST(value AS DECIMAL(18,6))) AS s2d
      FROM events GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n,
             (CAST(FLOOR(s1d) AS DOUBLE)
              + CAST((s1d - FLOOR(s1d)) * 1000000 AS BIGINT)
                / CAST(1000000 AS DOUBLE)) AS s1,
             (CAST(FLOOR(s2d) AS DOUBLE)
              + CAST((s2d - FLOOR(s2d)) * 1000000000000 AS BIGINT)
                / CAST(1000000000000 AS DOUBLE)) AS s2
      FROM md
    )
    SELECT e.event_id, e.event_type, e.value,
           m.s1 / m.n AS mean,
           CASE WHEN m.n > 1
                THEN sqrt((m.s2 - m.s1 * m.s1 / m.n) / (m.n - 1))
           END AS stddev,
           CASE WHEN m.n > 1
                 AND sqrt((m.s2 - m.s1 * m.s1 / m.n) / (m.n - 1)) > 0
                THEN (CAST(e.value AS DOUBLE) - m.s1 / m.n)
                     / sqrt((m.s2 - m.s1 * m.s1 / m.n) / (m.n - 1))
           END AS value_z
    FROM events e JOIN m ON e.event_type = m.event_type
    ORDER BY e.event_id
    """,
    doc="Per-group z-score standardization of a numeric feature: "
    "moments as EXACT decimal sums (order-independent at any "
    "partitioning — built-in stddev's double streaming accumulation "
    "is not hash-verifiable), crossed into double via the SPLIT cast "
    "(integer part + exact scale-fraction BIGINT / 1e12 — a direct "
    "high-scale decimal->double CAST rounds differently per engine, "
    "measured 1-ulp on SUM(x*x)), broadcast joined-back; "
    "zero-variance groups yield NULL z "
    "(pipeline/quality.py zscore_scale).",
    tags=("pipeline", "quality", "scaling"),
)
def pl_feature_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.quality import zscore_scale

    out = zscore_scale(spark.table("events"), value_col="value", group_col="event_type")
    return out.select(
        "event_id", "event_type", "value", "mean", "stddev", "value_z"
    ).orderBy("event_id")


@df_query(
    "pl_chunk_pack_pipeline",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split({_D_NORM.format(c='text')}, ' ') AS w
      FROM documents WHERE len(trim(text)) > 0
    ),
    chunks AS (
      SELECT doc_id,
             unnest(generate_series(0, (len(w) - 1) // 24)) AS chunk_id,
             w
      FROM w
    ),
    units AS (
      SELECT doc_id * 100 + chunk_id AS cid,
             CAST(len(w[chunk_id * 24 + 1 : chunk_id * 24 + 32]) AS BIGINT)
               AS n_tokens
      FROM chunks
    ),
    cum AS (
      SELECT cid, cid % 8 AS shard, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY cid % 8 ORDER BY cid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_after
      FROM units
    ),
    spans AS (
      SELECT *, cum_after - n_tokens AS cum_before,
             unnest(generate_series(
               CAST((cum_after - n_tokens) // 128 AS BIGINT),
               CAST((cum_after - 1) // 128 AS BIGINT))) AS win
      FROM cum
    )
    SELECT cid, shard,
           shard * {1 << 40} + win AS seq_id,
           win,
           GREATEST(0, win * 128 - cum_before) AS tok_start,
           LEAST(n_tokens, (win + 1) * 128 - cum_before) AS tok_end,
           n_tokens
    FROM spans
    """,
    doc="End-to-end chunk-then-pack: sliding-window 32-token chunks "
    "(8-token overlap) become the packing units, concatenated in "
    "deterministic (chunk-id) order within 8 shards and cut into "
    "fixed 128-token training sequences — the RAG-style tokenize -> "
    "chunk -> pack path as ONE declarative plan: a zero-shuffle chunk "
    "explode feeding pack's single windowed cumsum shuffle "
    "(pipeline/packing.py chunk_documents + pack_training_sequences).",
    tags=("pipeline", "packing", "composition"),
)
def pl_chunk_pack_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.packing import (
        chunk_documents,
        pack_training_sequences,
    )

    chunks = chunk_documents(
        spark.table("documents"), chunk_tokens=32, overlap=8
    ).selectExpr("doc_id * 100 + chunk_id AS cid", "chunk_text")
    return pack_training_sequences(
        chunks, seq_len=128, n_shards=8, id_col="cid", text_col="chunk_text"
    )


@df_query(
    "pl_chunk_pack_fused",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, doc_id % 8 AS shard,
             CAST(len(string_split({_D_NORM.format(c='text')}, ' '))
                  AS BIGINT) AS nt
      FROM documents WHERE len(trim(text)) > 0
    ),
    chunks AS (
      SELECT doc_id, shard, nt,
             unnest(generate_series(CAST(0 AS BIGINT), (nt - 1) // 24))
               AS chunk_id
      FROM docs
    ),
    sized AS (
      SELECT doc_id, shard, chunk_id,
             CAST(LEAST(32, nt - chunk_id * 24) AS BIGINT) AS n_chunk_tokens
      FROM chunks
    ),
    cum AS (
      SELECT *, CAST(SUM(n_chunk_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id, chunk_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_after
      FROM sized
    ),
    spans AS (
      SELECT *, cum_after - n_chunk_tokens AS cum_before,
             unnest(generate_series(
               CAST((cum_after - n_chunk_tokens) // 128 AS BIGINT),
               CAST((cum_after - 1) // 128 AS BIGINT))) AS win
      FROM cum
    )
    SELECT doc_id, chunk_id, shard,
           shard * {1 << 40} + win AS seq_id,
           win,
           GREATEST(0, win * 128 - cum_before) AS tok_start,
           LEAST(n_chunk_tokens, (win + 1) * 128 - cum_before) AS tok_end,
           n_chunk_tokens
    FROM spans
    """,
    doc="FUSED chunk -> pack (VERDICT r05 item 7, pipeline/packing.py "
    "chunk_and_pack): same tokenize -> chunk -> pack semantics as "
    "pl_chunk_pack_pipeline but as ONE operator sharing a doc-derived "
    "shard key — the single Exchange moves DOC-level rows before the "
    "chunk explode (already satisfying the packing window's "
    "distribution), and chunk token counts are computed arithmetically "
    "(min(chunk_tokens, n - i*stride)) so chunk text is never "
    "materialized: integer math end-to-end.",
    tags=("pipeline", "packing", "composition", "fused"),
)
def pl_chunk_pack_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.packing import chunk_and_pack

    return chunk_and_pack(
        spark.table("documents"),
        chunk_tokens=32,
        overlap=8,
        seq_len=128,
        n_shards=8,
    )


@df_query(
    "pl_lsh_verified_pairs",
    oracle=f"""
    WITH {_duck_lsh_pair_ctes()},
    sets AS (SELECT DISTINCT doc_id, h AS sh FROM hashed),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sets GROUP BY doc_id),
    inter AS (
      SELECT p.id_a, p.id_b, COUNT(*) AS n_inter
      FROM lsh_pairs p
      JOIN sets a ON a.doc_id = p.id_a
      JOIN sets b ON b.doc_id = p.id_b AND a.sh = b.sh
      GROUP BY p.id_a, p.id_b
    )
    SELECT i.id_a, i.id_b,
           CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter)
             AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter)
          >= 0.5
    """,
    doc="The production near-dup path in one plan: banded-LSH "
    "candidates VERIFIED by exact 3-gram Jaccard >= 0.5 — candidate-"
    "local verification (per-doc shingle-hash arrays joined to the "
    "small pair list, array_intersect per pair), so the corpus is "
    "never all-paired and no full Jaccard index is built "
    "(pipeline/dedup.py lsh_verified_pairs).",
    tags=("pipeline", "dedup", "composition"),
)
def pl_lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.dedup import lsh_verified_pairs

    return lsh_verified_pairs(spark.table("documents"), threshold=0.5)


@df_query(
    "pl_value_histogram",
    oracle="""
    WITH binned AS (
      SELECT LEAST(19, CAST(FLOOR((value - 0.0) / 25.0) AS BIGINT)) AS bin
      FROM events
      WHERE value IS NOT NULL AND value >= 0.0 AND value <= 500.0
    ),
    counts AS (SELECT bin, COUNT(*) AS n FROM binned GROUP BY bin),
    spine AS (SELECT unnest(generate_series(0, 19)) AS bin)
    SELECT s.bin,
           0.0 + s.bin * 25.0 AS bin_lo,
           0.0 + (s.bin + 1) * 25.0 AS bin_hi,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n
    FROM spine s LEFT JOIN counts c ON s.bin = c.bin
    ORDER BY s.bin
    """,
    doc="Equi-width histogram of events.value over [0, 500) in 20 "
    "bins — empty bins EMITTED via the sequence spine (groupBy alone "
    "cannot produce absent groups), hi lands in the last bin "
    "(numpy.histogram convention), bin ids from exact double "
    "arithmetic identical on both engines "
    "(pipeline/quality.py value_histogram).",
    tags=("pipeline", "profile", "histogram"),
)
def pl_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.quality import value_histogram

    return value_histogram(spark.table("events"), "value", 0.0, 500.0, 20)


@df_query(
    "pl_curriculum_stages",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             CAST(len(list_distinct(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')))
               AS DOUBLE)
               / len(string_split(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))
               * length(text) AS score
      FROM documents
    )
    SELECT doc_id, score,
           CAST(NTILE(4) OVER (ORDER BY score, doc_id) AS BIGINT) AS stage
    FROM scored
    ORDER BY doc_id
    """,
    doc="Curriculum staging: documents quantile-binned into 4 stages "
    "by the lexical-diversity x length score (easy -> hard), with the "
    "doc-id tie-break making the cut points deterministic. Exact "
    "NTILE(4) semantics WITHOUT the single-partition global window "
    "(VERDICT r05 item 1): the global rank comes from the two-pass "
    "range-bucket scheme (operators/ordered.py — parallel per-bucket "
    "windows + broadcast exclusive offsets from exact bucket counts), "
    "and the stage is pure integer arithmetic on (rank, n): the first "
    "n%4 stages take ceil(n/4) rows, the rest floor(n/4) — the ANSI "
    "NTILE definition replayed closed-form.",
    tags=("pipeline", "curriculum", "sampling"),
)
def pl_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.ordered import with_global_row_number
    from keenwa_spark.pipeline.dedup import normalized_text

    norm = normalized_text("text")
    words = f"split({norm}, ' ')"
    scored = spark.table("documents").selectExpr(
        "doc_id",
        f"CAST(size(array_distinct({words})) AS DOUBLE) / size({words})"
        " * char_length(text) AS score",
    )
    ranked = with_global_row_number(
        scored,
        order_by=["score", "doc_id"],
        bucket_col="score",
        out_col="__i",
        tie_bucket_col="doc_id",
    )
    n_total = scored.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    # NTILE(k): q = n DIV k groups of size q+1 for the first r = n % k
    # stages, size q for the rest (branch 2 is unreachable when q = 0)
    stage = F.expr(
        "CAST(IF(__i <= (__n DIV 4 + 1) * (__n % 4), "
        "  (__i - 1) DIV (__n DIV 4 + 1) + 1, "
        "  __n % 4 + (__i - 1 - (__n DIV 4 + 1) * (__n % 4)) DIV (__n DIV 4) + 1"
        ") AS BIGINT)"
    )
    return (
        ranked.crossJoin(F.broadcast(n_total))
        .select("doc_id", "score", stage.alias("stage"))
        .orderBy("doc_id")
    )


@df_query(
    "pl_dedup_keep_priority",
    oracle=f"""
    WITH RECURSIVE {_duck_lsh_pair_ctes()},
    cc_edges AS (
      SELECT id_a AS src, id_b AS dst FROM lsh_pairs
      UNION SELECT id_b, id_a FROM lsh_pairs
    ),
    reach(node, lab) AS (
      SELECT src, src FROM cc_edges
      UNION
      SELECT e.src, r.lab FROM cc_edges e JOIN reach r ON e.dst = r.node
    ),
    comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node),
    labeled AS (
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) AS component,
             d.source,
             CASE WHEN d.source = 'src0' THEN 0
                  WHEN d.source = 'src1' THEN 1
                  WHEN d.source = 'src2' THEN 2
                  ELSE 999 END AS priority
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    )
    SELECT doc_id, component, source, CAST(priority AS BIGINT) AS priority
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY component ORDER BY priority, doc_id) AS rk
      FROM labeled) x
    WHERE rk = 1
    ORDER BY doc_id
    """,
    doc="Near-dup cluster resolution by SOURCE PRIORITY: within each "
    "LSH connected component the doc from the most trusted source "
    "survives (src0 > src1 > src2 > rest), tie-broken by id — the "
    "keep-policy layer real dedup ends with, replacing min-id "
    "survival with a data-quality decision. One component-keyed "
    "window over the CC labeling; singletons always survive "
    "(pipeline/clustering.py cluster_keep_by_priority).",
    tags=("pipeline", "dedup", "curation"),
)
def pl_dedup_keep_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.clustering import cluster_keep_by_priority
    from keenwa_spark.pipeline.dedup import minhash_lsh_pairs

    docs = spark.table("documents")
    kept = cluster_keep_by_priority(
        docs,
        minhash_lsh_pairs(docs),
        priority={"src0": 0, "src1": 1, "src2": 2},
    )
    return kept.select("doc_id", "component", "source", "priority").orderBy(
        "doc_id"
    )


@df_query(
    "pl_mixture_report",
    oracle=f"""
    WITH kept AS (
      SELECT doc_id, source, {_duck_bucket('doc_id', 'mixr0')} AS bk
      FROM documents
    ),
    tagged AS (
      SELECT source,
             CASE WHEN source = 'src0' THEN 900000
                  WHEN source = 'src1' THEN 500000
                  WHEN source = 'src2' THEN 100000
                  ELSE 250000 END AS thr,
             bk
      FROM kept
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN bk < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN bk < thr THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS achieved_rate,
           CAST(thr AS DOUBLE) / 1000000 AS target_rate
    FROM tagged
    GROUP BY source, thr
    ORDER BY source
    """,
    doc="Mixture-recipe verification report: per-domain achieved vs "
    "target keep rates for a deterministic mixture_sample draw "
    "(src0 90%, src1 50%, src2 10%, default 25%) — the audit that "
    "closes the loop on the data-recipe operator: rates are checked "
    "from the SAME hash draw the sampler uses, so the report is exact, "
    "not an estimate (pipeline/sampling.py mixture_sample).",
    tags=("pipeline", "sampling", "audit"),
)
def pl_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.sampling import mixture_sample

    docs = spark.table("documents")
    rates = {"src0": 0.9, "src1": 0.5, "src2": 0.1}
    kept = mixture_sample(
        docs, "source", rates, key_col="doc_id", salt="mixr0",
        default_rate=0.25,
    ).select("doc_id", "source")
    totals = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    kept_counts = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept")
    )
    target = F.expr(
        "CASE WHEN source = 'src0' THEN 0.9 WHEN source = 'src1' THEN 0.5 "
        "WHEN source = 'src2' THEN 0.1 ELSE 0.25 END"
    )
    kept_counts = kept_counts.withColumnRenamed("source", "__ksource")
    return (
        # null-SAFE left join: a NULL domain is still a domain row in
        # the report (it samples at default_rate); the plain equi-join
        # dropped its kept-count (all-NULL-column sweep find)
        totals.join(
            kept_counts,
            totals["source"].eqNullSafe(kept_counts["__ksource"]),
            "left",
        )
        .select(
            "source",
            "n_total",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            (
                F.coalesce("n_kept", F.lit(0)).cast("double")
                / F.col("n_total")
            ).alias("achieved_rate"),
            target.cast("double").alias("target_rate"),
        )
        .orderBy("source")
    )



@df_query(
    "pl_expectations_report",
    oracle="""
    WITH t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM orders),
    checks AS (
      SELECT 'accepted_values' AS check_type, 'o_orderstatus' AS target,
             CAST((SELECT COUNT(*) FROM orders
                   WHERE o_orderstatus IS NOT NULL
                     AND o_orderstatus NOT IN ('O', 'F', 'P')) AS DOUBLE) AS observed,
             0.0 AS threshold
      UNION ALL
      SELECT 'foreign_key', 'o_custkey->customer.c_custkey',
             CAST((SELECT COUNT(*) FROM orders o
                   WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
                     SELECT 1 FROM customer c
                     WHERE c.c_custkey = o.o_custkey)) AS DOUBLE),
             0.0
      UNION ALL
      SELECT 'not_null', 'o_custkey',
             CASE WHEN (SELECT n FROM t) = 0 THEN 0.0
                  ELSE CAST((SELECT COUNT(*) FROM orders
                             WHERE o_custkey IS NULL) AS DOUBLE)
                       / (SELECT n FROM t) END,
             0.0
      UNION ALL
      SELECT 'unique', 'o_orderkey',
             CAST((SELECT COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey)
                   FROM orders) AS DOUBLE),
             0.0
      UNION ALL
      SELECT 'value_range', 'o_totalprice',
             CAST((SELECT COUNT(*) FROM orders
                   WHERE o_totalprice IS NOT NULL
                     AND (o_totalprice < 0.0 OR o_totalprice > 600000.0)) AS DOUBLE),
             0.0
    )
    SELECT check_type, target, observed, threshold,
           observed <= threshold AS passed
    FROM checks
    UNION ALL
    SELECT 'row_count', '__table__', (SELECT n FROM t),
           CASE WHEN (SELECT n FROM t) >= 1.0 THEN CAST(NULL AS DOUBLE)
                ELSE 1.0 END,
           (SELECT n FROM t) >= 1.0
    ORDER BY check_type, target
    """,
    doc="Declarative data-quality expectations on orders: null-rate "
    "ceiling, key uniqueness, accepted status domain, totalprice "
    "range, row-count floor, and o_custkey referential integrity "
    "(pipeline/expectations.py — all row-level checks fused into ONE "
    "aggregation pass over a single scan; the FK check is one "
    "broadcast anti-join that counts orphans without materializing "
    "them). Oracle recomputes every check as independent DuckDB "
    "subqueries.",
    tags=("pipeline", "quality", "expectations"),
)
def pl_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.expectations import (
        accepted_values,
        foreign_key,
        not_null,
        row_count,
        unique,
        validate_expectations,
        value_range,
    )

    orders = spark.table("orders")
    report = validate_expectations(
        orders,
        checks=[
            not_null("o_custkey"),
            unique("o_orderkey"),
            accepted_values("o_orderstatus", ["O", "F", "P"]),
            value_range("o_totalprice", 0.0, 600000.0),
            row_count(min_rows=1),
            foreign_key("o_custkey", "customer", "c_custkey"),
        ],
        ref_tables={"customer": spark.table("customer")},
    )
    return report.orderBy("check_type", "target")


@df_query(
    "pl_quantile_bins",
    oracle="""
    WITH vals AS (SELECT value AS v FROM events WHERE value IS NOT NULL),
    c AS (
      SELECT quantile_cont(v, [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS cuts
      FROM vals
    ),
    binned AS (
      SELECT CAST(len(list_filter(c.cuts, x -> x <= v)) AS INT) AS bin
      FROM vals, c
    ),
    counts AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n FROM binned GROUP BY bin
    ),
    spine AS (SELECT CAST(r AS INT) AS bin FROM range(0, 8) t(r))
    SELECT s.bin,
           CASE WHEN s.bin = 0 THEN NULL ELSE c.cuts[s.bin] END AS lo,
           CASE WHEN s.bin = 7 THEN NULL ELSE c.cuts[s.bin + 1] END AS hi,
           COALESCE(counts.n, 0) AS n
    FROM spine s CROSS JOIN c LEFT JOIN counts ON s.bin = counts.bin
    ORDER BY s.bin
    """,
    doc="Equi-depth histogram of events.value in 8 quantile bins "
    "(pipeline/quality.py quantile_histogram — one exact-percentile "
    "pass for all cuts, broadcast onto the scan, codegen array-filter "
    "bin assignment, spine join for empty bins; complements the "
    "equi-width pl_value_histogram). Oracle replays the identical "
    "cuts (quantile_cont is bit-equal to Spark's percentile) and "
    "binning in DuckDB.",
    tags=("pipeline", "quality", "histogram"),
)
def pl_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.quality import quantile_histogram

    return quantile_histogram(spark.table("events"), col="value", n_bins=8)


@df_query(
    "pl_lm_surprisal",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
      FROM documents
    ),
    exploded AS (
      SELECT doc_id,
             unnest(CASE WHEN len(ws) >= 2
                    THEN list_transform(range(1, len(ws)),
                         i -> struct_pack(w1 := ws[i], w2 := ws[i + 1]))
                    ELSE [] END) AS p
      FROM toks
    ),
    pairs AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM exploded),
    c12 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM pairs GROUP BY 1, 2
    ),
    c1 AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM pairs GROUP BY 1
    ),
    scored AS (
      SELECT p.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(c1.c1) AS BIGINT) AS ctx_total,
             CAST(SUM(c12.c12) AS BIGINT) AS pair_total
      FROM pairs p
      JOIN c12 USING (w1, w2)
      JOIN c1 USING (w1)
      GROUP BY p.doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_pairs, 0) AS n_pairs,
           ctx_total, pair_total,
           CAST(ctx_total AS DOUBLE) / pair_total AS surprisal
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN scored USING (doc_id)
    ORDER BY d.doc_id
    """,
    doc="Bigram-LM fluency scoring: train transition counts on the "
    "corpus itself, score each doc by pooled inverse transition "
    "probability (pipeline/text.py lm_transition_score — one explode "
    "feeds both the model aggregations and the scoring join; the "
    "rational two-BIGINT-sums form keeps the score bit-exact across "
    "engines where ln()-based perplexity would diverge in ulp). "
    "Oracle replays tokenization, model training, and scoring in "
    "DuckDB.",
    tags=("pipeline", "text", "quality"),
)
def pl_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.text import lm_transition_score

    return lm_transition_score(spark.table("documents")).orderBy("doc_id")


@df_query(
    "pl_feature_bucketize",
    oracle="""
    WITH c AS (
      SELECT quantile_cont(value, [0.25, 0.5, 0.75]) AS cuts
      FROM events WHERE value IS NOT NULL
    )
    SELECT e.event_id, e.value,
           CASE WHEN e.value IS NOT NULL
                THEN CAST(len(list_filter(c.cuts, x -> x <= e.value)) AS INT)
           END AS value_bin
    FROM events e CROSS JOIN c
    ORDER BY e.event_id
    """,
    doc="Equi-depth feature binning (fit/transform twin of "
    "pl_quantile_bins): each event's value mapped to its 0-based "
    "quartile bin under exact corpus cuts (pipeline/features.py "
    "quantile_bucketize — one percentile fit pass, broadcast cuts, "
    "codegen array-filter transform, zero added shuffles).",
    tags=("pipeline", "features"),
)
def pl_feature_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.features import quantile_bucketize

    return (
        quantile_bucketize(
            spark.table("events").select("event_id", "value"),
            col="value",
            n_bins=4,
        )
        .select("event_id", "value", "value_bin")
        .orderBy("event_id")
    )


@df_query(
    "pl_robust_scale",
    oracle="""
    WITH s AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS p25,
             quantile_cont(value, 0.5) AS p50,
             quantile_cont(value, 0.75) AS p75
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           CASE WHEN (s.p75 - s.p25) > 0
                THEN (e.value - s.p50) / (s.p75 - s.p25)
           END AS value_robust
    FROM events e LEFT JOIN s USING (event_type)
    ORDER BY e.event_id
    """,
    doc="Per-group robust scaling (median/IQR — the outlier-resistant "
    "twin of pl_feature_scale's z-score): one grouped exact-percentile "
    "fit, broadcast join-back transform (pipeline/features.py "
    "robust_scale). Spark percentile == DuckDB quantile_cont bit-"
    "equal, so the scaled doubles hash-match.",
    tags=("pipeline", "features"),
)
def pl_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.features import robust_scale

    return (
        robust_scale(
            spark.table("events").select("event_id", "event_type", "value"),
            col="value",
            keys=["event_type"],
        )
        .select("event_id", "event_type", "value", "value_robust")
        .orderBy("event_id")
    )


@df_query(
    "pl_target_encode",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority,
             CAST(COUNT(o_totalprice) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY o_orderpriority
    )
    SELECT o.o_orderkey, o.o_orderpriority,
           CASE WHEN o.o_totalprice IS NULL THEN s.total / s.n
                WHEN s.n > 1 THEN (s.total - o.o_totalprice) / (s.n - 1)
           END AS priority_te
    FROM orders o LEFT JOIN s USING (o_orderpriority)
    ORDER BY o.o_orderkey
    """,
    doc="Leave-one-out target encoding: each order's priority encoded "
    "as the mean totalprice of its priority class EXCLUDING its own "
    "row — the standard guard against target leakage "
    "(pipeline/features.py target_encode; decimal-exact class sums, "
    "one broadcast join back, the LOO adjustment is two IEEE ops on "
    "the exact totals).",
    tags=("pipeline", "features"),
)
def pl_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.features import target_encode

    return (
        target_encode(
            spark.table("orders").select(
                "o_orderkey", "o_orderpriority", "o_totalprice"
            ),
            cat_col="o_orderpriority",
            target_col="o_totalprice",
            out_col="priority_te",
            target_scale=2,
        )
        .select("o_orderkey", "o_orderpriority", "priority_te")
        .orderBy("o_orderkey")
    )


@df_query(
    "pl_temperature_mixture",
    oracle="""
    WITH c AS (
      SELECT source, CAST(COUNT(*) AS DOUBLE) AS n
      FROM documents GROUP BY source
    ),
    s AS (
      SELECT list_reduce(list(sqrt(n) ORDER BY source), (a, b) -> a + b) AS S
      FROM c
    )
    SELECT c.source,
           CAST(c.n AS BIGINT) AS n_docs,
           sqrt(c.n) AS weight,
           sqrt(c.n) / s.S AS q,
           LEAST(1.0, sqrt(c.n) / s.S * 200.0 / c.n) AS rate
    FROM c CROSS JOIN s
    ORDER BY c.source
    """,
    doc="Temperature-based mixture rates (alpha=0.5): per-source "
    "sampling shares proportional to sqrt(n) with a 200-row budget — "
    "the standard recipe that up-weights small domains "
    "(pipeline/sampling.py temperature_mixture_rates). The share "
    "normalizer folds weights in SORTED domain order on both engines "
    "(a parallel double SUM is partition-order-dependent); alpha is "
    "restricted to {0, 0.5, 1} because those have exact IEEE forms "
    "while general pow() is not correctly-rounded cross-engine.",
    tags=("pipeline", "sampling", "mixture"),
)
def pl_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.sampling import temperature_mixture_rates

    return temperature_mixture_rates(
        spark.table("documents"), domain_col="source",
        alpha=0.5, budget_rows=200,
    ).orderBy("source")


@df_query(
    "pl_rfm_segments",
    oracle="""
    WITH stats AS (
      SELECT user_id,
             CAST(date_diff('day', MAX(CAST(ts AS DATE)), DATE '2024-01-31')
                  AS INTEGER) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS monetary
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    rc AS (SELECT quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS cuts FROM stats),
    fc AS (SELECT quantile_cont(frequency,    [0.25, 0.5, 0.75]) AS cuts FROM stats),
    mc AS (SELECT quantile_cont(monetary,     [0.25, 0.5, 0.75]) AS cuts FROM stats),
    scored AS (
      SELECT s.user_id, s.recency_days, s.frequency, s.monetary,
             3 - CAST(len(list_filter(rc.cuts, x -> x <= s.recency_days)) AS INT) AS r_score,
             CAST(len(list_filter(fc.cuts, x -> x <= s.frequency)) AS INT) AS f_score,
             CAST(len(list_filter(mc.cuts, x -> x <= s.monetary)) AS INT) AS m_score
      FROM stats s CROSS JOIN rc CROSS JOIN fc CROSS JOIN mc
    )
    SELECT user_id, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS segment
    FROM scored ORDER BY user_id
    """,
    doc="RFM customer segmentation: per-user recency/frequency/"
    "monetary quartile scores and the 3-digit segment label — the "
    "classic lifecycle-marketing operator, composed from the equi-"
    "depth bucketizer (pipeline/features.py quantile_bucketize; "
    "recency inverted so higher is better everywhere). Plan: one "
    "purchase aggregate (persisted — three quantile fits share it), "
    "three broadcast cut arrays, codegen binning; oracle replays cuts "
    "and binning in DuckDB.",
    tags=("pipeline", "features", "rfm"),
)
def pl_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.features import quantile_bucketize

    stats = (
        spark.table("events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.datediff(
                F.lit("2024-01-31").cast("date"), F.max(F.to_date("ts"))
            ).alias("recency_days"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("monetary"),
        )
        # three quantile fits consume this — persist the diamond input
        .persist()
    )
    scored = quantile_bucketize(stats, "recency_days", 4, out_col="__rb")
    scored = quantile_bucketize(scored, "frequency", 4, out_col="f_score")
    scored = quantile_bucketize(scored, "monetary", 4, out_col="m_score")
    return (
        scored.select(
            "user_id", "recency_days", "frequency", "monetary",
            (F.lit(3) - F.col("__rb")).alias("r_score"),
            "f_score",
            "m_score",
        )
        .withColumn(
            "segment",
            F.concat(
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ),
        )
        .orderBy("user_id")
    )


@df_query(
    "pl_ngram_containment",
    oracle=f"""
    WITH {{docs_cte}},
    sets AS (SELECT DISTINCT doc_id, h AS sh FROM hashed),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sets GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM sets a JOIN sets b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(n_inter AS DOUBLE) / sa.set_size AS a_in_b,
           CAST(n_inter AS DOUBLE) / sb.set_size AS b_in_a
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE GREATEST(CAST(n_inter AS DOUBLE) / sa.set_size,
                   CAST(n_inter AS DOUBLE) / sb.set_size) >= 0.4
    """.format(docs_cte=_duck_docs_cte()),
    doc="EXACT n-gram CONTAINMENT pairs (|A∩B|/|A| >= 0.4 in either "
    "direction): the asymmetric dedup signal that catches a short doc "
    "quoted whole inside a long one — invisible to Jaccard, whose "
    "union is dominated by the longer side (pipeline/dedup.py "
    "ngram_containment_pairs; same inverted-index plan as "
    "pl_ngram_jaccard, candidates-only at scale).",
    tags=("pipeline", "dedup", "containment"),
)
def pl_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        spark.table("documents"), threshold=0.4
    ).orderBy("id_a", "id_b")


@df_query(
    "pl_embedding_norms",
    oracle="""
    WITH norms AS (
      SELECT label,
             sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                            for x in embedding])) AS nrm
      FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(nrm) AS min_norm,
           MAX(nrm) AS max_norm,
           quantile_cont(nrm, 0.5) AS median_norm
    FROM norms GROUP BY label ORDER BY label
    """,
    doc="Embedding-norm sanity stats per label (n, min/max/median "
    "L2 norm): the first check on any embedding table — zero norms, "
    "norm bimodality, or label-dependent scale all mean the encoder "
    "or the join upstream is broken. Norm is a sequential array fold "
    "(deterministic, same order both engines); the summary uses only "
    "order-independent (min/max) and exact-interpolation (median) "
    "aggregates — a mean of norms would be partition-order-dependent. "
    "The median rides the per-group rank path (operators/ordered.py "
    "grouped_exact_percentiles — spillable, bit-identical to the "
    "percentile aggregate whose per-group value buffer grows with "
    "label size).",
    tags=("pipeline", "embeddings", "quality"),
)
def pl_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.ordered import grouped_exact_percentiles

    norm = (
        "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * "
        "CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    norms = spark.table("embeddings").select("label", F.expr(norm).alias("nrm"))
    summary = norms.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("nrm").alias("min_norm"),
        F.max("nrm").alias("max_norm"),
    )
    medians = grouped_exact_percentiles(norms, "nrm", ["label"], [0.5]).select(
        F.col("label").alias("__mlabel"), F.col("__q0").alias("median_norm")
    )
    # null-SAFE left join: a NULL label is a legitimate GROUP BY group
    # (and all-NULL norms a legitimate NULL median) — a plain inner
    # equi-join dropped the NULL-label group (all-NULL-column sweep)
    return (
        summary.join(
            medians, summary["label"].eqNullSafe(medians["__mlabel"]), "left"
        )
        .drop("__mlabel")
        .orderBy("label")
    )


@df_query(
    "pl_dedup_triangles",
    oracle=f"""
    WITH {_duck_lsh_pair_ctes()},
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT id_a AS node FROM lsh_pairs
        UNION ALL SELECT id_b FROM lsh_pairs
      ) GROUP BY node
    ),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM lsh_pairs e1
      JOIN lsh_pairs e2 ON e1.id_b = e2.id_a
      JOIN lsh_pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    ),
    w AS (
      SELECT CAST(COALESCE(SUM(CAST(d * (d - 1) / 2 AS BIGINT)), 0)
                  AS BIGINT) AS n_wedges
      FROM deg
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lsh_pairs) AS n_edges,
           tri.n_triangles,
           w.n_wedges,
           CASE WHEN w.n_wedges > 0
                THEN 3.0 * tri.n_triangles / w.n_wedges END
             AS global_clustering
    FROM tri CROSS JOIN w
    """,
    doc="Triangle census of the LSH near-dup graph: edges, triangles "
    "(a<b<c double-self-join, each counted once), wedges from exact "
    "degree arithmetic, and global clustering 3T/W — tight duplicate "
    "cliques vs chained borderline matches, the diagnostic for "
    "whether transitive component-merging over-groups "
    "(pipeline/clustering.py triangle_stats).",
    tags=("pipeline", "dedup", "graph"),
)
def pl_dedup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.clustering import triangle_stats
    from keenwa_spark.pipeline.dedup import minhash_lsh_pairs

    return triangle_stats(minhash_lsh_pairs(spark.table("documents")))


@df_query(
    "pl_golden_records",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             NULLIF(event_type, 'error') AS good_type
      FROM events
    ),
    r_type AS (
      SELECT user_id, good_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY (good_type IS NOT NULL) DESC,
                        epoch_us(ts) DESC, event_id DESC
             ) AS rn
      FROM flagged
    ),
    r_val AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY (value IS NOT NULL) DESC,
                        epoch_us(ts) DESC, event_id DESC
             ) AS rn
      FROM flagged
    ),
    agg AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_members,
             strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_seen
      FROM flagged GROUP BY user_id
    )
    SELECT a.user_id, t.good_type, v.value, a.n_members, a.last_seen
    FROM agg a
    JOIN (SELECT user_id, good_type FROM r_type WHERE rn = 1) t
      ON t.user_id = a.user_id
    JOIN (SELECT user_id, value FROM r_val WHERE rn = 1) v
      ON v.user_id = a.user_id
    ORDER BY a.user_id
    """,
    doc="Golden-record survivorship: each user's records merged "
    "field-by-field — per field, the LATEST NON-NULL value wins (a "
    "recent record with a gap must not erase older known data), with "
    "deterministic (recency, event_id) ordering; good_type is "
    "event_type with 'error' nulled out to exercise the non-null "
    "preference on real data (pipeline/clustering.py golden_records — "
    "ONE aggregation pass, every field a max_by over its ordering "
    "struct). Oracle replays each field's pick as a ranked window.",
    tags=("pipeline", "dedup", "survivorship"),
)
def pl_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.clustering import golden_records

    flagged = spark.table("events").select(
        "user_id", "ts", "event_id", "value",
        F.expr("NULLIF(event_type, 'error')").alias("good_type"),
    )
    out = golden_records(
        flagged, cluster_col="user_id", ts_col="ts",
        fields=["good_type", "value"], tie_cols=["event_id"],
    )
    return out.select(
        "user_id", "good_type", "value", "n_members",
        F.date_format("last_seen", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "last_seen"
        ),
    ).orderBy("user_id")


@df_query(
    "pl_centroid_classify",
    oracle="""
    WITH ok AS (
      SELECT * FROM embeddings
      WHERE label IS NOT NULL AND embedding IS NOT NULL
    ),
    expl AS (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
             unnest(embedding) AS v
      FROM ok
    ),
    cent AS (
      SELECT label, dim,
             list_sum(list_sort(list(CAST(v AS DOUBLE)))) / COUNT(v)
               AS centroid_v
      FROM expl GROUP BY label, dim
    ),
    cvecs AS (
      SELECT label AS cid, list(centroid_v ORDER BY dim) AS cv
      FROM cent GROUP BY label
    ),
    dists AS (
      SELECT e.vec_id, e.label, c.cid,
             list_sum([
               (CAST(e.embedding[i] AS DOUBLE) - c.cv[i])
               * (CAST(e.embedding[i] AS DOUBLE) - c.cv[i])
               for i in range(1, len(e.embedding) + 1)
             ]) AS d
      FROM ok e CROSS JOIN cvecs c
    ),
    pred AS (
      SELECT label, cid AS pred FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY d, cid
        ) AS rn FROM dists
      ) WHERE rn = 1
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS accuracy
    FROM pred GROUP BY label ORDER BY label
    """,
    doc="Nearest-centroid classification report: per-label centroid "
    "fit (deterministic sorted-fold means), squared-L2 assignment via "
    "a ONE-ROW broadcast model (the IVF shape — shuffle-free corpus "
    "pass), per-true-label accuracy — the quickest separability / "
    "label-quality check on an embedding table "
    "(pipeline/similarity.py centroid_classify). Oracle replays "
    "centroids, distances, and the lowest-label tie-break in DuckDB.",
    tags=("pipeline", "similarity", "eval"),
)
def pl_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.similarity import centroid_classify

    return centroid_classify(spark.table("embeddings")).orderBy("label")


@df_query(
    "pl_centroid_confusion",
    oracle="""
    WITH ok AS (
      SELECT * FROM embeddings
      WHERE label IS NOT NULL AND embedding IS NOT NULL
    ),
    expl AS (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
             unnest(embedding) AS v
      FROM ok
    ),
    cent AS (
      SELECT label, dim,
             list_sum(list_sort(list(CAST(v AS DOUBLE)))) / COUNT(v)
               AS centroid_v
      FROM expl GROUP BY label, dim
    ),
    cvecs AS (
      SELECT label AS cid, list(centroid_v ORDER BY dim) AS cv
      FROM cent GROUP BY label
    ),
    dists AS (
      SELECT e.vec_id, e.label, c.cid,
             list_sum([
               (CAST(e.embedding[i] AS DOUBLE) - c.cv[i])
               * (CAST(e.embedding[i] AS DOUBLE) - c.cv[i])
               for i in range(1, len(e.embedding) + 1)
             ]) AS d
      FROM ok e CROSS JOIN cvecs c
    ),
    pred AS (
      SELECT label, cid AS pred FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY d, cid
        ) AS rn FROM dists
      ) WHERE rn = 1
    )
    SELECT label, pred, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY label, pred ORDER BY label, pred
    """,
    doc="Full confusion matrix of the nearest-centroid classifier "
    "(true label x predicted centroid counts) — which labels bleed "
    "into which, beyond pl_centroid_classify's per-label accuracy. "
    "Same one-row broadcast model and deterministic tie-break.",
    tags=("pipeline", "similarity", "eval"),
)
def pl_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.similarity import centroid_confusion

    return centroid_confusion(spark.table("embeddings")).orderBy(
        "label", "pred"
    )


@df_query(
    "pl_benford_digits",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS digit
      FROM events WHERE value >= 1
    )
    SELECT digit,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) AS DOUBLE)
             / (SELECT COUNT(*) FROM digits) AS share
    FROM digits GROUP BY digit ORDER BY digit
    """,
    doc="Benford leading-digit screening: the first-significant-digit "
    "distribution of events.value (values >= 1) — the classic "
    "fabricated-data / unit-mixing tell (natural multiplicative data "
    "tracks log10(1+1/d): ~30.1% ones down to ~4.6% nines; uniform "
    "synthetic data shows up flat, as this table's does). The digit "
    "comes from the BIGINT integer part's string form — identical in "
    "both engines — never from log10, which is not correctly-rounded "
    "cross-engine.",
    tags=("pipeline", "quality", "benford"),
)
def pl_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    digits = (
        spark.table("events")
        .where(F.col("value") >= 1)
        .select(
            F.substring(
                F.floor(F.col("value")).cast("bigint").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
    )
    total = digits.agg(F.count(F.lit(1)).alias("__t"))
    return (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            (F.col("n").cast("double") / F.col("__t").cast("double")).alias(
                "share"
            ),
        )
        .orderBy("digit")
    )


@df_query(
    "pl_category_drift",
    oracle="""
    WITH a AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_a FROM events
      WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY event_type
    ),
    b AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_b FROM events
      WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY event_type
    ),
    tot AS (
      SELECT (SELECT CAST(SUM(n_a) AS DOUBLE) FROM a) AS ta,
             (SELECT CAST(SUM(n_b) AS DOUBLE) FROM b) AS tb
    ),
    j AS (
      SELECT COALESCE(a.event_type, b.event_type) AS event_type,
             COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
      FROM a FULL OUTER JOIN b ON a.event_type = b.event_type
    )
    SELECT j.event_type, j.n_a, j.n_b,
           CAST(j.n_a AS DOUBLE) / t.ta AS share_a,
           CAST(j.n_b AS DOUBLE) / t.tb AS share_b,
           (CAST(j.n_b AS DOUBLE) / t.tb - CAST(j.n_a AS DOUBLE) / t.ta)
             * (CAST(j.n_b AS DOUBLE) / t.tb - CAST(j.n_a AS DOUBLE) / t.ta)
             / (CAST(j.n_a AS DOUBLE) / t.ta) AS chi2_contrib
    FROM j CROSS JOIN tot t
    ORDER BY j.event_type
    """,
    doc="Categorical distribution drift between two periods (first vs "
    "second half of January): per-category shares and the chi-square "
    "contribution ((p_b - p_a)^2 / p_a) — the production data-drift "
    "monitor for an ingest pipeline. Chi-square instead of PSI/KL is "
    "deliberate: it is RATIONAL in exact integer counts (ln-free), so "
    "it hash-matches cross-engine (same rule as Gini/LM-surprisal). "
    "Two filtered aggregates over one scan, 5-row full-outer join, "
    "broadcast totals.",
    tags=("pipeline", "quality", "drift"),
)
def pl_category_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.table("events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    a = ev.where(F.col("ts") < cut).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a")
    )
    b = ev.where(F.col("ts") >= cut).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b")
    )
    tot = a.agg(F.sum("n_a").cast("double").alias("__ta")).crossJoin(
        b.agg(F.sum("n_b").cast("double").alias("__tb"))
    )
    j = (
        a.join(b, "event_type", "full_outer")
        .select(
            "event_type",
            F.coalesce("n_a", F.lit(0)).cast("bigint").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_b"),
        )
        .crossJoin(F.broadcast(tot))
    )
    share_a = F.col("n_a").cast("double") / F.col("__ta")
    share_b = F.col("n_b").cast("double") / F.col("__tb")
    return j.select(
        "event_type", "n_a", "n_b",
        share_a.alias("share_a"),
        share_b.alias("share_b"),
        ((share_b - share_a) * (share_b - share_a) / share_a).alias(
            "chi2_contrib"
        ),
    ).orderBy("event_type")


@df_query(
    "pl_numeric_drift_ks",
    oracle="""
    WITH a AS (
      SELECT value AS v FROM events
      WHERE ts < TIMESTAMP '2024-01-16 00:00:00' AND value IS NOT NULL
    ),
    b AS (
      SELECT value AS v FROM events
      WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' AND value IS NOT NULL
    ),
    pts AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS ca, CAST(0 AS BIGINT) AS cb
      FROM a GROUP BY v
      UNION ALL
      SELECT v, CAST(0 AS BIGINT), CAST(COUNT(*) AS BIGINT)
      FROM b GROUP BY v
    ),
    merged AS (
      SELECT v, CAST(SUM(ca) AS BIGINT) AS ca, CAST(SUM(cb) AS BIGINT) AS cb
      FROM pts GROUP BY v
    ),
    cum AS (
      SELECT v,
             CAST(SUM(ca) OVER w AS DOUBLE)
               / (SELECT COUNT(*) FROM a) AS fa,
             CAST(SUM(cb) OVER w AS DOUBLE)
               / (SELECT COUNT(*) FROM b) AS fb
      FROM merged
      WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    ranked AS (
      SELECT v, abs(fa - fb) AS d,
             ROW_NUMBER() OVER (ORDER BY abs(fa - fb) DESC, v ASC) AS rn
      FROM cum
    )
    SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_a,
           CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_b,
           d AS ks_stat,
           v AS at_value
    FROM ranked
    WHERE rn = 1
      AND (SELECT COUNT(*) FROM a) > 0 AND (SELECT COUNT(*) FROM b) > 0
    """,
    doc="Two-sample Kolmogorov-Smirnov drift statistic for a numeric "
    "column (first vs second half of January): the max gap between "
    "the two empirical CDFs, evaluated exactly at every distinct "
    "observed value via one merged per-value count + a running-sum "
    "window — no sampling, no binning. All arithmetic is rational in "
    "exact integer counts (cumulative counts / sample sizes), so the "
    "statistic hash-matches cross-engine; argmax tie-breaks to the "
    "smallest value. The running counts use the two-pass range-bucket "
    "cumsum (operators/ordered.py — parallel per-bucket windows + "
    "broadcast exact offsets) and the argmax is a MAX-join, so the "
    "plan has NO single-partition window even when the distinct value "
    "domain grows with the data (VERDICT r05 item 2). The numeric "
    "companion to pl_category_drift.",
    tags=("pipeline", "quality", "drift", "ks"),
)
def pl_numeric_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.operators.ordered import with_global_cumsum

    ev = spark.table("events").where(F.col("value").isNotNull())
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    a = ev.where(F.col("ts") < cut).select(F.col("value").alias("v"))
    b = ev.where(F.col("ts") >= cut).select(F.col("value").alias("v"))
    pts = (
        a.groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ca"))
        .withColumn("cb", F.lit(0).cast("bigint"))
        .unionByName(
            b.groupBy("v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cb"))
            .withColumn("ca", F.lit(0).cast("bigint"))
        )
        .groupBy("v")
        .agg(
            F.sum("ca").cast("bigint").alias("ca"),
            F.sum("cb").cast("bigint").alias("cb"),
        )
    )
    totals = a.agg(F.count(F.lit(1)).cast("double").alias("__na")).crossJoin(
        b.agg(F.count(F.lit(1)).cast("double").alias("__nb"))
    )
    cum = (
        with_global_cumsum(pts, ["v"], "v", {"cca": "ca", "ccb": "cb"})
        .crossJoin(F.broadcast(totals))
        # KS is defined only when BOTH samples are non-empty: filter
        # BEFORE the CDF divisions (ANSI divide-by-zero otherwise —
        # 1-row sweep find); one empty side -> zero output rows
        .where((F.col("__na") > 0) & (F.col("__nb") > 0))
        .select(
            "v",
            "__na",
            "__nb",
            (F.col("cca").cast("double") / F.col("__na")).alias("fa"),
            (F.col("ccb").cast("double") / F.col("__nb")).alias("fb"),
        )
    )
    scored = cum.select(
        "v", "__na", "__nb", F.abs(F.col("fa") - F.col("fb")).alias("d")
    )
    # argmax without a global ROW_NUMBER: join to the max gap, then the
    # smallest value among ties — both ordinary parallel aggregates
    best = scored.crossJoin(
        F.broadcast(scored.agg(F.max("d").alias("__md")))
    ).where(F.col("d") == F.col("__md"))
    return best.agg(
        F.min("__na").cast("bigint").alias("n_a"),
        F.min("__nb").cast("bigint").alias("n_b"),
        F.max("d").alias("ks_stat"),
        F.min("v").alias("at_value"),
    ).where(F.col("at_value").isNotNull())  # empty input -> 0 rows


@df_query(
    "pl_association_cramers_v",
    oracle="""
    WITH cc AS (
      SELECT lang, source FROM documents
      WHERE lang IS NOT NULL AND source IS NOT NULL
    ),
    obs AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
      FROM cc GROUP BY lang, source
    ),
    margins AS (
      SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM cc) AS n,
             (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) FROM cc) AS r,
             (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) FROM cc) AS c
    ),
    rl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nr FROM cc GROUP BY lang),
    cl AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nc FROM cc GROUP BY source),
    chi AS (
      SELECT list_reduce(
               list(
                 (o.o - CAST(rl.nr AS DOUBLE) * cl.nc / m.n)
                 * (o.o - CAST(rl.nr AS DOUBLE) * cl.nc / m.n)
                 / (CAST(rl.nr AS DOUBLE) * cl.nc / m.n)
                 ORDER BY o.lang, o.source
               ), (a, b) -> a + b) AS chi2
      FROM obs o
      JOIN rl ON rl.lang = o.lang
      JOIN cl ON cl.source = o.source
      CROSS JOIN margins m
    )
    SELECT m.n AS n_docs, m.r AS n_langs, m.c AS n_sources,
           chi.chi2 AS chi2,
           CASE WHEN LEAST(m.r, m.c) > 1
                THEN sqrt(chi.chi2 / (m.n * (LEAST(m.r, m.c) - 1))) END
             AS cramers_v
    FROM chi CROSS JOIN margins m
    WHERE m.n > 0
    """,
    doc="Cramér's V association between two categorical columns "
    "(documents.lang x source): chi-square over the contingency table "
    "normalized to [0,1] — the feature-selection / redundancy screen "
    "between categoricals. Cramér's V instead of mutual information "
    "is deliberate: MI needs ln() (ulp-divergent cross-engine) while "
    "V is rational in exact integer counts plus ONE sqrt — and sqrt "
    "IS correctly-rounded IEEE, so the statistic hash-matches. The "
    "per-cell double contributions fold in SORTED (lang, source) "
    "order on both engines (even a single-partition SUM orders its "
    "inputs engine-specifically — measured 1-ulp apart before the "
    "sorted fold).",
    tags=("pipeline", "quality", "association"),
)
def pl_association_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    # complete-case analysis: NULL categories are excluded from the
    # contingency table (the standard chi-square practice; a NULL
    # "category" would also break the null-unsafe margin joins)
    docs = spark.table("documents").where(
        F.col("lang").isNotNull() & F.col("source").isNotNull()
    )
    obs = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    rl = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("nr"))
    cl = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("nc")
    )
    m = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.countDistinct("lang").cast("bigint").alias("r"),
        F.countDistinct("source").cast("bigint").alias("c"),
    )
    e = F.col("nr").cast("double") * F.col("nc") / F.col("n")
    chi = (
        obs.join(F.broadcast(rl), "lang")
        .join(F.broadcast(cl), "source")
        .crossJoin(F.broadcast(m))
        .select(
            "lang", "source",
            ((F.col("o") - e) * (F.col("o") - e) / e).alias("contrib"),
            "n", "r", "c",
        )
        .groupBy("n", "r", "c")
        # sorted sequential fold: a plain SUM orders its double inputs
        # engine-specifically even in one partition (measured 1 ulp)
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list("
                "struct(lang, source, contrib))), CAST(0 AS DOUBLE), "
                "(acc, x) -> acc + x.contrib)"
            ).alias("chi2")
        )
    )
    return chi.select(
        F.col("n").alias("n_docs"),
        F.col("r").alias("n_langs"),
        F.col("c").alias("n_sources"),
        "chi2",
        F.when(
            F.least("r", "c") > 1,
            F.sqrt(
                F.col("chi2") / (F.col("n") * (F.least("r", "c") - F.lit(1)))
            ),
        ).alias("cramers_v"),  # V undefined for a 1 x k table (1-row sweep)
    )


@df_query(
    "pl_distinct_estimate_kmv",
    oracle="""
    WITH toks AS (
      SELECT string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT
        (('0x' || substr(md5(unnest(
          CASE WHEN len(ws) >= 3
               THEN list_transform(range(1, len(ws) - 1),
                    i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])
               ELSE [] END)), 1, 8))::BIGINT) AS h
      FROM toks
    ),
    bottom AS (
      SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk FROM grams
      ORDER BY h LIMIT 256
    ),
    est AS (
      SELECT CASE WHEN (SELECT COUNT(*) FROM bottom) < 256
                  THEN CAST((SELECT COUNT(*) FROM grams) AS DOUBLE)
                  ELSE CAST(255 AS DOUBLE)
                       / (CAST((SELECT h FROM bottom WHERE rk = 256) AS DOUBLE)
                          / 4294967296.0) END AS e
    )
    SELECT CAST((SELECT COUNT(*) FROM grams) AS BIGINT) AS exact_distinct,
           est.e AS kmv_estimate,
           CASE WHEN (SELECT COUNT(*) FROM grams) > 0
                THEN abs(est.e - (SELECT COUNT(*) FROM grams))
                     / (SELECT COUNT(*) FROM grams) END AS rel_error
    FROM est
    """,
    doc="K-minimum-values distinct-count estimation over the corpus's "
    "3-gram shingles (k=256): the bottom-k sketch whose estimate "
    "(k-1)/u_(k) needs only the k smallest portable hashes — the "
    "mergeable, bounded-memory form exact COUNT(DISTINCT) takes at "
    "100 TB, here verified EXACTLY because the md5-derived hashes and "
    "the estimator arithmetic are deterministic on both engines (an "
    "HLL sketch could only be tolerance-tested; KMV hash-matches). "
    "The exact distinct count rides alongside so the row also "
    "MEASURES the estimator's error. Plan: the sketch is a "
    "TakeOrdered over hashed distinct grams — no full sort.",
    tags=("pipeline", "sketch", "distinct"),
)
def pl_distinct_estimate_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.dedup import _shingles
    from keenwa_spark.pipeline.hashing import spark_hash64

    k = 256
    grams = (
        spark.table("documents")
        .select(F.explode(F.expr(_shingles("text", 3))).alias("g"))
        .select(F.expr(spark_hash64("g")).alias("h"))
        .distinct()
    )
    bottom = grams.orderBy("h").limit(k)
    kth = bottom.agg(
        F.max("h").cast("double").alias("__hk"),
        F.count(F.lit(1)).cast("bigint").alias("__nb"),
    )
    exact = grams.agg(F.count(F.lit(1)).cast("bigint").alias("exact_distinct"))
    # under-filled sketch (< k hashes seen): the bottom-k IS the whole
    # distinct set, so the estimate is the exact count (KMV convention;
    # 1-row sweep find — (k-1)/u_k over a non-kth hash was garbage)
    est = F.when(
        F.col("__nb") < F.lit(k), F.col("exact_distinct").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (F.col("__hk") / F.lit(4294967296.0))
    )
    return (
        exact.crossJoin(F.broadcast(kth))
        .select(
            "exact_distinct",
            est.alias("kmv_estimate"),
            F.when(
                F.col("exact_distinct") > 0,
                F.abs(est - F.col("exact_distinct"))
                / F.col("exact_distinct"),
            ).alias("rel_error"),
        )
    )


@df_query(
    "pl_training_data_flow",
    oracle=f"""
    WITH normed AS (
      SELECT doc_id, text, {_D_NORM.format(c='text')} AS norm
      FROM documents
    ),
    kept AS (
      SELECT * FROM normed
      WHERE len(string_split(norm, ' ')) >= 30
    ),
    reps AS (
      SELECT md5(norm) AS h, MIN(doc_id) AS keep_id
      FROM kept GROUP BY md5(norm)
    ),
    dedup AS (
      SELECT k.* FROM kept k JOIN reps r ON k.doc_id = r.keep_id
    ),
    sampled AS (
      SELECT * FROM dedup
      WHERE {_duck_bucket('doc_id', 'flow')} < 600000
    ),
    docs2 AS (
      SELECT doc_id, doc_id % 8 AS shard,
             CAST(len(string_split(norm, ' ')) AS BIGINT) AS nt
      FROM sampled WHERE len(trim(text)) > 0
    ),
    chunks AS (
      SELECT doc_id, shard, nt,
             unnest(generate_series(CAST(0 AS BIGINT), (nt - 1) // 24))
               AS chunk_id
      FROM docs2
    ),
    sized AS (
      SELECT doc_id, shard, chunk_id,
             CAST(LEAST(32, nt - chunk_id * 24) AS BIGINT) AS n_chunk_tokens
      FROM chunks
    ),
    cum AS (
      SELECT *, CAST(SUM(n_chunk_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id, chunk_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_after
      FROM sized
    ),
    spans AS (
      SELECT *, cum_after - n_chunk_tokens AS cum_before,
             unnest(generate_series(
               CAST((cum_after - n_chunk_tokens) // 128 AS BIGINT),
               CAST((cum_after - 1) // 128 AS BIGINT))) AS win
      FROM cum
    )
    SELECT shard,
           CAST(COUNT(DISTINCT win) AS BIGINT) AS n_seqs,
           CAST(COUNT(*) AS BIGINT) AS n_span_rows,
           CAST(SUM(LEAST(n_chunk_tokens, (win + 1) * 128 - cum_before)
                    - GREATEST(0, win * 128 - cum_before)) AS BIGINT)
             AS n_tokens
    FROM spans GROUP BY shard ORDER BY shard
    """,
    doc="END-TO-END training-data curation flow as ONE declarative "
    "plan — the flagship composition for the LLM-pipeline layer: "
    "quality gate (>=30 normalized words) -> exact dedup keep-first "
    "(16-byte digest groupBy + semi-join back) -> deterministic "
    "hash sample (60%, engine-portable md5 buckets, zero shuffle) -> "
    "fused chunk->pack (doc-sharded, one Exchange) -> per-shard "
    "yield report (sequences, span rows, packed tokens). Every stage "
    "is the library operator (pipeline/dedup.py exact_dedup, "
    "sampling.py hash_sample, packing.py chunk_and_pack) and the "
    "oracle replays the full chain in DuckDB — the 'a user could run "
    "their pipeline on this' claim, verified by value.",
    tags=("pipeline", "composition", "flagship"),
)
def pl_training_data_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.dedup import exact_dedup, normalized_text
    from keenwa_spark.pipeline.packing import chunk_and_pack
    from keenwa_spark.pipeline.sampling import hash_sample

    docs = spark.table("documents")
    norm_words = f"size(split({normalized_text('text')}, ' '))"
    kept = docs.where(F.expr(f"{norm_words} >= 30"))
    reps = exact_dedup(kept).select("doc_id")
    dedup = kept.join(reps, "doc_id", "left_semi")
    sampled = hash_sample(dedup, "doc_id", 0.6, salt="flow")
    packed = chunk_and_pack(
        sampled, chunk_tokens=32, overlap=8, seq_len=128, n_shards=8
    )
    return (
        packed.groupBy("shard")
        .agg(
            F.count_distinct("win").cast("bigint").alias("n_seqs"),
            F.count(F.lit(1)).cast("bigint").alias("n_span_rows"),
            F.sum(F.col("tok_end") - F.col("tok_start"))
            .cast("bigint")
            .alias("n_tokens"),
        )
        .orderBy("shard")
    )


@df_query(
    "pl_dup_span_stats",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN text IS NULL THEN NULL
                  ELSE {_D_WORDS.format(c='text')} END AS w
      FROM documents
    ),
    sized AS (
      SELECT doc_id,
             CASE WHEN w IS NULL THEN NULL
                  ELSE CAST(len(w) AS BIGINT) END AS n_words, w
      FROM base
    ),
    glist AS (
      SELECT doc_id, n_words,
             CASE WHEN n_words >= 8
                  THEN [array_to_string(w[i:i+7], ' ')
                        for i in range(1, n_words - 6)]
                  ELSE [] END AS gs
      FROM sized
    ),
    grams AS (
      SELECT doc_id, unnest(gs) AS gram,
             generate_subscripts(gs, 1) AS start
      FROM glist
    ),
    flagged AS (
      SELECT doc_id, start FROM (
        SELECT doc_id, start, COUNT(*) OVER (PARTITION BY gram) AS occ
        FROM grams
      ) WHERE occ > 1
    ),
    gaps AS (
      SELECT doc_id,
             start - LAG(start) OVER (PARTITION BY doc_id ORDER BY start)
               AS gap
      FROM flagged
    ),
    cov AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_grams,
             CAST(SUM(CASE WHEN gap IS NULL THEN 8
                           ELSE LEAST(8, gap) END) AS BIGINT)
               AS covered_words
      FROM gaps GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_words,
           COALESCE(c.dup_grams, 0) AS dup_grams,
           COALESCE(c.covered_words, 0) AS covered_words,
           CAST(COALESCE(c.covered_words, 0) AS DOUBLE) / s.n_words
             AS dup_fraction
    FROM sized s LEFT JOIN cov c USING (doc_id)
    """,
    doc="Exact duplicated-substring statistics (Lee et al. 2022 "
    "word-granular primitive): per-document count of verbatim 8-word "
    "spans occurring more than once in the corpus and the merged-"
    "interval word coverage of those spans. Duplicate test is a "
    "partial-aggregated groupBy on the gram (NOT a gram window — hot "
    "boilerplate grams stay map-side combinable), left-semi join back, "
    "one doc-keyed lag window for the interval union "
    "(pipeline/dedup.py duplicated_spans).",
    tags=("pipeline", "dedup"),
)
def pl_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.dedup import duplicated_spans

    return duplicated_spans(spark.table("documents"), width=8)


@df_query(
    "pl_search_bm25",
    oracle=f"""
    WITH pairs AS (
      SELECT doc_id,
             CAST(len({_D_WORDS.format(c='text')}) AS BIGINT) AS dl,
             unnest({_D_WORDS.format(c='text')}) AS term
      FROM documents
    ),
    tfc AS (
      SELECT doc_id, term, COUNT(*) AS tf, MAX(dl) AS dl FROM pairs
      WHERE term IN ('join', 'spark', 'table')
      GROUP BY doc_id, term
    ),
    dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df_t FROM tfc GROUP BY term),
    stats AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs,
             SUM(CASE WHEN text IS NULL THEN NULL
                      ELSE CAST(len({_D_WORDS.format(c='text')}) AS BIGINT)
                 END) AS sum_dl,
             COUNT(*) AS n_rows
      FROM documents
    ),
    scored AS (
      SELECT doc_id, tfc.term,
             GREATEST((CAST(n_docs AS DOUBLE) - df_t + 0.5)
                      / (df_t + 0.5), CAST(0 AS DOUBLE))
             * (tf * (1.2 + 1.0))
             / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl
                            / (CAST(sum_dl AS DOUBLE) / n_rows))) AS score
      FROM tfc JOIN dft ON tfc.term = dft.term CROSS JOIN stats
    ),
    agg AS (
      SELECT doc_id,
             list_sum(list_sort(list(score))) AS relevance,
             CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms_matched
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, relevance, n_terms_matched
    FROM agg ORDER BY relevance DESC, doc_id LIMIT 10
    """,
    doc="Okapi BM25 search: top-10 documents for 'spark table join' with "
    "clamped rational idf times the tf-saturation/length-normalization "
    "term tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)), k1=1.2 b=0.75 — fully "
    "rational, so bit-exact cross-engine (no ln()). Per-doc dl rides "
    "through the explode (no extra join); avgdl is one broadcast 1-row "
    "corpus aggregate pinned as sum_dl/n_rows "
    "(pipeline/tfidf.py bm25_topk).",
    tags=("pipeline", "tfidf", "search"),
)
def pl_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.tfidf import bm25_topk

    return bm25_topk(spark.table("documents"), "spark table join", k=10)


def _pagerank_oracle(n_iter: int = 5, damping: float = 0.85) -> str:
    """Unrolled-iteration PageRank CTE chain mirroring
    pipeline/clustering.py pagerank() arithmetic shape-for-shape
    (same float literals via repr, sorted contribution folds)."""
    om = f"CAST({1.0 - damping!r} AS DOUBLE)"
    d = f"CAST({damping!r} AS DOUBLE)"
    parts = [
        """
    e0 AS (SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0),
    dang AS (SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM e0)),
    e2 AS (SELECT src, dst FROM e0 UNION ALL SELECT node, node FROM dang),
    outd AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outd FROM e2 GROUP BY src),
    nn AS (SELECT node, (SELECT COUNT(*) FROM nodes) AS n FROM nodes),
    it0 AS (SELECT node, n, CAST(1.0 AS DOUBLE) / n AS rank FROM nn)"""
    ]
    for k in range(1, n_iter + 1):
        parts.append(
            f""",
    it{k} AS (
      SELECT nn.node, nn.n,
             {om} / nn.n + {d} * COALESCE(s.s, CAST(0 AS DOUBLE)) AS rank
      FROM nn LEFT JOIN (
        SELECT e2.dst AS node, list_sum(list_sort(list(r.rank / o.outd))) AS s
        FROM e2 JOIN outd o ON e2.src = o.src JOIN it{k - 1} r ON e2.src = r.node
        GROUP BY e2.dst
      ) s ON nn.node = s.node)"""
        )
    return "WITH" + "".join(parts) + f"\n    SELECT node, rank FROM it{n_iter}"


@df_query(
    "pl_graph_pagerank",
    oracle=_pagerank_oracle(5, 0.85),
    doc="Fixed-iteration PageRank (5 rounds, d=0.85) over the directed "
    "customer->supplier purchase graph ('c'/'s'-prefixed node ids; "
    "dangling nodes take self-loops instead of global mass "
    "redistribution). The iterative-algorithm family next to connected "
    "components: alternating join-on-src / aggregate-on-dst rounds, N "
    "as a broadcast 1-row aggregate, sorted per-node contribution "
    "folds so every double is bit-identical to the DuckDB unrolled-CTE "
    "oracle (pipeline/clustering.py pagerank).",
    tags=("pipeline", "graph"),
)
def pl_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.clustering import pagerank

    o, li = spark.table("orders"), spark.table("lineitem")
    edges = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    return pagerank(edges, n_iter=5, damping=0.85)


# ---------------------------------------------------------------------------
# Record linkage (blocked fuzzy match)
# ---------------------------------------------------------------------------

#: Deterministic "dirty registry" derived from customer: every 5th key
#: keeps its exact name; the rest delete one character at a
#: key-dependent position, covering edits in the prefix block, the
#: body, and the suffix block (some of which are designed to be
#: unmatchable once the degenerate 'cust' prefix block is capped).
_LINK_DEL_POS = "(c_custkey % 18 + 1)"
_LINK_DIRTY_NAME = (
    f"CASE WHEN c_custkey % 5 = 0 THEN c_name "
    f"ELSE substring(c_name, 1, {_LINK_DEL_POS} - 1) || "
    f"substring(c_name, {_LINK_DEL_POS} + 1, length(c_name)) END"
)


@df_query(
    "pl_record_linkage",
    oracle=f"""
    WITH clean AS (
      SELECT c_custkey AS c_id, trim(lower(c_name)) AS c_name FROM customer
    ),
    dirty AS (
      SELECT c_custkey AS d_id,
             trim(lower({_LINK_DIRTY_NAME})) AS d_name
      FROM customer
    ),
    dblk AS (
      SELECT d_id, d_name, 'p' AS blk_pass, substring(d_name, 1, 4) AS block
      FROM dirty WHERE d_name IS NOT NULL
      UNION ALL
      SELECT d_id, d_name, 's', substring(reverse(d_name), 1, 4)
      FROM dirty WHERE d_name IS NOT NULL
    ),
    cblk AS (
      SELECT c_id, c_name, 'p' AS blk_pass, substring(c_name, 1, 4) AS block
      FROM clean WHERE c_name IS NOT NULL
      UNION ALL
      SELECT c_id, c_name, 's', substring(reverse(c_name), 1, 4)
      FROM clean WHERE c_name IS NOT NULL
    ),
    dcap AS (
      SELECT d_id, d_name, blk_pass, block FROM (
        SELECT *, row_number() OVER (PARTITION BY blk_pass, block
                                     ORDER BY d_id) AS rn
        FROM dblk) WHERE rn <= 64
    ),
    ccap AS (
      SELECT c_id, c_name, blk_pass, block FROM (
        SELECT *, row_number() OVER (PARTITION BY blk_pass, block
                                     ORDER BY c_id) AS rn
        FROM cblk) WHERE rn <= 64
    ),
    pairs AS (
      SELECT DISTINCT d_id, d_name, c_id, c_name
      FROM dcap JOIN ccap USING (blk_pass, block)
    ),
    scored AS (
      SELECT d_id, d_name, c_id, c_name,
             CAST(levenshtein(d_name, c_name) AS BIGINT) AS distance
      FROM pairs WHERE levenshtein(d_name, c_name) <= 2
    ),
    best AS (
      SELECT d_id, d_name, c_id AS match_id, c_name AS match_name, distance
      FROM (SELECT *, row_number() OVER (PARTITION BY d_id, d_name
                ORDER BY distance, c_id, c_name) AS rn FROM scored)
      WHERE rn = 1
    ),
    spine AS (SELECT DISTINCT d_id, d_name FROM dirty WHERE d_name IS NOT NULL)
    SELECT s.d_id, s.d_name, b.match_id, b.match_name, b.distance
    FROM spine s LEFT JOIN best b ON s.d_id = b.d_id AND s.d_name = b.d_name
    """,
    doc="Record linkage / entity resolution: a deterministically "
    "perturbed customer registry (1-char deletions) fuzzy-matched back "
    "to the clean registry via prefix+suffix blocking, codegen "
    "levenshtein <= 2 scoring, and min(struct) best-match — never "
    "all-pairs; the degenerate shared-prefix block is capped at 64 "
    "rows per side (deterministic, oracle-replicated), so some "
    "suffix-edited records stay provably unmatched "
    "(pipeline/linkage.py fuzzy_link).",
    tags=("pipeline", "linkage"),
)
def pl_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.linkage import fuzzy_link

    cust = spark.table("customer")
    dirty = cust.select(
        F.col("c_custkey").alias("d_id"),
        F.expr(_LINK_DIRTY_NAME).alias("d_name_raw"),
    )
    out = fuzzy_link(
        dirty,
        cust,
        dirty_id="d_id",
        dirty_name="d_name_raw",
        clean_id="c_custkey",
        clean_name="c_name",
        block_len=4,
        max_dist=2,
        max_block=64,
    )
    return out.withColumn("distance", F.col("distance").cast("long"))


# ---------------------------------------------------------------------------
# DSIR importance weighting (pipeline/dsir.py)
# ---------------------------------------------------------------------------

#: shared oracle body: hashed-unigram bucket models + rational
#: mean-likelihood-ratio weight, target = lang 'en' (see dsir.py for
#: why the weight is rational, not a ln() sum)
_DSIR_CTE = """
    WITH tb AS (
      SELECT doc_id, lang = 'en' AS tgt,
             (('0x' || substr(md5(tok), 1, 8))::BIGINT) % 1024 AS b
      FROM (
        SELECT doc_id, lang,
               unnest(string_split(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
        FROM documents WHERE text IS NOT NULL
      )
    ),
    model AS (
      SELECT b,
             CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
             CAST(SUM(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS c_s
      FROM tb GROUP BY b
    ),
    tot AS (
      SELECT CAST(SUM(c_t) AS BIGINT) AS tot_t,
             CAST(SUM(c_s) AS BIGINT) AS tot_s
      FROM model
    ),
    masses AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(m.c_t) AS BIGINT) AS t_mass,
             CAST(SUM(m.c_s) AS BIGINT) AS s_mass
      FROM tb JOIN model m USING (b) GROUP BY doc_id
    ),
    weights AS (
      SELECT d.doc_id, n_tokens, t_mass, s_mass,
             (CAST(t_mass + n_tokens AS DOUBLE)
              * CAST(tot_s + 1024 AS DOUBLE))
             / (CAST(s_mass + n_tokens AS DOUBLE)
                * CAST(tot_t + 1024 AS DOUBLE)) AS weight
      FROM (SELECT DISTINCT doc_id FROM documents) d
      LEFT JOIN masses USING (doc_id)
      CROSS JOIN tot
    )
"""


@df_query(
    "pl_dsir_weights",
    oracle=_DSIR_CTE + """
    SELECT doc_id, n_tokens, t_mass, s_mass, weight
    FROM weights ORDER BY doc_id
    """,
    doc="DSIR-style hashed-n-gram importance weights (Xie et al. 2023) "
    "vs the lang='en' target sample: tokens hash into 1024 feature "
    "buckets via the engine-portable md5 bucket, both sides' bucket "
    "models fit in ONE map-side-combinable pass over a single explode, "
    "model + totals broadcast so the vocabulary never shuffles, and "
    "the weight is the RATIONAL mean-likelihood-ratio form (exact "
    "BIGINT masses, one final double expression) — the ln()-product "
    "textbook form diverges in ulp across engines "
    "(pipeline/dsir.py dsir_weights).",
    tags=("pipeline", "sampling", "selection"),
)
def pl_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.dsir import dsir_weights

    return dsir_weights(
        spark.table("documents"), target=F.col("lang") == "en"
    ).orderBy("doc_id")


@df_query(
    "pl_dsir_select",
    oracle=_DSIR_CTE + """
    SELECT w.doc_id, n_tokens, t_mass, s_mass, weight
    FROM weights w JOIN documents d ON w.doc_id = d.doc_id
    WHERE NOT (d.lang = 'en') AND weight IS NOT NULL
    ORDER BY weight DESC, w.doc_id
    LIMIT 25
    """,
    doc="The DSIR selection step: top-25 NON-target documents by "
    "importance weight (weight desc, id tie-break) — the most "
    "target-like slice of the out-of-domain corpus, the rows a "
    "domain-targeted mixture up-samples. Global top-k plans as "
    "TakeOrderedAndProject (bounded per-partition heap + k-row driver "
    "merge), never a full sort (pipeline/dsir.py dsir_select).",
    tags=("pipeline", "sampling", "selection"),
)
def pl_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.dsir import dsir_select

    return dsir_select(
        spark.table("documents"), target=F.col("lang") == "en", k=25
    )


# ---------------------------------------------------------------------------
# MMR diversification (pipeline/similarity.py mmr_rerank)
# ---------------------------------------------------------------------------


def _mmr_oracle(n_cand: int = 20, k: int = 8, lam: float = 0.7) -> str:
    """Unrolled greedy-MMR CTE (the pagerank-oracle technique): step i
    picks, among candidates not yet selected, the argmax of
    lam*rel - (1-lam)*max cosine to sel_{i-1} via a correlated scalar
    MAX subquery, ties to the smallest id. Every sel CTE is
    MATERIALIZED: each step references sel_{i-1} three times, and
    DuckDB inlines plain CTEs per reference — un-materialized, the
    expansion is exponential in k (measured: step-8 plan never
    finishes)."""
    lam_s = f"CAST({lam!r} AS DOUBLE)"
    om_s = f"CAST({1.0 - lam!r} AS DOUBLE)"
    # diversity term carries the engine's zero-norm guard (ADVICE r08)
    cos = _duck_safe_cosine("c.v", "s.v")
    parts = [
        f""" cand AS MATERIALIZED (
      SELECT vid, rel, v FROM (
        SELECT neighbor_id AS vid, cos_sim AS rel, cv AS v,
               ROW_NUMBER() OVER (ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM (
          SELECT c.vec_id AS neighbor_id, {_duck_cosine('qv', 'cv')} AS cos_sim, cv
          FROM (SELECT vec_id, {_D_VEC_D} AS cv FROM embeddings) c
          CROSS JOIN (SELECT {_D_VEC_D} AS qv FROM embeddings WHERE vec_id = 0) q
          WHERE c.vec_id <> 0
        )
      ) WHERE rnk <= {n_cand}),
    sel1 AS MATERIALIZED (
      SELECT vid, rel, v, {lam_s} * rel AS score, CAST(1 AS BIGINT) AS pick
      FROM cand ORDER BY rel DESC, vid LIMIT 1)"""
    ]
    for i in range(2, k + 1):
        parts.append(
            f""",
    s{i} AS (
      SELECT c.vid, c.rel, c.v,
             {lam_s} * c.rel
               - {om_s} * (SELECT MAX({cos}) FROM sel{i - 1} s) AS score,
             CAST({i} AS BIGINT) AS pick
      FROM cand c
      WHERE c.vid NOT IN (SELECT vid FROM sel{i - 1})
      ORDER BY score DESC, c.vid LIMIT 1),
    sel{i} AS MATERIALIZED (SELECT * FROM sel{i - 1} UNION ALL SELECT * FROM s{i})"""
        )
    return (
        "WITH" + "".join(parts)
        + f"""
    SELECT pick, vid AS vec_id, rel, score AS mmr_score
    FROM sel{k} ORDER BY pick"""
    )


@df_query(
    "pl_mmr_rerank",
    oracle=_mmr_oracle(20, 8, 0.7),
    doc="Maximal-Marginal-Relevance diversification of retrieval "
    "output: brute-force cosine top-20 for query vec 0, then 8 greedy "
    "MMR picks at lambda=0.7 — the standard de-redundancy pass "
    "between retrieval and RAG context packing. COLLECT-FREE "
    "iterative DataFrame rounds (anti-join + broadcast max-sim + "
    "TakeOrderedAndProject argmax, picked frame lazily checkpointed "
    "so lineage stays linear in k); every round is O(N*k) work "
    "independent of corpus size (pipeline/similarity.py mmr_rerank). "
    "Oracle unrolls the greedy trace as k CTE steps with correlated "
    "MAX subqueries — bit-exact through the sequential-fold cosine.",
    tags=("pipeline", "similarity", "rerank"),
)
def pl_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.similarity import cosine_topk, mmr_rerank

    emb = spark.table("embeddings")
    top = cosine_topk(emb, emb.filter("vec_id = 0"), k=20)
    cand = top.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    ).select(
        F.col("neighbor_id").alias("vec_id"),
        F.col("cos_sim").alias("rel"),
        "embedding",
    )
    return mmr_rerank(cand, k=8, lam=0.7, rel_col="rel").orderBy("pick")


# ---------------------------------------------------------------------------
# Product quantization + ADC search (pipeline/pq.py)
# ---------------------------------------------------------------------------


def _duck_pq_sql(
    m: int = 4,
    k_codes: int = 8,
    iters: int = 2,
    topk: int = 5,
    n_queries: int = 10,
    train_rows: int = 100_000,
    dim: int = 64,
    refine: int | None = None,
) -> str:
    """Replay PQ end-to-end: per subspace, the IVF oracle's
    (assign, means, centroids) k-means triple over the SUB-sliced
    sample, then position-indexed codebooks, corpus encoding, query
    distance tables, and the ADC sum as an explicit left-associated +
    chain (bit-matching Spark's sequential zip_with fold; squared
    distances are >= +0.0 so the fold's leading zero is exact)."""
    d = dim // m
    sqd = "list_sum([(v[i] - cv[i]) * (v[i] - cv[i]) for i in range(1, len(v) + 1)])"
    parts = [
        f"""vecs AS MATERIALIZED (
      SELECT vec_id AS vid, {_D_VEC_D} AS v FROM embeddings),
    tvecs AS MATERIALIZED (SELECT * FROM vecs WHERE vid < {train_rows})"""
    ]
    for s in range(m):
        lo = s * d + 1
        parts.append(f""",
    sv{s} AS (SELECT vid, [v[i] for i in range({lo}, {lo + d})] AS v FROM tvecs),
    fv{s} AS (SELECT vid, [v[i] for i in range({lo}, {lo + d})] AS v FROM vecs),
    c{s}x0 AS (SELECT CAST(vid AS INT) AS cid, v AS cv FROM sv{s} WHERE vid < {k_codes})""")
        prev = f"c{s}x0"
        for it in range(1, iters + 1):
            parts.append(f""",
    a{s}x{it} AS (
      SELECT vid, cid FROM (
        SELECT sv{s}.vid, {prev}.cid,
               ROW_NUMBER() OVER (PARTITION BY sv{s}.vid ORDER BY {sqd}, cid) AS rn
        FROM sv{s}, {prev}
      ) WHERE rn = 1),
    m{s}x{it} AS (
      SELECT cid, dim, list_sum(list_sort(list(val))) / COUNT(val) AS mval
      FROM (
        SELECT a{s}x{it}.cid, generate_subscripts(v, 1) AS dim, unnest(v) AS val
        FROM a{s}x{it} JOIN sv{s} USING (vid)
      ) GROUP BY cid, dim),
    c{s}x{it} AS (SELECT cid, list(mval ORDER BY dim) AS cv FROM m{s}x{it} GROUP BY cid)""")
            prev = f"c{s}x{it}"
        parts.append(f""",
    b{s} AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY cid) AS INT) AS pos, cv FROM {prev}),
    e{s} AS (
      SELECT vid, pos AS pos{s} FROM (
        SELECT fv{s}.vid, b{s}.pos,
               ROW_NUMBER() OVER (PARTITION BY fv{s}.vid ORDER BY {sqd}, pos) AS rn
        FROM fv{s}, b{s}
      ) WHERE rn = 1),
    qd{s} AS (
      SELECT fv{s}.vid AS query_id, b{s}.pos, {sqd} AS dist
      FROM fv{s}, b{s} WHERE fv{s}.vid < {n_queries})""")
    adc_sum = " + ".join(f"q{s}.dist" for s in range(m))
    e_joins = "e0" + "".join(f" JOIN e{s} USING (vid)" for s in range(1, m))
    q_joins = " JOIN qd0 q0 ON q0.pos = e0.pos0" + "".join(
        f" JOIN qd{s} q{s} ON q{s}.pos = e{s}.pos{s}"
        f" AND q{s}.query_id = q0.query_id"
        for s in range(1, m)
    )
    parts.append(f""",
    adc AS (
      SELECT q0.query_id, e0.vid AS neighbor_id, {adc_sum} AS adc_dist
      FROM {e_joins}{q_joins}
      WHERE e0.vid <> q0.query_id)""")
    if refine is None:
        return (
            "WITH " + "".join(parts)
            + f"""
    SELECT query_id, neighbor_id, adc_dist, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY adc_dist, neighbor_id
      ) AS rnk FROM adc
    ) WHERE rnk <= {topk}"""
        )
    exact = (
        "list_sum([(cvv.v[i] - qvv.v[i]) * (cvv.v[i] - qvv.v[i]) "
        "for i in range(1, len(cvv.v) + 1)])"
    )
    parts.append(f""",
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY adc_dist, neighbor_id
        ) AS rn FROM adc
      ) WHERE rn <= {refine}),
    refined AS (
      SELECT s.query_id, s.neighbor_id, {exact} AS l2_dist
      FROM short s
      JOIN vecs cvv ON cvv.vid = s.neighbor_id
      JOIN vecs qvv ON qvv.vid = s.query_id)""")
    return (
        "WITH " + "".join(parts)
        + f"""
    SELECT query_id, neighbor_id, l2_dist, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY l2_dist, neighbor_id
      ) AS rnk FROM refined
    ) WHERE rnk <= {topk}"""
    )


@df_query(
    "pl_ann_pq_adc_topk",
    oracle=_duck_pq_sql(m=4, k_codes=8, iters=2, topk=5),
    doc="Product-quantized ADC top-5 (pipeline/pq.py — Jegou et al. "
    "2011, the faiss IVF-PQ pairing's memory half): 4 per-subspace "
    "codebooks fit in-driver on the bounded sample (same deterministic "
    "k-means recipe as IVF), corpus encoded to 4 code positions in one "
    "shuffle-free broadcast-model pass, queries precompute distance "
    "tables broadcast-side, and each candidate costs 4 table lookups "
    "plus a sequential fold — the scan that stays memory-bound at "
    "billions of codes. The ENTIRE pipeline incl. training is "
    "oracle-replayed in DuckDB (per-subspace k-means CTE chains, "
    "explicit left-associated ADC sum) — bit-exact codebooks, codes, "
    "and distances.",
    tags=("pipeline", "similarity", "ann", "pq"),
)
def pl_ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.pq import pq_search

    emb = spark.table("embeddings")
    return pq_search(emb, emb.filter("vec_id < 10"), m=4, k_codes=8, topk=5)


@df_query(
    "pl_ann_pq_refined_topk",
    oracle=_duck_pq_sql(m=4, k_codes=8, iters=2, topk=5, refine=50),
    doc="PQ + exact refinement (the faiss IndexRefine deployment "
    "shape): the ADC scan only SHORTLISTS the top-50 codes per query, "
    "then the shortlist's true vectors are fetched via a broadcast "
    "shortlist join (one extra corpus scan, the corpus never shuffles) "
    "and re-ranked by exact squared L2. Recovers the ordering that PQ "
    "quantization collapses — measured recall@5 0.32 -> 0.896 on the "
    "clustered fixture (pipeline/pq.py pq_search refine=50). Fully "
    "oracle-replayed incl. training.",
    tags=("pipeline", "similarity", "ann", "pq"),
)
def pl_ann_pq_refined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.pq import pq_search

    emb = spark.table("embeddings")
    return pq_search(
        emb, emb.filter("vec_id < 10"), m=4, k_codes=8, topk=5, refine=50
    )


def _duck_ivfpq_sql(
    k_cells: int = 4,
    nprobe: int = 2,
    m: int = 4,
    k_codes: int = 8,
    iters: int = 2,
    topk: int = 5,
    n_queries: int = 10,
    train_rows: int = 100_000,
    dim: int = 64,
    refine: int | None = None,
    local_books: bool = False,
) -> str:
    """Replay IVF-PQ end-to-end: the IVF oracle's coarse k-means over
    the sample, full-corpus assignment, per-element RESIDUALS, the PQ
    oracle's per-subspace k-means over the residual sample, residual
    encoding, per-(query, probed-cell) distance tables on q - c, and
    the ADC sum as an explicit left-associated + chain. ``refine``
    re-ranks the ADC top-``refine`` shortlist by exact squared L2
    (the _duck_pq_sql refine tail).

    ``local_books=True`` replays the rotation-free-LOPQ path
    (pipeline/pq.py local_books): every book CTE gains a ``cell`` key
    — seeds are each cell's k_codes lowest vids (QUALIFY ROW_NUMBER
    PARTITION BY cid ORDER BY vid), k-means assignment/update stay
    within the cell, positions renumber per cell, and encode/tables
    join on the row's own cell."""
    d = dim // m
    sqd = "list_sum([(v[i] - cv[i]) * (v[i] - cv[i]) for i in range(1, len(v) + 1)])"
    # --- coarse quantizer over the bounded sample (IVF oracle shape)
    parts = [
        f"""vecs AS MATERIALIZED (
      SELECT vec_id AS vid, {_D_VEC_D} AS v FROM embeddings),
    tvecs AS MATERIALIZED (SELECT * FROM vecs WHERE vid < {train_rows}),
    g0 AS (SELECT CAST(vid AS INT) AS cid, v AS cv FROM tvecs WHERE vid < {k_cells})"""
    ]
    prev = "g0"
    for it in range(1, iters + 1):
        parts.append(f""",
    ga{it} AS (
      SELECT vid, cid FROM (
        SELECT tvecs.vid, {prev}.cid,
               ROW_NUMBER() OVER (PARTITION BY tvecs.vid ORDER BY {sqd}, cid) AS rn
        FROM tvecs, {prev}
      ) WHERE rn = 1),
    gm{it} AS (
      SELECT cid, dim, list_sum(list_sort(list(val))) / COUNT(val) AS mval
      FROM (
        SELECT ga{it}.cid, generate_subscripts(v, 1) AS dim, unnest(v) AS val
        FROM ga{it} JOIN tvecs USING (vid)
      ) GROUP BY cid, dim),
    g{it} AS (SELECT cid, list(mval ORDER BY dim) AS cv FROM gm{it} GROUP BY cid)""")
        prev = f"g{it}"
    # --- full-corpus assignment + residuals
    parts.append(f""",
    inverted AS MATERIALIZED (
      SELECT vid, cid FROM (
        SELECT vecs.vid, {prev}.cid,
               ROW_NUMBER() OVER (PARTITION BY vecs.vid ORDER BY {sqd}, cid) AS rn
        FROM vecs, {prev}
      ) WHERE rn = 1),
    rv AS MATERIALIZED (
      SELECT vecs.vid, inverted.cid,
             [vecs.v[i] - g.cv[i] FOR i IN range(1, len(vecs.v) + 1)] AS v
      FROM vecs JOIN inverted USING (vid) JOIN {prev} g USING (cid)),
    rtv AS MATERIALIZED (SELECT * FROM rv WHERE vid < {train_rows})""")
    # --- per-subspace PQ k-means over residuals (PQ oracle shape),
    #     residual encode carrying the candidate's cid
    for s in range(m):
        lo = s * d + 1
        if local_books:
            parts.append(f""",
    sv{s} AS (SELECT vid, cid AS cell, [v[i] for i in range({lo}, {lo + d})] AS v FROM rtv),
    fv{s} AS (SELECT vid, cid, [v[i] for i in range({lo}, {lo + d})] AS v FROM rv),
    c{s}x0 AS (
      SELECT cell, CAST(vid AS INT) AS code_id, v AS cv FROM sv{s}
      QUALIFY ROW_NUMBER() OVER (PARTITION BY cell ORDER BY vid) <= {k_codes})""")
            prev_b = f"c{s}x0"
            for it in range(1, iters + 1):
                parts.append(f""",
    a{s}x{it} AS (
      SELECT vid, cell, code_id FROM (
        SELECT sv{s}.vid, b.cell, b.code_id,
               ROW_NUMBER() OVER (PARTITION BY sv{s}.vid ORDER BY {sqd}, b.code_id) AS rn
        FROM sv{s} JOIN {prev_b} b ON b.cell = sv{s}.cell
      ) WHERE rn = 1),
    m{s}x{it} AS (
      SELECT cell, code_id, dim, list_sum(list_sort(list(val))) / COUNT(val) AS mval
      FROM (
        SELECT a{s}x{it}.cell, a{s}x{it}.code_id,
               generate_subscripts(v, 1) AS dim, unnest(v) AS val
        FROM a{s}x{it} JOIN sv{s} USING (vid)
      ) GROUP BY cell, code_id, dim),
    c{s}x{it} AS (
      SELECT cell, code_id, list(mval ORDER BY dim) AS cv
      FROM m{s}x{it} GROUP BY cell, code_id)""")
                prev_b = f"c{s}x{it}"
            parts.append(f""",
    b{s} AS (
      SELECT cell, CAST(ROW_NUMBER() OVER (PARTITION BY cell ORDER BY code_id) AS INT) AS pos, cv
      FROM {prev_b}),
    e{s} AS (
      SELECT vid, cid AS ecid, pos AS pos{s} FROM (
        SELECT fv{s}.vid, fv{s}.cid, b{s}.pos,
               ROW_NUMBER() OVER (PARTITION BY fv{s}.vid ORDER BY {sqd}, pos) AS rn
        FROM fv{s} JOIN b{s} ON b{s}.cell = fv{s}.cid
      ) WHERE rn = 1)""")
            continue
        parts.append(f""",
    sv{s} AS (SELECT vid, [v[i] for i in range({lo}, {lo + d})] AS v FROM rtv),
    fv{s} AS (SELECT vid, cid, [v[i] for i in range({lo}, {lo + d})] AS v FROM rv),
    c{s}x0 AS (SELECT CAST(vid AS INT) AS cid, v AS cv FROM sv{s} WHERE vid < {k_codes})""")
        prev_b = f"c{s}x0"
        for it in range(1, iters + 1):
            parts.append(f""",
    a{s}x{it} AS (
      SELECT vid, cid FROM (
        SELECT sv{s}.vid, {prev_b}.cid,
               ROW_NUMBER() OVER (PARTITION BY sv{s}.vid ORDER BY {sqd}, cid) AS rn
        FROM sv{s}, {prev_b}
      ) WHERE rn = 1),
    m{s}x{it} AS (
      SELECT cid, dim, list_sum(list_sort(list(val))) / COUNT(val) AS mval
      FROM (
        SELECT a{s}x{it}.cid, generate_subscripts(v, 1) AS dim, unnest(v) AS val
        FROM a{s}x{it} JOIN sv{s} USING (vid)
      ) GROUP BY cid, dim),
    c{s}x{it} AS (SELECT cid, list(mval ORDER BY dim) AS cv FROM m{s}x{it} GROUP BY cid)""")
            prev_b = f"c{s}x{it}"
        parts.append(f""",
    b{s} AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY cid) AS INT) AS pos, cv FROM {prev_b}),
    e{s} AS (
      SELECT vid, cid AS ecid, pos AS pos{s} FROM (
        SELECT fv{s}.vid, fv{s}.cid, b{s}.pos,
               ROW_NUMBER() OVER (PARTITION BY fv{s}.vid ORDER BY {sqd}, pos) AS rn
        FROM fv{s}, b{s}
      ) WHERE rn = 1)""")
    # --- queries probe nprobe cells; tables on the residual q - c
    parts.append(f""",
    probed AS MATERIALIZED (
      SELECT vid AS query_id, cid FROM (
        SELECT vecs.vid, {prev}.cid,
               ROW_NUMBER() OVER (PARTITION BY vecs.vid ORDER BY {sqd}, cid) AS rn
        FROM vecs, {prev} WHERE vecs.vid < {n_queries}
      ) WHERE rn <= {nprobe}),
    qrv AS MATERIALIZED (
      SELECT p.query_id, p.cid,
             [vecs.v[i] - g.cv[i] FOR i IN range(1, len(vecs.v) + 1)] AS v
      FROM probed p JOIN vecs ON vecs.vid = p.query_id
      JOIN {prev} g USING (cid))""")
    for s in range(m):
        lo = s * d + 1
        b_join = f"JOIN b{s} ON b{s}.cell = q.cid" if local_books else f", b{s}"
        parts.append(f""",
    qd{s} AS (
      SELECT q.query_id, q.cid AS qcid, b{s}.pos, {sqd} AS dist
      FROM (SELECT query_id, cid, [v[i] for i in range({lo}, {lo + d})] AS v
            FROM qrv) q {b_join})""")
    adc_sum = " + ".join(f"q{s}.dist" for s in range(m))
    e_joins = "e0" + "".join(
        f" JOIN e{s} ON e{s}.vid = e0.vid" for s in range(1, m)
    )
    q_joins = " JOIN qd0 q0 ON q0.qcid = e0.ecid AND q0.pos = e0.pos0" + "".join(
        f" JOIN qd{s} q{s} ON q{s}.qcid = e0.ecid AND q{s}.pos = e{s}.pos{s}"
        f" AND q{s}.query_id = q0.query_id"
        for s in range(1, m)
    )
    parts.append(f""",
    adc AS (
      SELECT q0.query_id, e0.vid AS neighbor_id, {adc_sum} AS adc_dist
      FROM {e_joins}{q_joins}
      WHERE e0.vid <> q0.query_id)""")
    if refine is None:
        return (
            "WITH " + "".join(parts)
            + f"""
    SELECT query_id, neighbor_id, adc_dist, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY adc_dist, neighbor_id
      ) AS rnk FROM adc
    ) WHERE rnk <= {topk}"""
        )
    exact = (
        "list_sum([(cvv.v[i] - qvv.v[i]) * (cvv.v[i] - qvv.v[i]) "
        "for i in range(1, len(cvv.v) + 1)])"
    )
    parts.append(f""",
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY adc_dist, neighbor_id
        ) AS rn FROM adc
      ) WHERE rn <= {refine}),
    refined AS (
      SELECT s.query_id, s.neighbor_id, {exact} AS l2_dist
      FROM short s
      JOIN vecs cvv ON cvv.vid = s.neighbor_id
      JOIN vecs qvv ON qvv.vid = s.query_id)""")
    return (
        "WITH " + "".join(parts)
        + f"""
    SELECT query_id, neighbor_id, l2_dist, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY l2_dist, neighbor_id
      ) AS rnk FROM refined
    ) WHERE rnk <= {topk}"""
    )


@df_query(
    "pl_ann_ivfpq_topk",
    oracle=_duck_ivfpq_sql(k_cells=4, nprobe=2, m=4, k_codes=8, iters=2, topk=5),
    doc="IVF-PQ composed ANN (pipeline/pq.py ivfpq_search — the faiss "
    "IVFADC recipe both ivf.py and pq.py docstrings cite): coarse "
    "quantizer prunes WHICH cells a query scans, PQ codebooks fit on "
    "cell RESIDUALS compress WHAT each cell stores, and distance "
    "tables are computed per (query, probed cell) on q - c so the ADC "
    "sum approximates ||q - x||^2 with codebooks that model LOCAL "
    "geometry. Fixes plain PQ's within-cluster ADC collapse: measured "
    "recall@5 on the clustered fixture 0.300 -> 0.510 at m=16/k=64 "
    "(tests/test_recall.py; information-theoretic ceiling study in "
    "tools/ivfpq_ceiling.py). One bounded sample collect feeds both "
    "fits; the corpus never shuffles (assignment, residual, encode, "
    "and candidate-meets-query joins are all broadcast-side). ENTIRE "
    "pipeline incl. both trainings oracle-replayed in DuckDB.",
    tags=("pipeline", "similarity", "ann", "pq", "ivf"),
)
def pl_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.pq import ivfpq_search

    emb = spark.table("embeddings")
    return ivfpq_search(
        emb, emb.filter("vec_id < 10"), k_cells=4, nprobe=2, m=4,
        k_codes=8, topk=5,
    )


@df_query(
    "pl_ann_lopq_topk",
    oracle=_duck_ivfpq_sql(
        k_cells=4, nprobe=2, m=4, k_codes=8, iters=2, topk=5, local_books=True
    ),
    doc="IVF-PQ with PER-CELL codebooks — rotation-free LOPQ "
    "(Kalantidis & Avrithis 2014), adopted from the round-11 per-cell "
    "OPQ study (tools/ivfpq_ceiling.py main_r11): one codebook set per "
    "coarse cell models each cell's LOCAL residual geometry, lifting "
    "recall@5 by +0.11..+0.27 over shared books on every fixture with "
    "held-out queries (engine-measured: isotropic m=16 0.520 -> "
    "0.752, anisotropic m=8 0.504 -> 0.744 — tests/test_recall.py "
    "TestLocalBooks); the per-cell ROTATION half of LOPQ was measured "
    "and REJECTED (degrades recall, same failure as the r10 global- "
    "rotation null). Plan shape identical to pl_ann_ivfpq_topk — the "
    "model join key becomes cid, still broadcast; the corpus never "
    "shuffles. ENTIRE pipeline incl. per-cell trainings "
    "oracle-replayed in DuckDB (per-cell seeds = QUALIFY ROW_NUMBER "
    "OVER (PARTITION BY cell ORDER BY vid) <= k_codes).",
    tags=("pipeline", "similarity", "ann", "pq", "ivf", "lopq"),
)
def pl_ann_lopq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.pq import ivfpq_search

    emb = spark.table("embeddings")
    return ivfpq_search(
        emb, emb.filter("vec_id < 10"), k_cells=4, nprobe=2, m=4,
        k_codes=8, topk=5, local_books=True,
    )


@df_query(
    "pl_ann_ivfpq_refined_topk",
    oracle=_duck_ivfpq_sql(
        k_cells=4, nprobe=2, m=4, k_codes=8, iters=2, topk=5, refine=50
    ),
    doc="IVF-PQ + exact refinement — the full faiss deployment shape "
    "(IndexIVFPQ wrapped in IndexRefine): coarse cells prune the scan, "
    "residual ADC shortlists top-50 per query, and the shortlist's "
    "true vectors are re-ranked by exact squared L2 via a broadcast "
    "shortlist join (one extra corpus scan, never a corpus shuffle). "
    "Fully oracle-replayed incl. both trainings (pipeline/pq.py "
    "ivfpq_search refine=50).",
    tags=("pipeline", "similarity", "ann", "pq", "ivf"),
)
def pl_ann_ivfpq_refined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.pq import ivfpq_search

    emb = spark.table("embeddings")
    return ivfpq_search(
        emb, emb.filter("vec_id < 10"), k_cells=4, nprobe=2, m=4,
        k_codes=8, topk=5, refine=50,
    )


@df_query(
    "pl_ann_lopq_refined_topk",
    oracle=_duck_ivfpq_sql(
        k_cells=4, nprobe=2, m=4, k_codes=8, iters=2, topk=5, refine=50,
        local_books=True,
    ),
    doc="Per-cell-codebook IVF-PQ (pl_ann_lopq_topk) + exact "
    "refinement — the full deployment shape with the adopted local "
    "books: per-cell ADC shortlists top-50, the shortlist's true "
    "vectors re-rank by exact squared L2 via a broadcast shortlist "
    "join. Fully oracle-replayed incl. every per-cell training.",
    tags=("pipeline", "similarity", "ann", "pq", "ivf", "lopq"),
)
def pl_ann_lopq_refined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.pq import ivfpq_search

    emb = spark.table("embeddings")
    return ivfpq_search(
        emb, emb.filter("vec_id < 10"), k_cells=4, nprobe=2, m=4,
        k_codes=8, topk=5, refine=50, local_books=True,
    )


# ---------------------------------------------------------------------------
# Z-order key (sources/writers.py zorder_key_expr)
# ---------------------------------------------------------------------------


def _duck_zorder_sql(
    cols: list[tuple[str, float, float]], bits: int = 16
) -> str:
    """DuckDB twin of zorder_key_expr: identical normalize (double
    floor into [0, 2^bits)) and bit-interleave arithmetic, generated
    from the SAME (col, lo, hi) spec so the two dialects cannot
    drift."""
    n = len(cols)
    mx = (1 << bits) - 1
    scaled = []
    for c, lo, hi in cols:
        span = float(hi) - float(lo)
        scaled.append(
            f"LEAST({mx}, GREATEST(0, CAST(floor((CAST({c} AS DOUBLE) - {float(lo)!r})"
            f" / {span!r} * {mx}) AS BIGINT)))"
        )
    terms = []
    for i in range(bits):
        for j in range(n):
            terms.append(
                f"(({scaled[j]} & {1 << i}) * {1 << (i * (n - 1) + j)})"
            )
    return " + ".join(terms)


@df_query(
    "op_zorder_key",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST({_duck_zorder_sql([("l_partkey", 0.0, 1048576.0), ("l_suppkey", 0.0, 1048576.0)], bits=16)} AS BIGINT)
             AS zkey
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Z-order (Morton) clustering key over (l_partkey, l_suppkey): "
    "normalize each column into [0, 2^16) and interleave the bits — "
    "sorting/range-partitioning by this key gives every participating "
    "column narrow per-file min/max statistics, so single- OR "
    "multi-column range predicates skip most files at scan time (the "
    "Delta/Iceberg OPTIMIZE ZORDER layout trick; sources/writers.py "
    "zorder_key_expr + write_zordered, skipping asserted in "
    "tests/test_sources.py). Pure codegen integer/double arithmetic; "
    "the oracle's interleave is generated from the same column spec.",
    tags=("operators", "layout", "sources"),
)
def op_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.sources.writers import zorder_key_expr

    key = zorder_key_expr(
        [("l_partkey", 0.0, 1048576.0), ("l_suppkey", 0.0, 1048576.0)],
        bits=16,
    )
    return (
        spark.table("lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            key.cast("bigint").alias("zkey"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def _mmr_grouped_oracle(
    n_queries: int = 4, n_cand: int = 12, k: int = 4, lam: float = 0.7
) -> str:
    """Unrolled grouped-MMR CTE: per step, the per-query argmax is a
    ROW_NUMBER over the query partition (mirroring the engine's
    windowed pick); max-sim-to-selected is a query-correlated scalar
    MAX. sel CTEs are MATERIALIZED (three references per step)."""
    lam_s = f"CAST({lam!r} AS DOUBLE)"
    om_s = f"CAST({1.0 - lam!r} AS DOUBLE)"
    # diversity term carries the engine's zero-norm guard (ADVICE r08)
    cos = _duck_safe_cosine("c.v", "s.v")
    parts = [
        f""" cand AS MATERIALIZED (
      SELECT query_id, vid, rel, v FROM (
        SELECT q.vid AS query_id, c.vid AS vid,
               {_duck_cosine('q.v', 'c.v')} AS rel, c.v AS v,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vid
                 ORDER BY {_duck_cosine('q.v', 'c.v')} DESC, c.vid
               ) AS rnk
        FROM (SELECT vec_id AS vid, {_D_VEC_D} AS v FROM embeddings) c
        CROSS JOIN (SELECT vec_id AS vid, {_D_VEC_D} AS v FROM embeddings
                    WHERE vec_id < {n_queries}) q
        WHERE c.vid <> q.vid
      ) WHERE rnk <= {n_cand}),
    sel1 AS MATERIALIZED (
      SELECT query_id, vid, rel, v, {lam_s} * rel AS score,
             CAST(1 AS BIGINT) AS pick
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY rel DESC, vid) AS rn
        FROM cand
      ) WHERE rn = 1)"""
    ]
    for i in range(2, k + 1):
        parts.append(f""",
    s{i} AS (
      SELECT query_id, vid, rel, v, score, CAST({i} AS BIGINT) AS pick
      FROM (
        SELECT x.*, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY score DESC, vid) AS rn
        FROM (
          SELECT c.query_id, c.vid, c.rel, c.v,
                 {lam_s} * c.rel - {om_s} * (
                   SELECT MAX({cos}) FROM sel{i - 1} s
                   WHERE s.query_id = c.query_id) AS score
          FROM cand c
          WHERE NOT EXISTS (
            SELECT 1 FROM sel{i - 1} s2
            WHERE s2.query_id = c.query_id AND s2.vid = c.vid)
        ) x
      ) WHERE rn = 1),
    sel{i} AS MATERIALIZED (
      SELECT * FROM sel{i - 1} UNION ALL SELECT * FROM s{i})""")
    return (
        "WITH" + "".join(parts)
        + f"""
    SELECT query_id, pick, vid AS vec_id, rel, score AS mmr_score
    FROM sel{k} ORDER BY query_id, pick"""
    )


@df_query(
    "pl_mmr_rerank_grouped",
    oracle=_mmr_grouped_oracle(4, 12, 4, 0.7),
    doc="Batch MMR: per-query diversification of 4 queries' brute-"
    "force top-12 lists in the SAME 4 greedy rounds — the per-round "
    "global LIMIT 1 becomes a row_number over the query partition, so "
    "one windowed pass serves every query and wall-clock is O(k) "
    "rounds regardless of query count (pipeline/similarity.py "
    "mmr_rerank_grouped). Oracle unrolls the rounds with per-query "
    "window argmax + query-correlated MAX subqueries.",
    tags=("pipeline", "similarity", "rerank"),
)
def pl_mmr_rerank_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.similarity import cosine_topk, mmr_rerank_grouped

    emb = spark.table("embeddings")
    top = cosine_topk(emb, emb.filter("vec_id < 4"), k=12)
    cand = top.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    ).select(
        "query_id",
        F.col("neighbor_id").alias("vec_id"),
        F.col("cos_sim").alias("rel"),
        "embedding",
    )
    return mmr_rerank_grouped(cand, k=4, lam=0.7).orderBy("query_id", "pick")
