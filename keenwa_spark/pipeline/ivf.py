"""IVF (inverted-file) approximate nearest neighbor: coarse k-means
quantizer + cell-probed search.

The second scale path next to sign-LSH (similarity.py): train K coarse
centroids with a few Lloyd iterations, assign the corpus to cells
(the inverted file), and search only the query's ``nprobe`` nearest
cells. At 100 TB the corpus-side cost is one assignment pass + a
cell-keyed shuffle; queries touch nprobe/K of the corpus.

Everything is DETERMINISTIC so the whole pipeline — training included —
is exactly oracle-checkable in DuckDB:
- init: centroids = vectors of ids 0..K-1 (no RNG);
- assignment: squared-L2 sequential fold, ties broken by cell id;
- centroid update: per-dimension mean via SORTED fold (the float
  aggregation rule from similarity.label_centroids);
- a fixed iteration count (no data-dependent stopping).

No driver-side data movement: centroids stay a K-row DataFrame,
broadcast into the assignment cross join; per-iteration
localCheckpoint bounds lineage (iterative-plan rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SQDIST = (
    "aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), "
    "CAST(0 AS DOUBLE), (acc, d) -> acc + d)"
)
_COS = (
    "aggregate(zip_with(v, qv, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, d) -> acc + d)"
    " / sqrt(aggregate(transform(v, x -> x * x), CAST(0 AS DOUBLE), (acc, d) -> acc + d))"
    " / sqrt(aggregate(transform(qv, x -> x * x), CAST(0 AS DOUBLE), (acc, d) -> acc + d))"
)

# Per-cell (dist, cid) structs, computed inline over the broadcast
# centroid array `cs` — struct ordering is lexicographic, so
# array_min/array_sort give argmin with deterministic cid tie-break.
_CELL_DISTS = (
    "transform(cs, c -> struct("
    "aggregate(zip_with(v, c.cv, (x, y) -> (x - y) * (x - y)), "
    "CAST(0 AS DOUBLE), (acc, d) -> acc + d) AS dist, c.cid AS cid))"
)


def _as_vecs(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v"),
    )


def _cents_row(cents: DataFrame) -> DataFrame:
    """Collapse the K-row centroid frame into ONE row holding
    array<struct<cid, cv>> — broadcast-joined below so centroid
    assignment is a pure per-row map (no row multiplication, no
    shuffle). K is small by construction (coarse quantizer)."""
    return cents.agg(F.collect_list(F.struct("cid", "cv")).alias("cs"))


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per vector (squared L2, tie-break on cid).

    Pure map: earlier versions exploded corpus x K rows and ranked with
    a row_number window — a corpus x K shuffle per Lloyd iteration. The
    argmin-over-broadcast-array form keeps assignment inside
    whole-stage codegen with ZERO shuffle and ZERO row multiplication —
    what a 100 TB assignment pass needs. (At sf0.1 wall-clock is
    unchanged — 2k vectors are overhead-dominated — but the corpus x K
    exchange it removes grows linearly with data; the map doesn't.)"""
    return vecs.crossJoin(F.broadcast(_cents_row(cents))).select(
        "vid", F.expr(f"array_min({_CELL_DISTS}).cid").alias("cid")
    )


def ivf_train(
    emb: DataFrame,
    k_cells: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train the coarse quantizer; returns (cid, cv) centroids."""
    vecs = _as_vecs(emb, id_col, vec_col)
    cents = vecs.filter(F.col("vid") < k_cells).select(
        F.col("vid").cast("int").alias("cid"), F.col("v").alias("cv")
    )
    sorted_mean = (
        "aggregate(sort_array(collect_list(val)), CAST(0 AS DOUBLE), "
        "(acc, x) -> acc + x) / count(val)"
    )
    for _ in range(iters):
        assign = _assign(vecs, cents)
        dims = assign.join(vecs, "vid").select(
            "cid", F.posexplode("v").alias("dim", "val")
        )
        means = dims.groupBy("cid", "dim").agg(F.expr(sorted_mean).alias("mval"))
        cents = (
            means.groupBy("cid")
            .agg(
                F.expr(
                    "transform(sort_array(collect_list(struct(dim, mval))), s -> s.mval)"
                ).alias("cv")
            )
            .localCheckpoint(eager=True)
        )
    return cents


def ivf_search(
    emb: DataFrame,
    queries: DataFrame,
    k_cells: int = 8,
    iters: int = 2,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train + probe: top-k cosine neighbors from the query's nprobe
    nearest cells. Output (query_id, neighbor_id, cos_sim, rnk)."""
    cents = ivf_train(emb, k_cells, iters, id_col, vec_col)
    corpus = _as_vecs(emb, id_col, vec_col)
    inverted = _assign(corpus, cents).join(corpus, "vid")

    qvecs = _as_vecs(queries, id_col, vec_col)
    # nprobe nearest cells per query: sort the per-cell (dist, cid)
    # array and take the prefix — same zero-shuffle map as _assign
    probed = (
        qvecs.crossJoin(F.broadcast(_cents_row(cents)))
        .select(
            F.col("vid").alias("query_id"),
            F.col("v").alias("qv"),
            F.explode(
                F.expr(
                    f"transform(slice(array_sort({_CELL_DISTS}), 1, {int(nprobe)}), "
                    "s -> s.cid)"
                )
            ).alias("cid"),
        )
    )
    scored = (
        # probe side = queries x nprobe rows — tiny by construction;
        # broadcast so the corpus-side inverted list never shuffles on cid
        inverted.join(F.broadcast(probed), "cid")
        .filter(F.col("vid") != F.col("query_id"))
        .withColumn("cos_sim", F.expr(_COS))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vid").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            "cos_sim",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )
