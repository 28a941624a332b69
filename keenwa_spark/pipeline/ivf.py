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

Centroids are MODEL STATE, not data: K x dim doubles, a constant
independent of corpus size. They live on the driver between passes
(the documented bounded-metadata exception to the no-collect rule,
like similarity.py's query matrix) and are inlined into assignment as
literal expressions — so every corpus pass is a single-stage pure
projection: no join, no broadcast exchange, no shuffle, no row
multiplication. Values round-trip exactly via repr -> CAST(string AS
DOUBLE) (correctly-rounded parse), keeping bit-exact oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_COS = (
    "aggregate(zip_with(v, qv, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, d) -> acc + d)"
    " / sqrt(aggregate(transform(v, x -> x * x), CAST(0 AS DOUBLE), (acc, d) -> acc + d))"
    " / sqrt(aggregate(transform(qv, x -> x * x), CAST(0 AS DOUBLE), (acc, d) -> acc + d))"
)

#: centroid model: list of (cid, vector) held driver-side during train
Cents = list[tuple[int, list[float]]]


def _as_vecs(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v"),
    )


def _dlit(x: float) -> str:
    """Exact double literal: repr round-trips the IEEE value, string
    cast parses correctly-rounded — identical bits on both engines."""
    return f"CAST('{x!r}' AS DOUBLE)"


def _cell_structs(cents: Cents) -> str:
    """SQL: array of (dist-to-v, cid) structs, one per centroid, with
    the same sequential-fold squared-L2 as the oracle. Struct ordering
    is lexicographic, so array_min/array_sort give argmin with the
    deterministic cid tie-break."""
    cells = ", ".join(
        "struct("
        f"aggregate(zip_with(v, array({', '.join(_dlit(x) for x in cv)}), "
        "(x, y) -> (x - y) * (x - y)), CAST(0 AS DOUBLE), (acc, d) -> acc + d)"
        f" AS dist, {cid} AS cid)"
        for cid, cv in cents
    )
    return f"array({cells})"


def _assign(vecs: DataFrame, cents: Cents) -> DataFrame:
    """Nearest centroid per vector — a single-stage projection (module
    docstring). Earlier versions exploded corpus x K rows and ranked
    with a window (a corpus-sized shuffle per Lloyd iteration)."""
    return vecs.select(
        "vid", F.expr(f"array_min({_cell_structs(cents)}).cid").alias("cid")
    )


def _train(
    emb: DataFrame, k_cells: int, iters: int, id_col: str, vec_col: str
) -> Cents:
    """Lloyd iterations; centroids come back to the driver after each
    update (K x dim doubles — bounded model state)."""
    vecs = _as_vecs(emb, id_col, vec_col)
    cents: Cents = sorted(
        (int(r.vid), list(r.v))
        for r in vecs.filter(F.col("vid") < k_cells).collect()
    )
    sorted_mean = (
        "aggregate(sort_array(collect_list(val)), CAST(0 AS DOUBLE), "
        "(acc, x) -> acc + x) / count(val)"
    )
    for _ in range(iters):
        # cid computed INLINE on the vector's own row (assignment is a
        # projection) — no assign-back join, so the only shuffle per
        # iteration is the (cid, dim) mean aggregation
        dims = vecs.withColumn(
            "cid", F.expr(f"array_min({_cell_structs(cents)}).cid")
        ).select("cid", F.posexplode("v").alias("dim", "val"))
        means = dims.groupBy("cid", "dim").agg(F.expr(sorted_mean).alias("mval"))
        new = (
            means.groupBy("cid")
            .agg(
                F.expr(
                    "transform(sort_array(collect_list(struct(dim, mval))), s -> s.mval)"
                ).alias("cv")
            )
            .collect()
        )
        cents = sorted((int(r.cid), list(r.cv)) for r in new)
    return cents


def ivf_train(
    emb: DataFrame,
    k_cells: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train the coarse quantizer; returns (cid, cv) centroids as a
    DataFrame (API mirror of the other pipeline trainers)."""
    cents = _train(emb, k_cells, iters, id_col, vec_col)
    return emb.sparkSession.createDataFrame(
        [(cid, cv) for cid, cv in cents], "cid INT, cv ARRAY<DOUBLE>"
    )


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
    cents = _train(emb, k_cells, iters, id_col, vec_col)
    # inverted file: cell id projected onto the corpus row itself — the
    # corpus is scanned once, mapped, and never joined back to itself
    inverted = _as_vecs(emb, id_col, vec_col).withColumn(
        "cid", F.expr(f"array_min({_cell_structs(cents)}).cid")
    )

    # nprobe nearest cells per query: sort the per-cell (dist, cid)
    # array and explode the prefix — same single-stage map as _assign
    probed = _as_vecs(queries, id_col, vec_col).select(
        F.col("vid").alias("query_id"),
        F.col("v").alias("qv"),
        F.explode(
            F.expr(
                f"transform(slice(array_sort({_cell_structs(cents)}), 1, "
                f"{int(nprobe)}), s -> s.cid)"
            )
        ).alias("cid"),
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
