"""Executable query inventory — one entry per operator/construct from
SURVEY.md §2, each with a DuckDB oracle SQL string where the semantics
are ANSI-SQL-expressible.

This is the layer keenwa could never have (it has no executor): every
construct its optimizer can plan, we plan AND execute, and verify by
value against an independent engine. Registry entries are consumed by
``__spark_entry__.py`` (the driver contract) and by the local harness
``tools/check_correctness.py``.

Cross-engine determinism conventions (see SURVEY.md §7 risk register):
- money/quantity sums go through DECIMAL(18,2) so the aggregation is
  exact and partition-order-independent, then CAST back to DOUBLE so
  the output schema is plain float64 on both engines;
- SUM(int) is CAST to BIGINT (DuckDB returns HUGEINT otherwise);
- timestamps are cast to DATE or epoch BIGINT in outputs (arrow
  tz-aware vs naive mismatch);
- every computed column is aliased identically in both dialects;
- rankings always carry a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# name -> spec
REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def ensure_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the standard tables of ``sf_dir`` as temp views (cached
    per SparkSession so repeated query calls don't re-register).

    The cache marker lives on the session object itself (not ``id()``,
    which can be reused after GC — see ADVICE r01)."""
    from keenwa_spark.catalog import Catalog

    if getattr(spark, "_keenwa_views_dir", None) == sf_dir:
        return
    Catalog(spark).register_dir(sf_dir)
    spark._keenwa_views_dir = sf_dir  # type: ignore[attr-defined]


def register(
    name: str,
    fn: Callable[[SparkSession, str], DataFrame],
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> None:
    if name in REGISTRY:
        raise ValueError(f"duplicate query name: {name}")
    REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)


def sql_query(
    name: str,
    spark_sql: str,
    oracle: str | None = "",
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> None:
    """Register a query given as Spark SQL text. ``oracle=""`` (default)
    means the same text runs on DuckDB (shared-dialect subset);
    ``oracle=None`` means no oracle (rows-only check)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_views(spark, sf_dir)
        from keenwa_spark import dialect

        dialect.validate(spark_sql)
        return spark.sql(spark_sql)

    register(name, fn, spark_sql if oracle == "" else oracle, doc=doc, tags=tags)


def df_query(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator for queries written with the DataFrame API / builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_views(spark, sf_dir)
            return fn(spark, sf_dir)

        register(name, wrapped, oracle, doc=doc, tags=tags)
        return fn

    return deco


#: entries HOISTED to the front of the 50-slot driver prefix so the
#: driver's own CORRECTNESS file witnesses one representative of every
#: major beyond-§2 family each round (VERDICT r05 item 4): a full
#: TPC-H query, MinHash/LSH dedup, ANN similarity, a streaming-batch
#: twin, the round's headline rewrite (curriculum two-pass rank), and
#: the new builder scalar subquery. The §2 rows they displace
#: (distinct_on_expr, subq_scalar_select, subq_in_correlated,
#: win_multiple_functions, win_partition_only, join_natural) stay
#: driver-green in earlier rounds' CORRECTNESS files and all-green in
#: the local full-registry gate every round (COVERAGE.md).
DRIVER_PREFIX_ROTATION = (
    "q1_pricing_summary",
    "pl_minhash_lsh_pairs",
    "pl_ann_cosine_topk",
    "st_window_counts",
    "pl_curriculum_stages",
    "bld_scalar_subquery",
    # round 7: the multimodal family's driver witness (VERDICT r06
    # item 4) — PNG decode + aHash banded dedup vs a brute-force
    # constant oracle
    "pl_image_ahash_dedup",
    # round 8 (VERDICT r07 item 3): families that had never earned a
    # driver-file row — blocked fuzzy linkage, fixed-iteration
    # PageRank, BM25 ranking, duplicated-span statistics, the
    # DuckDB-native ASOF attribution join, and incremental rollup
    # maintenance
    "pl_record_linkage",
    "pl_graph_pagerank",
    "pl_search_bm25",
    "pl_dup_span_stats",
    "op_asof_attribution",
    "op_rollup_incremental",
)

#: §2 rows moved out of the prefix to make room (chosen because each
#: has a sibling prefix row exercising the same code path)
_ROTATED_OUT = (
    "distinct_on_expr",
    "subq_scalar_select",
    "subq_in_correlated",
    "win_multiple_functions",
    "win_partition_only",
    "join_natural",
    # round 7: builder IN-subquery — bld_exists stays as the builder
    # subquery prefix witness; the IN semantics stay witnessed by
    # subq_in / subq_not_in / subq_not_in_nulls
    "bld_in_subquery",
    # round 8: six more §2 rows, each driver-green since the r1-r7
    # files and each with a sibling prefix row on the same code path —
    # join_right (join_left/join_full), join_using (join_inner),
    # subq_not_exists (subq_exists), subq_not_in (subq_not_in_nulls),
    # win_first_last_value (win_rank/win_agg_over), derived_table
    # (cte_reuse)
    "join_right",
    "join_using",
    "subq_not_exists",
    "subq_not_in",
    "win_first_last_value",
    "derived_table",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry.

    REGISTRY ORDER MATTERS: the driver's correctness gate records a
    bounded PREFIX of the registry (exactly the first 50 entries —
    VERDICT r02 item 1). The SURVEY §2 core registers first — the
    relational algebra (29), subqueries (10), windows (8), the
    array-expression row (1), builder subquery entry points — and then
    ``DRIVER_PREFIX_ROTATION`` hoists one representative per
    beyond-§2 family into the prefix while ``_ROTATED_OUT`` §2 rows
    (each redundant with a sibling prefix row) move after it. The
    FULL registry keeps its evidence via the local mirror
    (tools/check_correctness.py, all-green every round) and pytest —
    see COVERAGE.md.
    """
    from keenwa_spark.queries import (  # noqa: F401
        relational,
        subqueries,
        windows,
        arrays,
        builder_subqueries,
    )
    from keenwa_spark.queries import (  # noqa: F401
        analytics,
        builder_queries,
        events,
        expressions,
        multimodal_queries,
        pipeline,
        sketch_queries,
        streaming_queries,
        temporal,
        tpch_full,
    )

    core = [
        n
        for n in REGISTRY
        if n not in DRIVER_PREFIX_ROTATION and n not in _ROTATED_OUT
    ]
    n_core = 50 - len(DRIVER_PREFIX_ROTATION)
    order = (
        core[:n_core]
        + list(DRIVER_PREFIX_ROTATION)
        + list(_ROTATED_OUT)
        + core[n_core:]
    )
    return {n: REGISTRY[n] for n in order}
