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


#: THE 50 registry entries the driver's correctness gate witnesses
#: this round (it records exactly the first 50 of load_all order —
#: VERDICT r02 item 1). Round-9 policy (VERDICT r08 item 2): rotate
#: AGGRESSIVELY — a handful of sentinels that stay every round (one
#: per §2 macro-family, each also a bench headline), and every other
#: slot given to entries that have NEVER appeared in any
#: CORRECTNESS_r*.json (163 of 273 after r8; at the old 6-per-round
#: pace full witness would have taken ~27 rounds). Everything rotated
#: OUT keeps its r1-r8 driver rows and stays green in the local
#: full-registry gate every round (tools/check_correctness.py,
#: COVERAGE.md). Re-rotate each round: swap the non-sentinel block
#: for the next never-witnessed batch (tools/gen_inventory.py prints
#: the remaining names).
DRIVER_PREFIX = (
    # --- sentinels (stay every round; driver-witnessed r1-r9).
    # q6_forecast_revenue stays as the TPC-H sentinel (all 22 TPC-H
    # rows hold driver rows after r9; the invariant test keeps one in
    # the window every round).
    "flagship_top_customers",
    "join_inner",
    "agg_group_having",
    "win_topn_per_group",
    "q6_forecast_revenue",
    # --- round-13 rotation (VERDICT r12 item 4): POLICY SWITCH —
    # the never-witnessed tail closed in r12 (every registry entry
    # holds >=1 driver-file row), so from this round the 45
    # non-sentinel slots re-witness the STALEST rows first (oldest
    # last-witness round, tools/next_rotation.py staleness order).
    # This batch is the r2-era cohort: TPC-H q5/q10/q18, the events
    # suite, the expression/function rows, and the earliest pipeline
    # dedup/ANN rows — none witnessed since CORRECTNESS_r02.json.
    "q5_local_supplier_volume",
    "q10_returned_items",
    "ev_value_percentiles",
    "agg_grouping_sets",
    "q18_large_volume_customer",
    "bld_star_join_topk",
    "bld_setops_semi",
    "bld_distinct_on_window",
    "ev_type_rollup",
    "ev_daily_activity",
    "ev_topk_users",
    "ev_sessionize",
    "ev_funnel",
    "ev_cohort_retention",
    "ev_props_json",
    "expr_arithmetic",
    "expr_comparison_logic",
    "expr_concat",
    "expr_cast",
    "expr_not_negation",
    "expr_in_list",
    "expr_is_family",
    "expr_between",
    "expr_case",
    "expr_tuple",
    "expr_tuple_field",
    "expr_like",
    "expr_like_escape",
    "agg_distinct_filter",
    "fn_strings",
    "expr_interval",
    "expr_array_explode",
    "expr_time_shim",
    "fn_strings_superset",
    "expr_interval_ops",
    "fn_math_datetime",
    "expr_typed_null",
    "pl_dedup_exact",
    "pl_minhash_signatures",
    "pl_dedup_clusters",
    "pl_simhash",
    "pl_ngram_jaccard",
    "pl_ann_lsh_topk",
    "pl_ann_ivf_topk",
    "pl_embedding_centroids",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry.

    REGISTRY ORDER MATTERS: the driver's correctness gate records a
    bounded PREFIX of the registry (exactly the first 50 entries —
    VERDICT r02 item 1). ``DRIVER_PREFIX`` holds those 50 slots
    explicitly (sentinels + this round's never-witnessed rotation);
    everything else follows in registration order. The FULL registry
    keeps its evidence via the local mirror
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

    rest = [n for n in REGISTRY if n not in DRIVER_PREFIX]
    return {n: REGISTRY[n] for n in (*DRIVER_PREFIX, *rest)}
