"""Window function inventory — SURVEY.md §2 rows 13, 44-47.

The reference's complete window-function surface: row_number, rank,
first_value, last_value (reference src/operators/scalar/aggregates.rs:75-96)
plus any aggregate usable as a window function (WindowOrAggregateFunction,
reference aggregates.rs:126-129). One LogicalWindowAggregate node per
window function in the reference (nested-node split, reference
src/operators/builder/mod.rs:386-415) — Spark fuses same-window functions
into one Window physical node, a strict improvement.

Determinism notes (SURVEY §7 risk 3):
- the reference's SQL frontend only accepts OVER (PARTITION BY ...) with
  no ORDER BY (reference src/sql/mod.rs:1338-1351); Spark requires
  ORDER BY for ranking functions, so ranked queries here carry an
  explicit deterministic (unique-key) ordering and the no-ORDER-BY
  parity case uses an aggregate window (legal in both engines);
- running SUM over doubles is ordered accumulation — deterministic
  under a unique total order, so no decimal detour is needed there;
  whole-partition SUM (no ORDER BY) has no defined order → decimal.
"""

from __future__ import annotations

from keenwa_spark.queries import sql_query

sql_query(
    "win_row_number",
    """
    SELECT
      o_custkey,
      o_orderkey,
      o_totalprice,
      CAST(ROW_NUMBER() OVER (
        PARTITION BY o_custkey
        ORDER BY o_totalprice DESC, o_orderkey
      ) AS BIGINT) AS rn
    FROM orders
    WHERE o_custkey <= 120
    """,
    doc="row_number (reference aggregates.rs:75-96) with a unique "
    "(price, orderkey) tie-broken ordering.",
    tags=("window",),
)

sql_query(
    "win_rank",
    """
    SELECT
      l_orderkey,
      l_linenumber,
      l_quantity,
      CAST(RANK() OVER (
        PARTITION BY l_orderkey
        ORDER BY l_quantity DESC
      ) AS BIGINT) AS qty_rank
    FROM lineitem
    WHERE l_orderkey <= 800
    """,
    doc="rank with real ties (l_quantity repeats within an order): rank "
    "values are deterministic under ties even though peer order is not — "
    "the output rows carry unique (orderkey, linenumber) identity.",
    tags=("window",),
)

sql_query(
    "win_first_last_value",
    """
    SELECT
      o_custkey,
      o_orderkey,
      FIRST_VALUE(o_totalprice) OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
      ) AS first_price,
      LAST_VALUE(o_totalprice) OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
      ) AS last_price,
      LAST_VALUE(o_totalprice) OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
      ) AS running_last
    FROM orders
    WHERE o_custkey <= 100
    """,
    doc="first_value / last_value (reference aggregates.rs:84-88): "
    "whole-partition last via explicit frame, plus the default-frame "
    "running last (== current row) — both deterministic under the unique "
    "(date, orderkey) order. The reference never populates frames "
    "(frontend rejects them, sql/mod.rs:1339-1340) — frames here are the "
    "Spark-native superset, flagged in the dialect strict matrix.",
    tags=("window",),
)

sql_query(
    "win_agg_over",
    """
    SELECT
      o_custkey,
      o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
      ) AS DOUBLE) AS running_spend,
      COUNT(*) OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
      ) AS nth_order
    FROM orders
    WHERE o_custkey <= 80
    """,
    doc="Aggregate used as window function (reference "
    "WindowOrAggregateFunction aggregates.rs:126-129): running sum/count. "
    "The running sum routes through DECIMAL: 'same ordered accumulation "
    "sequence' is NOT a cross-engine guarantee — DuckDB's window "
    "aggregates use tree-based (pairwise) summation, which diverged by "
    "an ulp once partitions grew past a handful of rows "
    "(duplicate-content sweep find); decimal running sums are "
    "order-shape-independent.",
    tags=("window",),
)

sql_query(
    "win_partition_only",
    """
    SELECT
      c_custkey,
      c_nationkey,
      c_acctbal,
      COUNT(*) OVER (PARTITION BY c_nationkey) AS nation_peers,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
           OVER (PARTITION BY c_nationkey) AS DOUBLE) AS nation_bal,
      MAX(c_acctbal) OVER (PARTITION BY c_nationkey) AS nation_max
    FROM customer
    WHERE c_custkey <= 400
    """,
    doc="OVER (PARTITION BY ...) with no ORDER BY — the only window form "
    "the reference's SQL frontend accepts (reference sql/mod.rs:1338-1351). "
    "Whole-partition SUM routed through decimal (no defined accumulation "
    "order).",
    tags=("window",),
)

sql_query(
    "win_multiple_functions",
    """
    SELECT
      s_suppkey,
      s_nationkey,
      s_acctbal,
      CAST(ROW_NUMBER() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS rn,
      CAST(RANK()       OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS rk,
      FIRST_VALUE(s_suppkey) OVER (
        PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
      ) AS richest_supp
    FROM supplier
    """,
    doc="Multiple window functions in one projection — the reference "
    "splits these into nested LogicalWindowAggregate nodes (reference "
    "builder/mod.rs:386-415); Spark fuses same-spec windows into one "
    "physical Window node (single sort+shuffle, strictly better).",
    tags=("window",),
)

sql_query(
    "win_lag_lead_ntile",
    """
    SELECT
      o_custkey,
      o_orderkey,
      o_totalprice,
      LAG(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        AS prev_price,
      LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        AS next_price,
      CAST(NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        AS BIGINT) AS price_quartile
    FROM orders
    WHERE o_custkey <= 60
    """,
    doc="lag / lead / ntile — beyond the reference's 4-function window "
    "inventory (aggregates.rs:75-96); the Spark-native superset under "
    "the same deterministic unique-key orderings.",
    tags=("window", "superset"),
)

sql_query(
    "win_topn_per_group",
    """
    SELECT c_nationkey, c_custkey, c_acctbal
    FROM (
      SELECT
        c_nationkey,
        c_custkey,
        c_acctbal,
        ROW_NUMBER() OVER (
          PARTITION BY c_nationkey
          ORDER BY c_acctbal DESC, c_custkey
        ) AS rn
      FROM customer
    ) ranked
    WHERE rn <= 3
    """,
    doc="Top-N per group — the canonical window+filter composition "
    "(window node under LogicalSelect). At scale this is the "
    "shuffle-once pattern vs a self-join top-N.",
    tags=("window",),
)

