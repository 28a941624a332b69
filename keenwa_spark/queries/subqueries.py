"""Subquery inventory — SURVEY.md §2 rows 36-38.

Scalar / EXISTS / IN subqueries, correlated and uncorrelated
(reference Expr::SubQuery/Exists/InSubQuery src/operators/scalar/
expr.rs:148-152). The reference decorrelates at build time
(EXISTS → left-semi, NOT EXISTS → left join + IS NULL, IN → left-semi,
NOT IN → left join + IS NULL; reference src/operators/builder/
subqueries.rs:186-367). Spark's RewritePredicateSubquery does the same
rewrite, except NOT IN becomes a *null-aware* anti join — standard SQL
three-valued semantics, which the reference's IS-NULL rewrite gets
wrong when the subquery column contains NULLs. Per SURVEY §7 risk 2 we
adopt standard semantics (Spark == DuckDB) and pin the divergence with
an explicit NULL-bearing oracle case (subq_not_in_nulls).
"""

from __future__ import annotations

from keenwa_spark.queries import sql_query

sql_query(
    "subq_scalar_uncorrelated",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.8 * (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      FROM orders
    )
    """,
    doc="Uncorrelated scalar subquery in WHERE (reference expr.rs:148): "
    "orders above 1.8x the global mean. Mean routed through decimal so "
    "the threshold is bit-identical cross-engine. 1.8x (not 2x) keeps "
    "the result NON-empty at every SF (1449 rows at sf0.01) so the "
    "check isn't a vacuous empty-vs-empty match.",
    tags=("subquery",),
)

sql_query(
    "subq_scalar_select",
    """
    SELECT
      n_name,
      (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust,
      (SELECT MAX(s_acctbal) FROM supplier) AS best_supp_bal
    FROM nation
    """,
    doc="Scalar subqueries in the projection — one correlated (per-nation "
    "customer count), one uncorrelated (global max). Catalyst decorrelates "
    "the first into an aggregate+join.",
    tags=("subquery",),
)

sql_query(
    "subq_scalar_correlated",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 3 * (
      SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*)
      FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    """,
    doc="Correlated scalar subquery: orders 3x above their customer's own "
    "mean (reference decorrelation gate subqueries.rs:54-103).",
    tags=("subquery",),
)

sql_query(
    "subq_exists",
    """
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
    )
    """,
    doc="Correlated EXISTS → left-semi join (reference "
    "subqueries.rs:186-232; Spark RewritePredicateSubquery).",
    tags=("subquery",),
)

sql_query(
    "subq_not_exists",
    """
    SELECT p_partkey, p_name
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_partkey = p.p_partkey
        AND l.l_discount > 0.09 AND l.l_quantity >= 40
    )
    """,
    doc="Correlated NOT EXISTS → anti join (reference rewrites to left "
    "join + IS NULL, subqueries.rs:233-277; Spark plans left-anti "
    "directly — same result, fewer nodes). Predicate chosen so the "
    "anti side is NON-empty at every SF (1413 rows at sf0.01) — an "
    "empty result can't distinguish the anti join from an empty plan.",
    tags=("subquery",),
)

sql_query(
    "subq_in",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (
      SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 1)
    )
    """,
    doc="Uncorrelated IN subquery → left-semi (reference "
    "subqueries.rs:281-335).",
    tags=("subquery",),
)

sql_query(
    "subq_in_correlated",
    """
    SELECT o_orderkey, o_custkey
    FROM orders o
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48
    )
    """,
    doc="Correlated IN subquery (reference "
    "correlated_in_subquery_tests.yaml corpus, 128 LoC).",
    tags=("subquery",),
)

sql_query(
    "subq_not_in",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey NOT IN (
      SELECT n_nationkey FROM nation WHERE n_regionkey = 0
    )
    """,
    doc="NOT IN with a NULL-free subquery column — plain anti-join "
    "semantics, all engines agree.",
    tags=("subquery",),
)

sql_query(
    "subq_not_in_nulls",
    """
    SELECT c_custkey
    FROM customer
    WHERE c_nationkey NOT IN (
      SELECT NULLIF(n_nationkey, 5) FROM nation WHERE n_regionkey = 0
    )
    """,
    doc="THE null-semantics pin (SURVEY §7 risk 2): the subquery column "
    "contains a NULL (NULLIF manufactures it), so standard three-valued "
    "NOT IN returns zero rows. Spark's null-aware anti join and DuckDB "
    "agree; the reference's left-join+IS-NULL rewrite "
    "(subqueries.rs:336-366) would wrongly return rows — we adopt "
    "standard SQL and document the divergence.",
    tags=("subquery", "null-semantics"),
)

sql_query(
    "subq_in_nulls_outer",
    """
    SELECT c_custkey,
           NULLIF(c_nationkey, 7) IN (3, 9, NULL) AS in_list_3vl
    FROM customer
    WHERE NULLIF(c_nationkey, 7) IN (
      SELECT n_nationkey FROM nation WHERE n_regionkey <= 1
    )
      AND c_custkey <= 400
    """,
    doc="Three-valued IN with NULLs on the OUTER side, in both positions "
    "where engines agree: (a) filter-position IN-subquery — NULL outer → "
    "UNKNOWN → row dropped, identical in Spark/DuckDB; (b) projected "
    "in-LIST with a NULL element (expr.rs:50-54 InList) — full 3VL. "
    "Deliberately NOT a projected IN-subquery: Spark evaluates that via a "
    "non-null-aware ExistenceJoin and yields FALSE where standard SQL "
    "says NULL (verified divergence; DuckDB follows the standard) — "
    "documented engine wrinkle, kept out of the conformance surface.",
    tags=("subquery", "null-semantics"),
)
