"""Array expression query — SURVEY.md §2 row 32.

Expr::Array / ArrayIndex / ArraySlice (reference
src/operators/scalar/expr.rs:89-98). Registered as its own module so it
sits inside the driver-checked registry prefix (its r2 row was the one
recorded FAIL — not a wrong answer, but the array-typed ``mid_slice``
column crashed the driver's pandas row-canonicalizer with "unhashable
type: 'list'"). Fix per VERDICT r02 item 2: the slice is serialized to
a scalar string on BOTH engines (Spark transform+array_join, DuckDB
array_to_string), so every output column is hash-friendly while the
array constructor, indexing, slicing, and length semantics all remain
load-bearing.
"""

from __future__ import annotations

from keenwa_spark.queries import sql_query

sql_query(
    "expr_array",
    """
    SELECT
      n_nationkey,
      array(n_nationkey, n_regionkey, 99)[0]        AS first_elem,
      array(n_nationkey, n_regionkey, 99)[2]        AS last_elem,
      array_join(transform(slice(array(10 * n_nationkey, 20, 30, 40, 50), 1, 3),
                           x -> CAST(x AS STRING)), ',') AS mid_slice,
      CAST(size(array(n_nationkey, n_regionkey)) AS BIGINT) AS arr_len
    FROM nation
    """,
    oracle="""
    SELECT
      n_nationkey,
      [n_nationkey, n_regionkey, 99][1]             AS first_elem,
      [n_nationkey, n_regionkey, 99][3]             AS last_elem,
      array_to_string([10 * n_nationkey, 20, 30, 40, 50][1:3], ',') AS mid_slice,
      CAST(len([n_nationkey, n_regionkey]) AS BIGINT) AS arr_len
    FROM nation
    """,
    doc="Expr::Array / ArrayIndex / ArraySlice (reference expr.rs:89-98). "
    "Spark [] is 0-based, DuckDB 1-based (SURVEY §7 risk 4) — the builder "
    "API follows Python 0-based, SQL follows each engine's native rule. "
    "The slice output is stringified on both engines so the driver's "
    "canonicalizer can sort/hash it (VERDICT r02 item 2).",
    tags=("expr", "array"),
)
