"""Classic analytical query shapes (TPC-H Q3/Q5/Q10 style) over the
testdata star schema.

These are the bench workhorses: multi-way joins with selective filters,
grouped aggregation over the fact table, top-k output. Plan audit
targets: every dimension join broadcasts, filters reach the scans,
exactly one shuffle (the aggregate) touches lineitem-scale data.
"""

from __future__ import annotations

from keenwa_spark.queries import sql_query

sql_query(
    "q1_pricing_summary",
    """
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
           AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
           AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        / COUNT(l_quantity) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        / COUNT(l_extendedprice) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
        / COUNT(l_discount) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape (pricing summary): the canonical full-scan "
    "aggregate — ~97% of the fact table through a 4-way decimal-exact "
    "partial agg into a handful of groups. Map-side combine does "
    "virtually all the work; shuffle is a few rows per partition. "
    "Averages finalized from sum/count (order-independent).",
    tags=("analytics", "tpch"),
)

sql_query(
    "q6_forecast_revenue",
    """
    SELECT
      CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
           AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecast revenue): pure filter+sum with every "
    "predicate pushed to the parquet scan (PushedFilters on shipdate/"
    "discount/quantity) — the pushdown/pruning acid test; a global "
    "agg, zero-row shuffle.",
    tags=("analytics", "tpch"),
)

sql_query(
    "q3_shipping_priority",
    """
    SELECT
      l.l_orderkey,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
           AS DOUBLE) AS revenue,
      CAST(CAST(o.o_orderdate AS DATE) AS STRING) AS orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority): selective dim filter -> "
    "two joins -> fact agg -> top-k. customer/orders broadcast against "
    "lineitem; one shuffle for the group-by.",
    tags=("analytics", "tpch"),
)

sql_query(
    "q5_local_supplier_volume",
    """
    SELECT
      n.n_name,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
           AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    doc="TPC-H Q5 shape (local supplier volume): 6-table star join with "
    "a compound join condition (supplier in customer's nation), region "
    "filter pruning the dimension chain.",
    tags=("analytics", "tpch"),
)

sql_query(
    "q10_returned_items",
    """
    SELECT
      c.c_custkey,
      c.c_name,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
           AS DOUBLE) AS revenue,
      c.c_acctbal,
      n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned items): high-cardinality group-by "
    "(per customer) over a filtered fact join — the agg shuffle "
    "dominates; dims broadcast.",
    tags=("analytics", "tpch"),
)

sql_query(
    "ev_value_percentiles",
    """
    SELECT event_type,
           percentile(value, 0.5) AS p50,
           percentile(value, 0.9) AS p90,
           percentile(value, 0.99) AS p99
    FROM events
    GROUP BY event_type
    """,
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.99) AS p99
    FROM events
    GROUP BY event_type
    """,
    doc="EXACT linear-interpolated percentiles per group (Spark "
    "percentile == DuckDB quantile_cont, verified bit-equal). Beyond "
    "the reference's 5-aggregate surface; at 100 TB the approximate "
    "twin (approx_percentile, t-digest) replaces this with bounded "
    "memory — exact percentile requires a per-group sort.",
    tags=("analytics", "percentile"),
)

sql_query(
    "agg_grouping_sets",
    """
    SELECT
      COALESCE(o_orderstatus, 'ALL') AS status,
      COALESCE(o_orderpriority, 'ALL') AS priority,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority), ())
    """,
    doc="GROUPING SETS — deliberately BEYOND the reference (its frontend "
    "rejects all GROUP BY modifiers, reference sql/mod.rs:341-343, and "
    "our strict dialect mode mirrors that rejection — "
    "tests/test_dialect.py); the default mode exposes Spark's native "
    "superset, oracle-checked. Spark expands to a single multi-way "
    "aggregate, not N scans. EMPTY-INPUT caveat (applies to all three "
    "ROLLUP/CUBE/GROUPING SETS queries): ANSI requires the () grouping "
    "set to emit its super-aggregate row (COUNT 0) even over empty "
    "input; Spark's Expand path returns zero rows there — pinned as a "
    "known Spark divergence in tests/test_fuzz.py"
    "::test_known_spark_grouping_sets_empty_input_bug.",
    tags=("analytics", "groupingsets", "superset"),
)

sql_query(
    "q18_large_volume_customer",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(CAST(o.o_orderdate AS DATE) AS STRING) AS orderdate,
           o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 shape (large-volume customers): IN over a grouped "
    "HAVING subquery on the fact table -> semi join -> re-aggregate. "
    "Two fact-table shuffles by necessity (subquery agg + outer agg).",
    tags=("analytics", "tpch"),
)

sql_query(
    "agg_rollup_hierarchy",
    """
    SELECT
      COALESCE(r_name, '<all>') AS region,
      COALESCE(n_name, '<all>') AS nation,
      COUNT(*) AS n_customers,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    ORDER BY region, nation
    """,
    doc="GROUP BY ROLLUP (Spark superset; keenwa rejects CUBE/ROLLUP, "
    "reference sql/mod.rs:341-343): region>nation>grand-total hierarchy "
    "in one Expand+aggregate pass — at scale this is one shuffle, not "
    "three UNIONed scans. Dimension names are non-null so COALESCE "
    "labels the rollup rows unambiguously.",
    tags=("analytics", "aggregate", "superset"),
)

sql_query(
    "agg_cube_grouping_id",
    """
    SELECT
      COALESCE(o_orderstatus, '<all>') AS status,
      COALESCE(o_orderpriority, '<all>') AS priority,
      CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_priority, status, priority
    """,
    doc="GROUP BY CUBE with GROUPING() markers (Spark superset; keenwa "
    "rejects all GROUP BY modifiers, reference sql/mod.rs:341-343): all "
    "four grouping combinations in ONE Expand+aggregate pass — one "
    "shuffle, not four scans — with GROUPING() disambiguating genuine "
    "NULL keys from subtotal rows, which COALESCE alone cannot.",
    tags=("analytics", "cube", "superset"),
)

sql_query(
    "agg_pivot_status_priority",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                         THEN CAST(o_totalprice AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_f
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Pivot / cross-tab via conditional aggregation — the shape "
    "Spark's df.pivot() desugars to (one pass, one shuffle, no "
    "per-pivot-value scans); written as explicit SUM(CASE) so the "
    "same text is the DuckDB oracle. Counts cast BIGINT, money "
    "decimal-exact.",
    tags=("analytics", "pivot", "superset"),
)

sql_query(
    "agg_stats_moments",
    """
    WITH m AS (
      SELECT o_orderstatus,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2))))
                  AS DECIMAL(38,0)) AS DOUBLE) AS s2
      FROM orders
      GROUP BY o_orderstatus
    )
    SELECT o_orderstatus,
           n,
           s1 / n AS mean_price,
           CASE WHEN n > 1 THEN (s2 - s1 * s1 / n) / (n - 1) END AS var_price,
           CASE WHEN n > 1 THEN sqrt((s2 - s1 * s1 / n) / (n - 1)) END
             AS stddev_price
    FROM m
    ORDER BY o_orderstatus
    """,
    doc="Second-moment statistics (variance/stddev) via exact decimal "
    "moments: SUM(x) and SUM(x*x) aggregate exactly (decimal, "
    "order-independent — the built-in stddev's streaming double "
    "accumulation is partition-order-dependent and can't be "
    "hash-verified cross-engine), then the sample-variance formula "
    "runs once per group in double. The same one-pass shape the "
    "built-in uses, with deterministic results at any partitioning. "
    "The squared-sum is FLOORed to an integral DECIMAL(38,0) before "
    "the double cast: once value x 10^scale exceeds 2^53, DuckDB's "
    "decimal->double (int128 conversion then scale division) "
    "double-rounds where Spark's BigDecimal cast single-rounds — a "
    "1-ulp stddev divergence that appeared only at sf0.1 (multi-SF "
    "sweep find). An integral decimal below 2^53 casts EXACTLY in "
    "both engines; valid while sum(x^2) < 9e15, i.e. ~2x this sf — "
    "beyond that, center the values first (shifted moments). "
    "n=1 groups yield NULL variance (sample variance undefined — the "
    "stddev_samp convention; 1-row sweep find: ANSI division by "
    "n-1=0 errored).",
    tags=("analytics", "aggregate", "stats"),
)

sql_query(
    "agg_bool_family",
    """
    SELECT o_orderstatus,
           CAST(count_if(o_totalprice > 250000) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           CAST(max_by(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS BIGINT)
             AS priciest_key,
           CAST(min_by(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS BIGINT)
             AS cheapest_key
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    oracle="""
    SELECT o_orderstatus,
           CAST(count_if(o_totalprice > 250000) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           CAST(max_by(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS BIGINT)
             AS priciest_key,
           CAST(min_by(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS BIGINT)
             AS cheapest_key
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Boolean/conditional aggregate family (Spark superset): "
    "count_if, bool_and/bool_or, max_by/min_by — shared spelling with "
    "DuckDB. max_by/min_by are deterministic here because "
    "o_totalprice is unique per status group in this data (ties would "
    "be engine-arbitrary; production usage pairs the ordering value "
    "with a unique tiebreak column).",
    tags=("analytics", "aggregate", "superset"),
)

sql_query(
    "agg_string_concat",
    """
    SELECT c_nationkey,
           CASE WHEN COUNT(c_mktsegment) > 0
                THEN concat_ws(',', sort_array(collect_list(c_mktsegment)))
           END AS segments,
           CASE WHEN COUNT(c_mktsegment) > 0
                THEN concat_ws('|', array_sort(collect_set(c_mktsegment)))
           END AS distinct_segments
    FROM customer
    WHERE c_custkey <= 60
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    oracle="""
    SELECT c_nationkey,
           string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
           string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment)
             AS distinct_segments
    FROM customer
    WHERE c_custkey <= 60
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="String aggregation, deterministically: collect_list has no "
    "defined order, so the array is sorted before concat_ws — "
    "equivalent to DuckDB's string_agg(... ORDER BY). The DISTINCT "
    "variant goes through collect_set + array_sort. Both stay in the "
    "partial-aggregable path (arrays merge associatively; the sort "
    "is final-stage only). A group with NO non-null values yields NULL "
    "(the SQL aggregate convention string_agg follows) — Spark's "
    "collect_list skips NULLs into an EMPTY array whose concat_ws is "
    "'', so the count guard restores the convention (all-NULL-column "
    "sweep find).",
    tags=("analytics", "aggregate", "strings"),
)


sql_query(
    "agg_weighted_avg",
    """
    SELECT
      l_returnflag,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        AS qty_weighted_price,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT) AS total_qty,
      COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Quantity-weighted average price per return flag: both the "
    "weighted numerator (decimal x decimal products) and the weight "
    "sum aggregate EXACTLY, then one double division — the "
    "order-independent form of the weighted mean (a double-weighted "
    "running mean is partition-order-dependent and unverifiable).",
    tags=("analytics", "aggregate", "weighted"),
)


sql_query(
    "an_pivot_segments",
    """
    SELECT n_name,
           building_total, COALESCE(building_n, 0) AS building_n,
           machinery_total, COALESCE(machinery_n, 0) AS machinery_n,
           automobile_total, COALESCE(automobile_n, 0) AS automobile_n
    FROM (
      SELECT n.n_name, c.c_mktsegment,
             CAST(c.c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    )
    PIVOT (
      CAST(SUM(bal) AS DOUBLE) AS total, COUNT(*) AS n
      FOR c_mktsegment IN ('BUILDING' AS building, 'MACHINERY' AS machinery,
                           'AUTOMOBILE' AS automobile)
    )
    ORDER BY n_name
    """,
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CASE WHEN c.c_mktsegment = 'BUILDING'
                    THEN CAST(c.c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE)
             AS building_total,
           COUNT(CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 END)
             AS building_n,
           CAST(SUM(CASE WHEN c.c_mktsegment = 'MACHINERY'
                    THEN CAST(c.c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE)
             AS machinery_total,
           COUNT(CASE WHEN c.c_mktsegment = 'MACHINERY' THEN 1 END)
             AS machinery_n,
           CAST(SUM(CASE WHEN c.c_mktsegment = 'AUTOMOBILE'
                    THEN CAST(c.c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE)
             AS automobile_total,
           COUNT(CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 END)
             AS automobile_n
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    doc="SQL PIVOT (long -> wide; Spark-native superset surface like "
    "ROLLUP/CUBE): per-nation account-balance totals and counts pivoted "
    "across three market segments in one grouped pass — Catalyst plans "
    "it as conditional aggregation, which is exactly what the portable "
    "oracle spells out. Decimal sums, one final double cast per cell. "
    "Empty-cell semantics: Spark PIVOT yields NULL even for COUNT "
    "(absent group, not zero rows counted) where conditional "
    "aggregation yields 0 — the count columns COALESCE to 0 "
    "explicitly; found by the sf0.001 sweep (sf0.01 populates every "
    "nation x segment cell and masked it).",
    tags=("analytics", "pivot"),
)


sql_query(
    "an_unpivot_stack",
    """
    SELECT o_orderstatus, metric, CAST(v AS DOUBLE) AS v
    FROM (
      SELECT o_orderstatus,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price,
             CAST(COUNT(*) AS DOUBLE) AS n_orders,
             CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS n_customers
      FROM orders GROUP BY o_orderstatus
    )
    LATERAL VIEW stack(3,
      'total_price', total_price,
      'n_orders', n_orders,
      'n_customers', n_customers) AS metric, v
    ORDER BY o_orderstatus, metric
    """,
    oracle="""
    WITH wide AS (
      SELECT o_orderstatus,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price,
             CAST(COUNT(*) AS DOUBLE) AS n_orders,
             CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS n_customers
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, 'total_price' AS metric, total_price AS v FROM wide
    UNION ALL
    SELECT o_orderstatus, 'n_orders', n_orders FROM wide
    UNION ALL
    SELECT o_orderstatus, 'n_customers', n_customers FROM wide
    ORDER BY o_orderstatus, metric
    """,
    doc="UNPIVOT (wide -> long) via stack(): per-status KPI columns "
    "melted into (metric, value) rows — the reporting-layer reshape; "
    "stack is a Generate (zero shuffles beyond the aggregate), oracle "
    "is the portable UNION ALL spelling.",
    tags=("analytics", "unpivot"),
)


from keenwa_spark.queries import df_query  # noqa: E402


@df_query(
    "an_price_rank_global",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(RANK() OVER (ORDER BY o_totalprice DESC) AS BIGINT) AS rk,
           CAST(DENSE_RANK() OVER (ORDER BY o_totalprice DESC) AS BIGINT)
             AS drk
    FROM orders
    WHERE o_totalprice > 400000
    """,
    doc="GLOBAL RANK + DENSE_RANK over order prices (gaps and no-gaps "
    "side by side) via the two-pass range-bucket scheme "
    "(operators/ordered.py with_global_rank): per-bucket rank windows "
    "in parallel plus exclusive row-count / distinct-value offsets — "
    "the leaderboard query shape that a partitionless window would "
    "single-task at scale. Filter first (pushed to the scan), rank "
    "the survivors.",
    tags=("analytics", "rank", "ordered"),
)
def an_price_rank_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from keenwa_spark.operators.ordered import with_global_rank

    filtered = (
        spark.table("orders")
        .where(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "o_totalprice")
    )
    ranked = with_global_rank(
        filtered, "o_totalprice", out_col="rk", descending=True
    )
    return with_global_rank(
        ranked, "o_totalprice", out_col="drk", descending=True, dense=True
    ).select("o_orderkey", "o_totalprice", "rk", "drk")
