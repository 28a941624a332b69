"""Sketch-aggregate registry rows (pipeline/sketches.py): approximate
distinct / mergeable HLL / approximate quantiles, each with its error
CONTRACT in the output so the DuckDB oracle can check it exactly
(approximate values themselves differ across engines; the flags and
exact companions do not — see pipeline/sketches.py docstring)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from keenwa_spark.queries import df_query


@df_query(
    "pl_sketch_distinct_bounds",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS approx_ok
    FROM events
    GROUP BY event_type
    """,
    doc="Per-type approximate distinct users (HLL++, rsd=0.05) with "
    "the 3-sigma bound checked against the exact count "
    "(pipeline/sketches.py approx_distinct_bounds). At scale the "
    "estimate is one constant-state pass with map-side partials; the "
    "exact side exists for the oracle.",
    tags=("pipeline", "sketch"),
)
def pl_sketch_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.sketches import approx_distinct_bounds

    return approx_distinct_bounds(
        spark.table("events"), "user_id", ["event_type"]
    ).orderBy("event_type")


@df_query(
    "pl_sketch_hll_merge",
    oracle="""
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS merged_within_bound,
           TRUE AS whole_within_bound,
           TRUE AS merge_drift_ok
    FROM events
    """,
    doc="Datasketches HLL mergeability contract: sketch two disjoint "
    "halves (event_id parity), union the binary sketches, and BOTH "
    "estimates must sit within 3% of exact with bounded merge drift "
    "(pipeline/sketches.py hll_merge_equivalence) — the property that "
    "turns a 100 TB distinct count into per-partition sketches plus "
    "one tiny merge. Exact merged==whole equality is deliberately not "
    "claimed: sparse-mode union promotion can shift the estimate "
    "(1488 vs 1499 on sf0.1 events; masked at sf0.01 — found by the "
    "multi-SF sweep).",
    tags=("pipeline", "sketch"),
)
def pl_sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.sketches import hll_merge_equivalence

    ev = spark.table("events")
    return hll_merge_equivalence(
        ev, "user_id", (F.col("event_id") % 2).alias("__h")
    )


@df_query(
    "pl_sketch_quantile_bounds",
    oracle="""
    SELECT p AS prob,
           (SELECT CAST(COUNT(value) AS BIGINT) FROM events) AS n_values,
           TRUE AS rank_ok
    FROM (VALUES (0.1), (0.5), (0.9), (0.99)) t(p)
    ORDER BY p
    """,
    doc="approx_percentile rank-error contract (Greenwald-Khanna, "
    "eps=0.01): each returned value's EXACT rank must lie within "
    "eps*n of its target rank (pipeline/sketches.py "
    "approx_quantile_bounds); interpolated exact values deliberately "
    "not output (cross-engine last-ulp).",
    tags=("pipeline", "sketch"),
)
def pl_sketch_quantile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.sketches import approx_quantile_bounds

    return approx_quantile_bounds(
        spark.table("events").where(F.col("value").isNotNull()),
        "value",
        [0.1, 0.5, 0.9, 0.99],
    ).orderBy("prob")


# ---------------------------------------------------------------------------
# Shard-export manifest (sources/shards.py) — grouped here with the
# other integrity-contract rows
# ---------------------------------------------------------------------------

def _shard_oracle(n_shards: int) -> str:
    from keenwa_spark.pipeline.hashing import duck_hash64

    key = duck_hash64("CAST(doc_id AS VARCHAR)")
    row = duck_hash64("concat(coalesce(CAST(text AS VARCHAR), ''))")
    return f"""
    WITH s AS (
      SELECT {key} % {n_shards} AS shard, {row} AS rh FROM documents
    )
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(rh) AS BIGINT) AS checksum
    FROM s GROUP BY shard ORDER BY shard
    """


@df_query(
    "pl_shard_manifest",
    oracle=_shard_oracle(8),
    doc="Deterministic training-shard manifest: content-hash shard "
    "assignment (pure function of doc_id — re-export reproduces "
    "byte-identical membership) + per-shard row count and an "
    "order-independent summed row-hash checksum (sources/shards.py "
    "shard_manifest; write/verify faces tested in "
    "tests/test_sources.py). One hash exchange at export; the oracle "
    "replays the identical portable md5 arithmetic.",
    tags=("pipeline", "export"),
)
def pl_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.sources.shards import shard_manifest

    return shard_manifest(
        spark.table("documents"), "doc_id", ["text"], 8
    ).orderBy("shard")


@df_query(
    "pl_mixture_export_manifest",
    oracle="""
    WITH b AS (
      SELECT doc_id, text, source,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'mix0'), 1, 8))::BIGINT)
               % 1000000 AS bk
      FROM documents
    ),
    sampled AS (
      SELECT doc_id, text FROM b
      WHERE bk < (CASE WHEN source = 'src0' THEN 1000000
                       WHEN source = 'src1' THEN 600000
                       WHEN source = 'src2' THEN 200000
                       ELSE 50000 END)
    ),
    s AS (
      SELECT (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 8 AS shard,
             (('0x' || substr(md5(concat(coalesce(CAST(text AS VARCHAR), ''))), 1, 8))::BIGINT) AS rh
      FROM sampled
    )
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(rh) AS BIGINT) AS checksum
    FROM s GROUP BY shard ORDER BY shard
    """,
    doc="END-TO-END mixture export: domain-mixture sampling (per-source "
    "deterministic Bernoulli recipe, one codegen CASE filter fused into "
    "the scan) feeding the content-hash shard manifest — the 'make the "
    "training mix and ship it verifiably' composition; both stages are "
    "the library operators (pipeline/sampling.py mixture_sample -> "
    "sources/shards.py shard_manifest) and the oracle replays the whole "
    "chain arithmetically.",
    tags=("pipeline", "sampling", "export"),
)
def pl_mixture_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from keenwa_spark.pipeline.sampling import mixture_sample
    from keenwa_spark.sources.shards import shard_manifest

    mixed = mixture_sample(
        spark.table("documents"),
        "source",
        {"src0": 1.0, "src1": 0.6, "src2": 0.2},
        key_col="doc_id",
        default_rate=0.05,
    )
    return shard_manifest(mixed, "doc_id", ["text"], 8).orderBy("shard")
