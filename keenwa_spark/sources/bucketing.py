"""Bucketed tables: co-located joins without a shuffle.

The at-scale recipe for repeated joins on the same key (fact-to-fact,
incremental merge): write both sides bucketed (+ sorted) by the join
key; Spark then plans a SortMergeJoin with NO Exchange on either side
— the shuffle happened once at write time and is amortized over every
subsequent join.

When to use: keys joined repeatedly (entity ids), both sides too big
to broadcast. When not to: one-off joins (the bucketed write IS a
shuffle), or keys with extreme skew (buckets inherit it — salt first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool | list[str] = True,
    mode: str = "overwrite",
    single_file_buckets: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table.

    ``sort=True`` sorts within buckets by the bucket column; a list
    sorts by those columns (leading column first — the multi-column
    index layout used by Catalog.materialize_index).

    ``single_file_buckets`` repartitions by the bucket column before
    the write (repartition hashing == bucket hashing, so each bucket's
    rows land in exactly one task) producing ONE file per bucket. This
    is both the at-scale layout (without it every input partition
    writes a file into every bucket — tasks x buckets small files) and
    the precondition for Spark reporting the sorted-bucket scan
    ordering that eliminates the SMJ Sort (see
    Catalog.materialize_index)."""
    if single_file_buckets:
        df = df.repartition(n_buckets, bucket_col)
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort is True:
        writer = writer.sortBy(bucket_col)
    elif sort:
        writer = writer.sortBy(*sort)
    writer.saveAsTable(table)


def is_shuffle_free_join(spark: SparkSession, left: str, right: str, on: str) -> bool:
    """True when joining two bucketed tables on their bucket key plans
    without any Exchange — the bucketing payoff, checkable in tests and
    before committing to a bucketed layout.

    Uses a MERGE hint: bucketing pays off in the both-sides-too-big-to-
    broadcast regime, which is what the hint simulates on small test
    data (otherwise Catalyst broadcasts and the check is vacuous)."""
    df = spark.table(left).hint("merge").join(spark.table(right), on)
    jvm = spark._jvm  # type: ignore[attr-defined]
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)  # type: ignore[attr-defined]
    return "Exchange" not in plan
