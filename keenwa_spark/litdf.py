"""Small literal DataFrames WITHOUT the Python-RDD path.

``spark.createDataFrame(rows, schema)`` builds a 32-partition
Python-RDD relation: every action scans it with one Python worker per
partition, and under joins/broadcasts that fixed cost repeats per
materialization — measured ~25s for a 4-row table under a cross join
(the round-10 builder-fuzz finding that moved PlanBuilder.values and
the conformance mini-catalog to SQL VALUES LocalRelations).

``literal_df`` is the typed-data sibling for the model/result tables
the pipeline builds from driver-side Python values (ANN centroids,
PQ codebooks, sketch reports): the rows are rendered as a pure-JVM
literal expression tree (``F.lit``/``F.array``/``F.struct`` under one
``explode``), so the plan is JVM-only and single-partition — no text
round trip either, which keeps float64 values BIT-EXACT (``F.lit``
ships the scalar through py4j, not through a SQL parser).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StructType


def _lit_of(v, dt: DataType):
    if v is None:
        return F.lit(None).cast(dt)
    if isinstance(dt, ArrayType):
        if len(v) == 0:
            return F.array().cast(dt)
        return F.array(*[_lit_of(x, dt.elementType) for x in v])
    if isinstance(dt, StructType):
        vals = list(v)
        return F.struct(
            *[
                _lit_of(vals[i], f.dataType).alias(f.name)
                for i, f in enumerate(dt.fields)
            ]
        )
    return F.lit(v).cast(dt)


def literal_df(
    spark: SparkSession, rows: Sequence[tuple], schema: str
) -> DataFrame:
    """DataFrame of small literal ``rows`` under the DDL ``schema``,
    built JVM-side (see module docstring). Intended for model-sized
    data (tens to a few thousand cells) — the rows become literal
    expression nodes, not a distributed dataset."""
    st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    if not rows:
        return spark.createDataFrame([], st)
    row_structs = [
        F.struct(
            *[
                _lit_of(row[i], f.dataType).alias(f.name)
                for i, f in enumerate(st.fields)
            ]
        )
        for row in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*row_structs)).alias("__r"))
        .select(*[F.col(f"__r.{f.name}").alias(f.name) for f in st.fields])
    )
