"""Declarative readers. Every reader returns an un-materialized
DataFrame so Catalyst retains predicate pushdown, column pruning, and
partition pruning — the reader never does work the optimizer could
skip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from keenwa_spark.errors import ArgumentError


def _ddl_field_names(schema: str) -> list[str]:
    """Field names of a DDL schema string (engine's own parser)."""
    from pyspark.sql.types import StructType

    return [f.name for f in StructType.fromDDL(schema).fields]


def read_parquet(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Parquet scan. ``columns`` prunes at the reader level (visible in
    ReadSchema); ``merge_schema`` only when files genuinely disagree —
    it costs a footer read per file at planning time."""
    df = spark.read.option("mergeSchema", str(merge_schema).lower()).parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with an EXPLICIT schema by default. inferSchema is a full
    extra pass over the data — at 100 TB that is a second job before
    the first; callers must opt into it by passing schema=None."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
    )
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    multiline: bool = False,
    corrupt_col: str | None = None,
) -> DataFrame:
    """JSON lines (or multiline documents). Same explicit-schema rule
    as CSV: schema inference is a full pre-pass.

    ``corrupt_col`` opts into quarantine-style ingestion: malformed
    lines land whole in that STRING column (all data columns NULL)
    instead of failing the job or silently vanishing — on a crawl-
    scale corpus a handful of broken records must never kill the
    read, and quarantined originals let the pipeline count/inspect
    them (the same posture as decode_real's 'invalid' rows). The
    column must also be declared in ``schema``; Spark only populates
    it under PERMISSIVE mode with an explicit schema."""
    reader = spark.read.option("multiLine", str(multiline).lower())
    if corrupt_col:
        if not schema:
            raise ValueError("corrupt_col requires an explicit schema")
        if corrupt_col not in _ddl_field_names(schema):
            # without the column in the schema, PERMISSIVE mode emits
            # all-NULL rows for malformed lines and nothing is
            # quarantined — the silent failure this flag exists to
            # prevent, so reject it loudly
            raise ValueError(
                f"corrupt_col {corrupt_col!r} must be declared in the schema"
            )
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-asset ingestion via Spark's ``binaryFile`` source: one row
    per file with ``path``, ``modificationTime``, ``length``, and
    ``content`` (binary) — the entry point that turns an image/audio
    directory into the opaque-binary-column shape the multimodal
    pipeline decodes (``pipeline/multimodal.py``).

    ``glob`` filters by filename pattern at LISTING time (e.g.
    ``*.png``) and ``max_bytes`` pushes a length ceiling into the scan
    (oversized assets are skipped before their bytes are read) — both
    prune work before any content crosses the wire. At 100 TB of small
    files the listing itself is the bottleneck: point this at a
    manifest-compacted layout (or convert once to parquet with the
    bytes inline, ``write_parquet``) rather than a raw million-file
    directory tree.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        from pyspark.sql import functions as F

        df = df.where(F.col("length") <= max_bytes)
    return df


def read_table_dir(
    spark: SparkSession, sf_dir: str, table: str, columns: list[str] | None = None
) -> DataFrame:
    """Convenience: one of the standard testdata tables."""
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    if not os.path.exists(path):
        raise ArgumentError(f"no such table file: {path}")
    return read_parquet(spark, path, columns)
