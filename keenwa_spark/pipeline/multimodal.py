"""Multimodal column handling: opaque binary payloads + typed metadata.

The model for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or a pointer column to object storage) with typed
metadata alongside; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes cross the JVM/Python boundary once per batch,
never per row, and the operator composes with any upstream DataFrame
plan (predicate pushdown still prunes files before decode).

The image/audio libs are not in this container, so ``decode_batch``
uses a DETERMINISTIC FAKE decoder (header-byte arithmetic) behind the
same batch shape a real codec (Pillow/ffmpeg) would use — swap
``_fake_decode`` for the real call and nothing else changes. Real
codecs raise NotImplementedError via ``decode_real``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: decode output schema — what a real image decoder would emit
DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("format", StringType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 bytes of the
    text — the testdata has no real media; the column TYPE and the
    downstream plumbing are what's real)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("fake/v1").alias("codec"),
            F.length(F.col(text_col)).cast("long").alias("declared_size"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for a codec: 'width'/'height' are the
    first two header bytes, format tag from byte parity."""
    if not payload:
        return 0, 0, "empty"
    w = payload[0]
    h = payload[1] if len(payload) > 1 else 0
    fmt = "fake-a" if w % 2 == 0 else "fake-b"
    return w, h, fmt


def decode_batch(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode via mapInPandas: one Python roundtrip per
    ~10k-row batch, output rows aligned to DECODE_SCHEMA."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": pd.Series([d[0] for d in decoded], dtype="int64"),
                    "height": pd.Series([d[1] for d in decoded], dtype="int64"),
                    "format": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, DECODE_SCHEMA)


def decode_real(df: DataFrame) -> DataFrame:
    """Real-codec decode path — libs not present in this environment."""
    raise NotImplementedError(
        "image/audio codecs are not installed in this container; "
        "swap _fake_decode for Pillow/ffmpeg in decode_batch"
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling SHAPE: given per-frame rows, keep
    every n-th frame per asset — pure DataFrame ops (window + modulo),
    demonstrating that sampling logic needs no Python even when decode
    does."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    return (
        df.withColumn("frame_idx", F.row_number().over(w) - 1)
        .filter(F.col("frame_idx") % every_n == 0)
    )
