"""Sequence packing & document chunking — the operators that turn a
cleaned corpus into model-shaped training inputs.

Beyond-reference surface (keenwa plans queries only); part of the
LLM-pipeline layer next to dedup/sampling/quality.

``pack_training_sequences`` is GPT-style fixed-context packing: within
each shard, documents are concatenated in deterministic id order and
cut into fixed ``seq_len``-token windows; the output maps every doc to
the training sequence(s) it lands in, with exact in-doc token ranges.
Docs straddle window boundaries (concatenate-then-cut semantics — the
standard pretraining packing; no padding waste, no bin-packing
recurrence).

Scale design: packing is embarrassingly parallel across shards — ONE
shuffle on the shard key, one in-partition cumulative sum (a window),
integer math end-to-end. ``n_shards`` bounds parallelism; at 100 TB
pick shards ~ cluster cores (each shard is an independent token
stream, the same way distributed pretraining shards its corpus).
Everything is exact integer arithmetic on whitespace token counts
(pipeline/text.py convention), so the whole mapping is replayable in
DuckDB.

``chunk_documents`` is per-document sliding-window chunking (RAG-style
chunk + overlap) — a pure per-row explode, zero shuffles, trivially
parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from keenwa_spark.pipeline.dedup import normalized_text

#: seq_id = shard * 2^40 + window index — collision-free bigint compound
_SEQ_SHARD_BASE = 1 << 40


def pack_training_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Map each document to the fixed-length training sequence(s) it
    occupies. Output, one row per (doc, sequence) overlap:

    - ``shard``: the doc's stream (``id % n_shards``);
    - ``seq_id``: global sequence id (``shard * 2^40 + win``);
    - ``win``: the window index within the shard;
    - ``tok_start`` / ``tok_end``: the [start, end) token range OF THE
      DOC that falls into this sequence;
    - ``n_tokens``: the doc's total token count.

    Deterministic: shard assignment, in-shard order (id), and token
    counts are all pure functions of the input. Empty docs (0 tokens)
    are dropped (they occupy no sequence).
    """
    if seq_len <= 0 or n_shards <= 0:
        raise ValueError(f"seq_len and n_shards must be positive, got {seq_len}, {n_shards}")
    toks = df.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).alias("shard"),
        F.expr(
            f"CAST(size(split({normalized_text(text_col)}, ' ')) AS BIGINT)"
        ).alias("n_tokens"),
    ).filter(F.expr(f"char_length(trim({text_col})) > 0"))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("cum_after", F.sum("n_tokens").over(w)).withColumn(
        "cum_before", F.col("cum_after") - F.col("n_tokens")
    )
    return (
        cum.select(
            id_col,
            "shard",
            "n_tokens",
            "cum_before",
            F.explode(
                # integer DIV, not float /: exact at any token count
                F.expr(
                    f"sequence(cum_before DIV {seq_len}, "
                    f"(cum_after - 1) DIV {seq_len})"
                )
            ).alias("win"),
        )
        .select(
            F.col(id_col),
            "shard",
            (F.col("shard") * _SEQ_SHARD_BASE + F.col("win")).alias("seq_id"),
            "win",
            F.greatest(F.lit(0), F.col("win") * seq_len - F.col("cum_before")).alias(
                "tok_start"
            ),
            F.least(
                F.col("n_tokens"),
                (F.col("win") + 1) * seq_len - F.col("cum_before"),
            ).alias("tok_end"),
            "n_tokens",
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunks per document: chunk ``i`` covers tokens
    ``[i*stride, i*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; the last chunk may be short.
    Output: (id, chunk_id, chunk_start, n_chunk_tokens, chunk_text).

    Pure per-row explode over the word array — no shuffle; the chunk
    count per doc is ``ceil(n_tokens / stride)`` truncated to starts
    inside the doc."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}, {chunk_tokens}")
    stride = chunk_tokens - overlap
    words = df.select(
        F.col(id_col),
        F.expr(f"split({normalized_text(text_col)}, ' ')").alias("w"),
    ).filter(F.expr(f"char_length(trim({text_col})) > 0"))
    return words.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                # one entry per chunk start; slice is 1-based
                f"transform(sequence(0, (size(w) - 1) DIV {stride}), "
                f"i -> concat_ws(' ', slice(w, i * {stride} + 1, {chunk_tokens})))"
            )
        ).alias("chunk_id", "chunk_text"),
    ).select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        (F.col("chunk_id").cast("bigint") * stride).alias("chunk_start"),
        F.expr("CAST(size(split(chunk_text, ' ')) AS BIGINT)").alias("n_chunk_tokens"),
        "chunk_text",
    )
