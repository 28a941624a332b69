"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard LLM-training hygiene step (cf. GPT-3 appendix C / PaLM /
Llama decontamination): an eval example "leaks" into training if a
training doc contains any long-enough n-gram from the eval set. This
module computes, per training doc, how many distinct benchmark n-grams
it contains, and a contaminated flag.

Scale design (100 TB training corpus, MB-GB benchmark side):
- The benchmark side reduces to DISTINCT 8-byte n-gram hashes —
  millions of rows at most — and is BROADCAST: the training corpus is
  scanned once, never shuffled on text.
- Doc text never leaves the JVM: shingling/hashing is codegen
  (split + transform + md5-derived hash, same frozen constants as the
  dedup family — pipeline/hashing.py).
- The only shuffle is the per-doc aggregate of (doc_id, hash) pairs,
  with partial (map-side) distinct aggregation.
- Hash note: matching is on 64-bit content hashes, not strings —
  a false match needs a 64-bit collision between a doc n-gram and a
  benchmark n-gram (~1e-10 at 1e4x1e9 scale); accepted to keep the
  broadcast side 8 bytes/row.

Docs with fewer than ``n`` words have no n-grams and are absent from
the output (vacuously clean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from keenwa_spark.pipeline.dedup import _shingles
from keenwa_spark.pipeline.hashing import spark_hash64


def _ngram_hashes(df: DataFrame, n: int, text_col: str, extra: list[str]) -> DataFrame:
    """(extra..., h) — one row per word-n-gram occurrence."""
    return df.select(
        *extra, F.explode(F.expr(_shingles(text_col, n))).alias("__s")
    ).select(*extra, F.expr(spark_hash64("__s")).alias("h"))


def benchmark_ngram_hashes(
    benchmark: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """DISTINCT n-gram hashes of the benchmark set — the compact
    persistable contamination index (8 bytes per distinct n-gram)."""
    return _ngram_hashes(benchmark, n, text_col, []).distinct()


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per training doc: ``n_ngrams`` (distinct n-grams), ``n_hits``
    (distinct n-grams also present in ``benchmark``), and
    ``contaminated`` (n_hits >= min_hits).

    Compose downstream as
    ``docs.join(result.where("contaminated"), id_col, "left_anti")``
    to drop flagged docs.
    """
    bench = F.broadcast(
        benchmark_ngram_hashes(benchmark, n=n, text_col=text_col).withColumn(
            "__hit", F.lit(1)
        )
    )
    doc_grams = _ngram_hashes(docs, n, text_col, [id_col])
    return (
        doc_grams.join(bench, "h", "left")
        .groupBy(id_col)
        .agg(
            F.count_distinct("h").alias("n_ngrams"),
            F.count_distinct(F.when(F.col("__hit").isNotNull(), F.col("h"))).alias(
                "n_hits"
            ),
        )
        .withColumn("contaminated", F.col("n_hits") >= min_hits)
    )
