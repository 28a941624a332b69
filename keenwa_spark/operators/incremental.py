"""Incremental deduplication: new batches against an existing corpus
WITHOUT re-reading corpus text.

The 100 TB operational reality: the corpus's dedup state is a compact
artifact (16-byte digests; 96-byte MinHash signatures), persisted once;
each arriving batch computes its own hashes and joins against the
state. This is why pipeline/hashing.py freezes its constants — a
signature computed last month must compare equal to one computed today.

Composition:
    state   = minhash_signatures(corpus)            # persisted once
    fresh   = incremental_minhash_dedup(new, state) # per batch
    state'  = state.unionAll(minhash_signatures(fresh))
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from keenwa_spark.pipeline.dedup import minhash_signatures, normalized_text
from keenwa_spark.pipeline.hashing import MINHASH_AB


def incremental_exact_dedup(
    new_docs: DataFrame,
    known_hashes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of ``new_docs`` whose normalized content digest is NOT in
    ``known_hashes`` (a 1-column ``content_hash`` frame). Anti-join on
    the digest: the state side is digest-only (16 bytes/doc), typically
    broadcast-able even for billion-doc corpora sharded by digest
    prefix."""
    hashed = new_docs.withColumn(
        "content_hash", F.expr(f"md5({normalized_text(text_col)})")
    )
    return hashed.join(
        known_hashes.select("content_hash"), "content_hash", "left_anti"
    ).drop("content_hash")


def incremental_minhash_dedup(
    new_docs: DataFrame,
    known_signatures: DataFrame,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of ``new_docs`` with NO LSH band collision against
    ``known_signatures`` (the persisted output of minhash_signatures).

    Band keys are computed on both sides with the same frozen
    constants; a new doc sharing ANY band bucket with a known doc is
    dropped as a near-dup candidate. One shuffle on (band, key);
    conservative by design (candidates drop without exact
    verification — compose with ngram_jaccard_pairs to keep
    borderline docs instead)."""
    rows_per_band = len(MINHASH_AB) // bands

    def band_keys(sig: DataFrame, tag: str) -> DataFrame:
        structs = []
        for b in range(bands):
            cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
            key = ", '-', ".join(f"CAST({c} AS STRING)" for c in cols)
            structs.append(f"struct({b} AS band, concat({key}) AS bkey)")
        return sig.select(
            F.col(id_col),
            F.explode(F.expr(f"array({', '.join(structs)})")).alias("bb"),
        ).select(
            F.col(id_col).alias(f"{tag}_id"),
            F.col("bb.band").alias("band"),
            F.col("bb.bkey").alias("bkey"),
        )

    new_sig = minhash_signatures(new_docs, id_col, text_col)
    new_buckets = band_keys(new_sig, "new")
    known_buckets = band_keys(known_signatures, "known")
    colliding = (
        new_buckets.join(known_buckets, ["band", "bkey"], "left_semi")
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return new_docs.join(colliding, id_col, "left_anti")
