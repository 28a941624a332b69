"""LLM-training-data pipeline operators — the beyond-reference surface.

keenwa has no data-processing operators (it is an optimizer-only
library); this package adds the operations a 100 TB training-data
pipeline needs, each expressed as declarative DataFrame transformations
so Catalyst/AQE handle physical planning:

- ``dedup``      — exact (hash groupBy), MinHash+LSH banded near-dup,
                   SimHash fingerprints, exact n-gram Jaccard pairs
- ``similarity`` — brute-force cosine top-k (baseline), sign-LSH
                   bucketed top-k (scale path), per-label centroids
- ``text``       — quality stats, language-ID heuristic, token
                   counting, positional fingerprints
- ``packing``    — GPT-style fixed-context sequence packing, sliding
                   window chunking (RAG shape); ``text.redact_pii``
                   scrubs emails/phones/IPs with oracle-replayable
                   regexes
- ``multimodal`` — opaque binary columns + typed metadata; decode via
                   Arrow-batched mapInPandas (deterministic fake here;
                   real codecs plug into the same batch shape)

Every hash is md5-derived (first 8 hex chars → int64) so results are
engine-portable and oracle-checkable in DuckDB; no engine-specific
hash functions in any data path.
"""

from keenwa_spark.pipeline.dedup import (
    exact_dedup,
    ngram_containment_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from keenwa_spark.pipeline.similarity import (
    centroid_classify,
    cosine_topk,
    label_centroids,
    lsh_bucket_topk,
)
from keenwa_spark.pipeline.packing import (
    chunk_documents,
    pack_training_sequences,
)
from keenwa_spark.pipeline.expectations import validate_expectations
from keenwa_spark.pipeline.features import (
    quantile_bucketize,
    robust_scale,
    target_encode,
)
from keenwa_spark.pipeline.recall import recall_at_k
from keenwa_spark.pipeline.text import (
    language_id,
    lm_transition_score,
    redact_pii,
    text_fingerprint,
    text_stats,
    token_counts,
)

__all__ = [
    "centroid_classify",
    "chunk_documents",
    "cosine_topk",
    "exact_dedup",
    "label_centroids",
    "language_id",
    "lm_transition_score",
    "lsh_bucket_topk",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_containment_pairs",
    "ngram_jaccard_pairs",
    "pack_training_sequences",
    "quantile_bucketize",
    "recall_at_k",
    "redact_pii",
    "robust_scale",
    "simhash_fingerprints",
    "target_encode",
    "text_fingerprint",
    "text_stats",
    "token_counts",
    "validate_expectations",
]
