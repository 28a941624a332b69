"""Recall measurement for the approximate-nearest-neighbor operators.

LSH/IVF results are oracle-checked for DETERMINISM (the same algorithm
replayed in DuckDB), but that says nothing about approximation QUALITY.
This module closes that gap: recall@k of an approximate result against
the exact ``cosine_topk`` ground truth — the number a user tuning
``bits`` / ``multiprobe`` / ``nprobe`` actually needs.

Evaluation is itself a distributed computation (a left-semi join on the
(query, neighbor) pair key), so it works at any corpus size; only the
single recall scalar reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def recall_at_k(approx: DataFrame, truth: DataFrame) -> float:
    """Fraction of exact top-k (query, neighbor) pairs recovered by the
    approximate result. Both inputs use the (query_id, neighbor_id)
    output convention of the ANN operators."""
    t = truth.select("query_id", "neighbor_id")
    total = t.count()
    if total == 0:
        return 1.0
    hit = t.join(
        approx.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    ).count()
    return hit / total
