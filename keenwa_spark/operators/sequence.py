"""Sequence-pattern matching over per-key event streams — a
MATCH_RECOGNIZE-lite: encode each key's time-ordered events as a
character string and count regex occurrences ("view, any clicks, then
purchase" = ``vc*p``). Funnels with optional/repeated steps,
back-to-back repeat detection, arbitrary ordering constraints — things
the fixed-step funnel aggregation can't express — become one regex.

Beyond-reference surface (keenwa has no sequence operators; SQL's own
MATCH_RECOGNIZE is absent from both the reference dialect and Spark).

Scale design: one hash shuffle on the keys (the groupBy); the sequence
string is built by sorting each key's (epoch, tie, char) structs
INSIDE the aggregated array — deterministic under equal timestamps via
``tie_cols``, no window pass needed. Per-key state is that key's event
count; the regex runs once per key on the assembled string (codegen,
JVM regex). Keys with millions of events need pre-bucketing by coarse
time range first — the same caveat as any per-key collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sequence_pattern_count(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    event_col: str,
    mapping: dict[str, str],
    pattern: str,
    tie_cols: list[str] | None = None,
    other_char: str = "_",
) -> DataFrame:
    """Count non-overlapping ``pattern`` matches in each key's encoded
    event sequence. ``mapping`` assigns one character per event value
    (unmapped events encode as ``other_char`` so they still break
    adjacency — use ``.`` in the pattern to skip them explicitly).
    Returns one row per key: ``seq_len``, ``n_matches``.
    """
    for v, c in mapping.items():
        if len(c) != 1:
            raise ValueError(f"mapping for {v!r} must be 1 char, got {c!r}")
    if len(other_char) != 1:
        raise ValueError("other_char must be a single character")

    ch = F.lit(other_char)
    for v, c in sorted(mapping.items()):
        ch = F.when(F.col(event_col) == F.lit(v), F.lit(c)).otherwise(ch)
    ties = [F.col(c).alias(f"t{i}") for i, c in enumerate(tie_cols or [])]
    encoded = df.select(
        *keys,
        F.struct(
            F.unix_micros(F.col(ts_col)).alias("e"),
            *ties,
            ch.alias("c"),
        ).alias("__s"),
    )
    return (
        encoded.groupBy(*keys)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("__s")), lambda x: x["c"]
                ),
                "",
            ).alias("__seq")
        )
        .select(
            *keys,
            F.length("__seq").cast("bigint").alias("seq_len"),
            F.regexp_count(F.col("__seq"), F.lit(pattern))
            .cast("bigint")
            .alias("n_matches"),
        )
    )
