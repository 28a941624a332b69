"""Record linkage: blocked fuzzy matching of a dirty registry against
a clean one by edit distance.

The classic entity-resolution shape (Fellegi–Sunter blocking stage +
deterministic scoring): compare records only within small candidate
blocks, never all-pairs, then keep the best match per dirty record.
This is the batch analog of the reference's similarity family — the
reference models joins as logical operators only
(/root/reference/src/operators/relational/logical.rs); here the
fuzzy-match semantics are expressed Spark-first.

Blocking design (and why recall is provable for single edits):
- Two blocking passes, PREFIX (first ``block_len`` normalized chars)
  and SUFFIX (first ``block_len`` of the REVERSED string — i.e. the
  last chars; reverse+prefix rather than negative substring indices,
  whose out-of-range semantics differ across engines). A single
  character edit falls in at most one of the two windows whenever the
  string is longer than ``2 * block_len``, so every true match at
  distance <= 1 survives at least one pass. Multi-edit typos may still
  escape blocking — the standard, documented recall trade of blocked
  linkage.
- Candidate pairs are deduplicated on (left, right) BEFORE the
  edit-distance compute so a pair surviving both passes is scored once.

Scale design (100 TB dirty side, smaller clean side):
- Both blocking joins are equi-joins on the block key: no Cartesian,
  no all-pairs. If the clean registry is broadcast-sized Spark's AQE
  takes the BHJ path; otherwise both sides shuffle on the short block
  key only (id + name + ``block_len`` chars, not whole rows).
- ``levenshtein`` is a JVM codegen expression — the scoring stage is
  whole-stage-codegen, no Python in the hot path.
- Best-match selection is ``min(struct(distance, id, name))`` — a
  map-side-combinable aggregate, one shuffle on the dirty key, instead
  of a window sort over the candidate set.
- Skew note: a degenerate block (e.g. every record sharing one prefix)
  re-creates all-pairs inside that block; ``max_block`` caps the rows
  accepted per (pass, block key), mirroring the LSH ``max_bucket``
  guard in pipeline/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(col: str):
    """Case fold + trim — minimal and SQL-replicable (trim(lower))."""
    return F.trim(F.lower(F.col(col)))


def _blocked(df: DataFrame, id_col: str, name_col: str, block_len: int,
             side: str) -> DataFrame:
    """(side_id, side_name, blk_pass, block) — one row per pass."""
    base = (
        df.select(
            F.col(id_col).alias(f"{side}_id"),
            _norm(name_col).alias(f"{side}_name"),
        )
        .where(F.col(f"{side}_name").isNotNull())
        # dedup BEFORE blocking: duplicate (id, name) input rows would
        # each count toward max_block, letting a repeated low-id row
        # evict a distinct higher-id candidate from a capped block
        # (ADVICE r07 item 3); the pair-level distinct downstream
        # can't undo an eviction that already happened
        .distinct()
    )
    name = F.col(f"{side}_name")
    pre = base.select(
        "*",
        F.lit("p").alias("blk_pass"),
        F.substring(name, 1, block_len).alias("block"),
    )
    suf = base.select(
        "*",
        F.lit("s").alias("blk_pass"),
        F.substring(F.reverse(name), 1, block_len).alias("block"),
    )
    return pre.unionByName(suf)


def _cap_block(df: DataFrame, side: str, max_block: int) -> DataFrame:
    """Keep at most ``max_block`` rows per (pass, block), lowest id
    first — deterministic, and bounds the per-block join fan-out."""
    from pyspark.sql import Window

    w = Window.partitionBy("blk_pass", "block").orderBy(F.col(f"{side}_id"))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_block)
        .drop("__rn")
    )


def fuzzy_link(
    dirty: DataFrame,
    clean: DataFrame,
    *,
    dirty_id: str,
    dirty_name: str,
    clean_id: str,
    clean_name: str,
    block_len: int = 4,
    max_dist: int = 2,
    max_block: int | None = 10_000,
) -> DataFrame:
    """Best clean match per dirty record, or NULLs when nothing within
    ``max_dist`` shares a block. ``max_block=None`` = uncapped (no
    per-block row limit — only safe when the block-key distribution is
    known benign).

    Returns (d_id, d_name, match_id, match_name, distance) with one
    row per DISTINCT (dirty id, normalized name) with a non-null name.
    Ties on distance break to the smallest (clean id, clean name).

    Precondition (determinism): id columns must be NON-NULL and unique
    per normalized name. ``_cap_block`` keeps the ``max_block``
    lowest-id rows of a block and the best-match tie-break is
    min(struct(distance, id, name)) — with NULL or duplicated ids the
    kept-row choice is arbitrary, and Spark's NULLS-FIRST ordering
    diverges from the DuckDB NULLS-LAST oracle pattern (ADVICE r07
    item 2). Inputs with duplicate full (id, name) ROWS are fine: the
    blocked base deduplicates before capping.
    """
    d = _blocked(dirty, dirty_id, dirty_name, block_len, "d")
    c = _blocked(clean, clean_id, clean_name, block_len, "c")
    if max_block is not None:
        d = _cap_block(d, "d", max_block)
        c = _cap_block(c, "c", max_block)

    pairs = (
        d.join(c, on=["blk_pass", "block"])
        .select("d_id", "d_name", "c_id", "c_name")
        .distinct()
    )
    scored = pairs.select(
        "*", F.levenshtein("d_name", "c_name").alias("distance")
    ).where(F.col("distance") <= max_dist)
    best = scored.groupBy("d_id", "d_name").agg(
        F.min(F.struct("distance", "c_id", "c_name")).alias("b")
    )
    spine = (
        dirty.select(
            F.col(dirty_id).alias("d_id"), _norm(dirty_name).alias("d_name")
        )
        .where(F.col("d_name").isNotNull())
        .distinct()
    )
    return spine.join(best, on=["d_id", "d_name"], how="left").select(
        "d_id",
        "d_name",
        F.col("b.c_id").alias("match_id"),
        F.col("b.c_name").alias("match_name"),
        F.col("b.distance").alias("distance"),
    )
