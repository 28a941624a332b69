"""Range join: match point rows into interval rows (point-in-interval,
optionally keyed) without a nested-loop pair explosion.

Beyond-reference surface (keenwa plans theta joins as generic join
predicates — reference ``operators/relational/join.rs:10-40`` — with no
interval-aware strategy; engines like DuckDB/Databricks special-case
this as a "range join").

Scale design — binning instead of inequality join: Spark plans
``p JOIN i ON p.k = i.k AND i.lo <= p.ts AND p.ts < i.hi`` as an
equi-join on k followed by a per-key pair filter — fine for tiny keys,
but a key with n points and m intervals materializes n*m pairs first.
Without a key it degrades to BroadcastNestedLoop. The bucketed plan:

    points:    bin  = floor(epoch(ts) / w)          (exactly 1 bin)
    intervals: bins = sequence(floor(lo/w), floor(hi'/w))  (explode)
    join on (k, bin), then filter lo <= ts < hi  (exact check)

Each (point, interval) pair meets in at most ONE bin (the point's),
so no post-join dedup is needed. Cost: one shuffle of points + one of
exploded intervals; explosion factor = interval_length / w + 1, so
pick ``bin_width_seconds`` near the typical interval length. This is
the standard interval-bucketing strategy (cf. Databricks range-join
bin hints) expressed in plain Catalyst operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo: str,
    hi: str,
    on: list[str] | None = None,
    bin_width_seconds: int = 300,
) -> DataFrame:
    """Inner-join ``points`` to every ``intervals`` row whose
    ``[lo, hi)`` half-open window contains ``point_ts`` (and whose key
    columns ``on`` match, when given).

    Returns all columns of both inputs (key columns once). Intervals
    with ``hi <= lo`` (empty windows) match nothing.
    """
    keys = list(on or [])
    w = int(bin_width_seconds)
    if w <= 0:
        raise ValueError(f"bin_width_seconds must be positive, got {w}")

    # All bin math in exact integral micros (unix_micros) — no float
    # edge error at bin boundaries.
    w_us = F.lit(w * 1_000_000)
    p = points.withColumn("__bin", F.floor(F.unix_micros(F.col(point_ts)) / w_us))
    # hi is exclusive: a window ending exactly on a bin edge never
    # reaches that bin, hence floor((hi_us - 1) / w_us).
    i = intervals.where(F.col(hi) > F.col(lo)).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(lo)) / w_us),
                F.floor((F.unix_micros(F.col(hi)) - 1) / w_us),
            )
        ),
    )
    joined = p.join(i, keys + ["__bin"], "inner").where(
        (F.col(lo) <= F.col(point_ts)) & (F.col(point_ts) < F.col(hi))
    )
    return joined.drop("__bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    on: list[str] | None = None,
    bin_width_seconds: int = 300,
) -> DataFrame:
    """Inner-join interval rows to interval rows on overlap:
    ``[l_lo, l_hi)`` intersects ``[r_lo, r_hi)`` (and key columns
    ``on`` match, when given). The interval x interval sibling of
    ``range_join``.

    Scale design: both sides explode into bins; a pair could share
    MANY bins, so the join keeps only the first shared one — the bin
    of ``greatest(l_lo, r_lo)``, which both intervals contain whenever
    they overlap — making each qualifying pair meet exactly once with
    no post-join dedup shuffle. Explosion factor is interval_length/w
    + 1 per side; pick ``bin_width_seconds`` near the typical interval
    length. Empty windows (hi <= lo) match nothing.
    """
    keys = list(on or [])
    w = int(bin_width_seconds)
    if w <= 0:
        raise ValueError(f"bin_width_seconds must be positive, got {w}")
    w_us = F.lit(w * 1_000_000)

    def binned(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.where(F.col(hi) > F.col(lo)).withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(F.col(lo)) / w_us),
                    F.floor((F.unix_micros(F.col(hi)) - 1) / w_us),
                )
            ),
        )

    l = binned(left, l_lo, l_hi)
    r = binned(right, r_lo, r_hi)
    joined = l.join(r, keys + ["__bin"], "inner").where(
        (F.col(l_lo) < F.col(r_hi))
        & (F.col(r_lo) < F.col(l_hi))
        # meet-once: only in the bin containing the overlap's start
        & (
            F.col("__bin")
            == F.floor(
                F.greatest(
                    F.unix_micros(F.col(l_lo)), F.unix_micros(F.col(r_lo))
                )
                / w_us
            )
        )
    )
    return joined.drop("__bin")
