"""Skew-aware join: explicit salting for keys too hot for AQE.

AQE's skew-join handling splits oversized SHUFFLE partitions, which
covers most skew. What it cannot fix: a single join KEY whose rows
exceed one executor's memory on the build side, or skew through a
broadcast-ineligible many-to-many join. The classic remedy is salting:
replicate the small side R times, scatter the big side's hot keys
across R sub-keys, join on (key, salt), and the hot key's work spreads
over R tasks.

Cost model (why this is opt-in, not default): the small side is
materialized R times and every big-side row grows a salt column —
pure overhead when keys are uniform. Use when key-frequency stats say
a key exceeds ~1 task's capacity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salts: int = 16,
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on column ``on``, scattering
    each big-side key across ``salts`` sub-partitions.

    The big side gets a deterministic salt (hash of its row identity
    mod R — deterministic so retries/speculation see stable data); the
    small side is exploded to all R salt values. Join key becomes
    (on, salt). Output columns match a plain join (salt dropped).
    """
    if salts < 2:
        raise ValueError("salts must be >= 2 (use a plain join otherwise)")
    if how not in ("inner", "left", "left_semi", "left_anti"):
        # The small side is replicated once per salt value, so for
        # right/full outer joins every small-side row whose (key, salt)
        # finds no big-side partner would be null-extended once PER SALT
        # — silently diverging from a plain join (ADVICE r02). Those
        # variants need a post-join dedup of the replicated side; until
        # someone needs them, reject loudly rather than corrupt.
        raise ValueError(
            f"salted_join supports how in ('inner','left','left_semi','left_anti'); "
            f"got {how!r} — right/full would duplicate unmatched small-side rows "
            f"once per salt"
        )
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salts))
    )
    small_salted = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    joined = big_salted.join(
        small_salted,
        on=[big_salted[on] == small_salted[on], big_salted["__salt"] == small_salted["__salt"]],
        how=how,
    )
    # drop the duplicate key + salt columns from the small side
    return joined.drop(small_salted[on]).drop(small_salted["__salt"]).drop(
        big_salted["__salt"]
    )
