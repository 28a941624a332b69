"""As-of (temporal) join: for each left row, the single most recent
right row at-or-before the left row's timestamp, per key.

Beyond-reference surface: keenwa has no temporal-join operator (its
join enum is equi/theta — reference ``operators/relational/join.rs:10-40``);
this is the classic time-series/attribution primitive (pandas
``merge_asof``, DuckDB ``ASOF JOIN``, kdb ``aj``).

Scale design — why NOT an inequality join: the naive plan
``l JOIN r ON l.k = r.k AND l.ts >= r.ts`` explodes to all
qualifying pairs (O(|l|x|r|) within a key) before the per-row argmax
prunes them, and Spark plans non-equi conditions as BroadcastNestedLoop
when the key is absent. Instead we UNION the two sides (tagged), sort
once within each key partition, and carry the latest right payload
forward with ``last(..., ignorenulls=True)``:

    cost = ONE shuffle on the key, one in-partition sort — the same
    cost as a windowed aggregate over the union, independent of match
    fan-out. At 100 TB both sides partition by key; no pair blow-up,
    no nested loop, no driver state.

Determinism: ordering is (ts, side) where right rows sort before left
rows at equal timestamps — the join is inclusive (left.ts >= right.ts),
matching DuckDB ASOF JOIN semantics. The carried value is the RUNNING
MAX of the payload struct, whose first field is the right row's ts:
``max(struct(ts, payload...))`` over the growing frame picks the
greatest right ts seen so far (= the as-of match), tie-broken by the
lexicographically greatest payload when several right rows share the
same (key, ts). That rule is a total order, stable across runs and
partitionings — an arbitrary-but-deterministic choice the caller can
rely on (pre-dedup the right side if a different rule is wanted).
Cost: the window sort stays the cheap two-column (ts, side) order and
the running max is an O(1)-per-row incremental aggregate (struct
comparison short-circuits on the leading ts field, so it only inspects
payload bytes on ts ties) — same single-shuffle plan as a windowed
``last()``, no pre-reduction pass needed. Payload columns must be
orderable types for this guarantee (maps are not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every ``left`` row, annotated with the columns
    of the matching ``right`` row on the same key — the most recent
    one with ``right.ts <= left.ts`` (``direction='backward'``, the
    default) or the NEXT one with ``right.ts >= left.ts``
    (``direction='forward'`` — next-touch attribution, time-to-next-
    failure). NULLs when no such row, or when it is further away than
    ``tolerance_seconds``.

    ``right_cols`` are the right-side payload columns to carry (default:
    all non-key, non-ts columns), each emitted as ``<col><suffix>``;
    ``<right_ts><suffix>`` is always included.

    Both directions are the SAME single-shuffle union-and-carry plan:
    forward just negates the struct's leading order key (running max of
    -epoch = minimum future ts) and iterates the window in descending
    time order.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]

    # the struct's leading field is a BIGINT order key: +epoch for
    # backward (max = most recent past), -epoch for forward (max =
    # nearest future); equal-ts duplicates fall through to the payload
    # fields and resolve to the lexicographically greatest
    sign = 1 if direction == "backward" else -1
    payload = F.struct(
        (F.lit(sign) * F.unix_micros(F.col(right_ts))).alias("__ord"),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ats"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l_tagged = left.select(
        "*",
        F.col(left_ts).alias("__ats"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__payload"].dataType).alias("__payload"),
    )
    # unionByName(allowMissingColumns): left's own columns are NULL on
    # right-side rows; they are discarded by the final side filter.
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        # right rows (side 0) sort before left rows at equal ts so the
        # inclusive match lands inside the frame; the tiebreak on
        # duplicate right (key, ts) rows is handled by max() below, so
        # the sort itself stays a cheap two-column order. forward
        # iterates time DESCENDING (the frame then holds future rows).
        .orderBy(
            F.col("__ats").asc() if direction == "backward"
            else F.col("__ats").desc(),
            F.col("__side").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Running max of struct(__ts, payload...): greatest right ts in the
    # frame = the as-of match; equal-ts duplicates resolve to the
    # greatest payload. max() skips the left rows' NULL payloads.
    matched = (
        unioned.withColumn("__m", F.max("__payload").over(w))
        .where(F.col("__side") == 1)
        .drop("__ats", "__side", "__payload")
    )

    if tolerance_seconds is not None:
        gap: Column = (
            F.col(f"{left_ts}").cast("double")
            - F.col("__m.__ts").cast("double")
        )
        within: Column = (
            gap if direction == "backward" else -gap
        ) <= float(tolerance_seconds)
        matched = matched.withColumn(
            "__m", F.when(within, F.col("__m"))
        )

    out = matched.withColumn(
        f"{right_ts}{suffix}", F.col("__m.__ts")
    )
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"__m.{c}"))
    return out.drop("__m")
