"""Change-data-capture operators: snapshot diff and MERGE-style upsert.

Beyond-reference surface (keenwa is a pure query optimizer with no DML
or state maintenance — reference ``src/sql/parser`` rejects DML, see
``keenwa_spark/dialect.py`` reject matrix). These are the two
state-maintenance primitives every snapshot-based ingestion pipeline
needs: *what changed between two materialized states* (``snapshot_diff``)
and *apply a keyed delta onto a base state* (``merge_upsert`` — the
``MERGE INTO`` analog for an engine whose tables are immutable files).

Scale design (100 TB): both operators are a single keyed full-outer
join — one shuffle per side on the key, no windows, no skew surface
beyond the key distribution itself (AQE skew-join applies). When the
base state is written bucketed by the key (``sources/bucketing.py``)
the base side's Exchange disappears and only the (much smaller) delta
shuffles — the standard incremental-maintenance layout. Change
classification is pure codegen (``CASE`` over null-ness and value
comparison); nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
    null_safe_keys: bool = False,
) -> DataFrame:
    """Diff two keyed snapshots of the same logical table.

    Returns one row per key present in either snapshot with
    ``change_type`` ∈ {'insert', 'delete', 'update', 'unchanged'}
    ('unchanged' only when ``include_unchanged``), the key columns, and
    ``old_<c>`` / ``new_<c>`` for every compared column.

    COMPARED columns are always null-safe: differing only in null-ness
    counts as an update (``<=>``). KEY columns default to plain SQL
    equality — a NULL-keyed row never matches, so it reports as
    delete + insert rather than update. Pass ``null_safe_keys=True``
    to treat NULL keys as one group (matching the GROUP BY that
    typically produced the snapshots); this costs one extra exchange
    per side, because Catalyst cannot reuse the inputs' hash
    partitioning through null-safe join keys (measured: 2x exchanges).
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    missing = [c for c in compare_cols if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"compare columns missing from a snapshot: {missing}")

    # explicit presence markers: with plain-equality keys a NULL-keyed
    # row keeps NULL key columns even when present, so key-null-ness
    # cannot signal side membership
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = [
        F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        if null_safe_keys
        else F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        for k in keys
    ]
    j = o.join(n, on=cond, how="full_outer")

    in_old = F.col("__in_old").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
            for k in keys
        ],
        change.alias("change_type"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )
    if not include_unchanged:
        out = out.where(F.col("change_type") != "unchanged")
    return out


def merge_upsert(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    combine: dict[str, str] | None = None,
    null_safe_keys: bool = False,
) -> DataFrame:
    """Apply a keyed ``delta`` onto ``base`` (MERGE INTO analog).

    For every non-key column present in both sides, the merged value
    is, per ``combine[col]``:

    - ``'replace'`` (default): delta's value when the key matched,
      else base's (WHEN MATCHED THEN UPDATE SET col = delta.col);
    - ``'sum'``: base + delta treating a missing side as zero — the
      additive-partial merge used for incremental aggregates;
    - ``'greatest'`` / ``'least'``: null-skipping extremum of the two.

    Keys only in delta are inserted, keys only in base are kept
    untouched (full-outer semantics; there is no WHEN MATCHED DELETE —
    express deletions as an anti-join before merging).

    Key matching defaults to plain SQL equality (NULL-keyed rows never
    match — a NULL-keyed delta row inserts alongside any NULL-keyed
    base row); ``null_safe_keys=True`` merges NULL keys as one group
    at the cost of an extra exchange per side (see snapshot_diff).
    """
    value_cols = [c for c in base.columns if c not in keys]
    extra = [c for c in delta.columns if c not in keys and c not in value_cols]
    if extra:
        raise ValueError(f"delta has columns not in base: {extra}")
    combine = dict(combine or {})
    unknown = set(combine) - set(value_cols)
    if unknown:
        raise ValueError(f"combine refers to non-value columns: {sorted(unknown)}")

    b = base.select(
        *[F.col(k).alias(f"__bk_{k}") for k in keys],
        *[F.col(c).alias(f"__b_{c}") for c in value_cols],
    )
    d = delta.select(
        *[F.col(k).alias(f"__dk_{k}") for k in keys],
        *[F.col(c).alias(f"__d_{c}") for c in delta.columns if c not in keys],
        # presence marker — key-null-ness can't signal side membership
        # under plain-equality keys (see snapshot_diff)
        F.lit(True).alias("__in_delta"),
    )
    cond = [
        F.col(f"__bk_{k}").eqNullSafe(F.col(f"__dk_{k}"))
        if null_safe_keys
        else F.col(f"__bk_{k}") == F.col(f"__dk_{k}")
        for k in keys
    ]
    j = b.join(d, on=cond, how="full_outer")

    matched = F.col("__in_delta").isNotNull()
    merged = []
    for c in value_cols:
        if f"__d_{c}" not in j.columns:
            merged.append(F.col(f"__b_{c}").alias(c))
            continue
        how = combine.get(c, "replace")
        bcol, dcol = F.col(f"__b_{c}"), F.col(f"__d_{c}")
        if how == "replace":
            expr = F.when(matched, dcol).otherwise(bcol)
        elif how == "sum":
            # null-skipping add (SUM semantics): both-null stays null.
            # Cast back to base's type: decimal add widens precision by
            # one per merge, which would drift a parquet state store's
            # schema every batch until the 38-digit cap (ADVICE r05).
            expr = F.when(
                bcol.isNull() & dcol.isNull(), F.lit(None)
            ).otherwise(
                F.coalesce(bcol, F.lit(0)) + F.coalesce(dcol, F.lit(0))
            ).cast(base.schema[c].dataType)
        elif how == "greatest":
            expr = F.greatest(bcol, dcol)
        elif how == "least":
            expr = F.least(bcol, dcol)
        else:
            raise ValueError(f"unknown combine strategy {how!r} for {c!r}")
        merged.append(expr.alias(c))

    return j.select(
        *[
            F.coalesce(F.col(f"__bk_{k}"), F.col(f"__dk_{k}")).alias(k)
            for k in keys
        ],
        *merged,
    )


def changelog_compact(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    op_col: str,
    tie_cols: list[str] | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Compact a keyed changelog to its current state (Kafka-style log
    compaction): keep each key's LATEST record by (``ts_col``,
    ``tie_cols``), then drop keys whose latest operation is
    ``delete_op`` (a tombstone kills the key; an earlier upsert never
    resurrects it).

    ``tie_cols`` break exact-``ts`` ties deterministically (pass a
    unique id; without one, equal-ts duplicates would make the survivor
    partition-order-dependent).

    Scale: ONE hash shuffle on the keys and a per-partition sort — the
    same plan a batch dedup-keep-latest takes; at 100 TB run it per
    ingest window and merge_upsert the result into the base state so
    compaction cost tracks the delta, not the log's full history.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in (tie_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        # null-safe inequality: a NULL op (malformed record) must KEEP
        # the key, not silently act as a tombstone the way a plain !=
        # (NULL -> filtered) would
        .where(
            (F.col("__rn") == 1)
            & ~F.col(op_col).eqNullSafe(F.lit(delete_op))
        )
        .drop("__rn")
    )
