"""Declarative data-quality expectations: validate a table against a
checklist and emit a per-check report.

Beyond-reference surface (keenwa optimizes queries; it has no data-
quality layer). This is the contract-enforcement step every ingest
pipeline runs before publishing a snapshot: null-rate ceilings, key
uniqueness, accepted value domains, numeric ranges, row-count bounds,
and referential integrity — the Great-Expectations / dbt-test idiom
expressed as Spark aggregates.

Scale design (100 TB): every row-level check compiles into ONE
aggregation pass over a single scan (conditional SUM/MIN/MAX/COUNT
partials — map-side combined, no shuffle beyond the 1-row final agg).
``unique`` adds a count vs count-distinct comparison in the same pass
(Catalyst expands multi-distinct into Expand, still one scan).
Referential-integrity checks are each one left-anti join against the
referenced dimension's distinct keys — broadcast when the dimension is
small, shuffle otherwise; orphan COUNTING never materializes orphan
rows. The report itself is O(#checks) rows built via UNION of 1-row
aggregates — driver-free.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One declarative check. ``kind`` ∈ not_null | unique |
    accepted_values | value_range | row_count | foreign_key."""

    kind: str
    column: str = ""
    max_null_frac: float = 0.0
    values: tuple = ()
    lo: float | None = None
    hi: float | None = None
    min_rows: int | None = None
    max_rows: int | None = None
    ref: str = ""  # name for the referenced table (foreign_key)
    ref_column: str = ""


def not_null(column: str, max_null_frac: float = 0.0) -> Expectation:
    return Expectation("not_null", column=column, max_null_frac=max_null_frac)


def unique(column: str) -> Expectation:
    return Expectation("unique", column=column)


def accepted_values(column: str, values: list) -> Expectation:
    if not values:
        raise ValueError("accepted_values needs a non-empty domain")
    return Expectation("accepted_values", column=column, values=tuple(values))


def value_range(column: str, lo: float, hi: float) -> Expectation:
    if lo is None or hi is None or lo > hi:
        # a NULL bound would make the range predicate NULL and the
        # check pass vacuously — reject instead of silently approving
        raise ValueError(f"value_range needs lo <= hi, got [{lo}, {hi}]")
    return Expectation("value_range", column=column, lo=lo, hi=hi)


def row_count(min_rows: int | None = None, max_rows: int | None = None) -> Expectation:
    return Expectation("row_count", min_rows=min_rows, max_rows=max_rows)


def foreign_key(column: str, ref: str, ref_column: str) -> Expectation:
    return Expectation("foreign_key", column=column, ref=ref, ref_column=ref_column)


def validate_expectations(
    df: DataFrame,
    checks: list[Expectation],
    ref_tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate ``checks`` against ``df``; returns one row per check:
    ``(check_type, target, observed, threshold, passed)``.

    ``observed``/``threshold`` are doubles with check-specific meaning
    (violation fraction vs allowed fraction for not_null; duplicate /
    out-of-domain / out-of-range / orphan COUNTS vs 0; row count vs
    the violated bound or NULL threshold when within bounds). All
    row-level checks share one aggregation pass; each foreign_key
    check adds one anti-join against the referenced table.
    """
    if not checks:
        raise ValueError("checks must be non-empty")
    ref_tables = ref_tables or {}
    for e in checks:
        if e.kind == "foreign_key":
            if e.ref not in ref_tables:
                raise ValueError(
                    f"foreign_key check references unknown table {e.ref!r}"
                )
            if e.column not in df.columns:
                raise ValueError(
                    f"foreign_key check on missing column {e.column!r}"
                )
            if e.ref_column not in ref_tables[e.ref].columns:
                raise ValueError(
                    f"foreign_key check on missing ref column "
                    f"{e.ref!r}.{e.ref_column!r}"
                )
        elif e.kind != "row_count" and e.column not in df.columns:
            raise ValueError(f"{e.kind} check on missing column {e.column!r}")

    # ---- single aggregation pass for all row-level checks ----
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for i, e in enumerate(checks):
        c = F.col(e.column) if e.column else None
        if e.kind == "not_null":
            # coalesce: SUM over an EMPTY table is NULL, but zero rows
            # mean zero violations (vacuous pass), not an unknown one
            aggs.append(
                F.coalesce(F.sum(F.when(c.isNull(), 1).otherwise(0)), F.lit(0))
                .cast("bigint")
                .alias(f"__m_{i}")
            )
        elif e.kind == "unique":
            # duplicates = non-null rows minus distinct non-null values
            aggs.append(F.count(c).cast("bigint").alias(f"__cnt_{i}"))
            aggs.append(F.countDistinct(c).cast("bigint").alias(f"__dst_{i}"))
        elif e.kind == "accepted_values":
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(c.isNotNull() & ~c.isin(*e.values), 1).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("bigint")
                .alias(f"__m_{i}")
            )
        elif e.kind == "value_range":
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(
                            c.isNotNull()
                            & ((c < F.lit(e.lo)) | (c > F.lit(e.hi))),
                            1,
                        ).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("bigint")
                .alias(f"__m_{i}")
            )
    one = df.agg(*aggs)

    # ---- project the 1-row aggregate into report rows ----
    # all non-FK rows come from ONE explode of an array of structs over
    # the single aggregate row: separate per-check selects unioned
    # together would RE-DERIVE the aggregation (and re-scan the table)
    # once per check — lazy plans don't share subtrees
    row_entries: list = []
    report_parts: list[DataFrame] = []
    n = F.col("__n").cast("double")
    for i, e in enumerate(checks):
        if e.kind == "not_null":
            obs = F.when(F.col("__n") == 0, F.lit(0.0)).otherwise(
                F.col(f"__m_{i}").cast("double") / n
            )
            thr = F.lit(float(e.max_null_frac))
            passed = obs <= thr
        elif e.kind == "unique":
            obs = (F.col(f"__cnt_{i}") - F.col(f"__dst_{i}")).cast("double")
            thr = F.lit(0.0)
            passed = obs <= thr
        elif e.kind in ("accepted_values", "value_range"):
            obs = F.col(f"__m_{i}").cast("double")
            thr = F.lit(0.0)
            passed = obs <= thr
        elif e.kind == "row_count":
            obs = n
            lo_ok = (
                F.lit(True) if e.min_rows is None else obs >= F.lit(float(e.min_rows))
            )
            hi_ok = (
                F.lit(True) if e.max_rows is None else obs <= F.lit(float(e.max_rows))
            )
            passed = lo_ok & hi_ok
            # threshold reports the violated bound, NULL when in-bounds
            thr = F.lit(None).cast("double")
            if e.max_rows is not None:
                thr = F.when(~hi_ok, F.lit(float(e.max_rows))).otherwise(thr)
            if e.min_rows is not None:
                thr = F.when(~lo_ok, F.lit(float(e.min_rows))).otherwise(thr)
        elif e.kind == "foreign_key":
            continue  # handled below with a join
        else:
            raise ValueError(f"unknown expectation kind {e.kind!r}")
        row_entries.append(
            F.struct(
                F.lit(e.kind).alias("check_type"),
                F.lit(e.column or "__table__").alias("target"),
                obs.cast("double").alias("observed"),
                thr.cast("double").alias("threshold"),
                passed.alias("passed"),
            )
        )
    if row_entries:
        report_parts.append(
            one.select(
                F.explode(F.array(*row_entries)).alias("__e")
            ).select("__e.*")
        )

    # ---- referential integrity: one anti-join per check ----
    for e in checks:
        if e.kind != "foreign_key":
            continue
        ref_keys = ref_tables[e.ref].select(
            F.col(e.ref_column).alias("__rk")
        ).distinct()
        orphans = (
            df.select(F.col(e.column).alias("__fk"))
            .where(F.col("__fk").isNotNull())
            .join(ref_keys, F.col("__fk") == F.col("__rk"), "left_anti")
            .agg(F.count(F.lit(1)).cast("double").alias("observed"))
        )
        report_parts.append(
            orphans.select(
                F.lit("foreign_key").alias("check_type"),
                F.lit(f"{e.column}->{e.ref}.{e.ref_column}").alias("target"),
                F.col("observed"),
                F.lit(0.0).alias("threshold"),
                (F.col("observed") <= 0).alias("passed"),
            )
        )

    out = report_parts[0]
    for p in report_parts[1:]:
        out = out.unionByName(p)
    return out
