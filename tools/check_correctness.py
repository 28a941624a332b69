"""Local mirror of the driver's t2 correctness gate.

Runs every registry query on Spark at sf0.01 and its oracle on DuckDB
over the same parquet files, then compares row count, schema (column
names sorted), and values (rows sorted, order-insensitive) — the same
shape of check the driver records in CORRECTNESS_r{N}.json.

Usage:
    python tools/check_correctness.py            # all queries
    python tools/check_correctness.py name1 ...  # subset
    SF_DIR=/root/testdata/sf0.001 python tools/check_correctness.py
    REGIME_SEED=1 python tools/check_correctness.py
        # run the WHOLE registry under one seeded optimizer regime
        # (AQE x CBO x broadcast-threshold sampled from the same
        # 8-regime grid as tests/test_conf_regimes.py) — results must
        # be oracle-exact under every physical-plan regime, not just
        # the tuned session defaults
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def norm(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by all columns — order-insensitive."""
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype == object:
            # lists/arrays are unhashable & unsortable — tuple-ize
            df[col] = df[col].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "__len__")
                and not isinstance(v, str) else v
            )
    if len(df):
        df = df.sort_values(
            by=list(df.columns), na_position="first", key=lambda s: s.map(str)
        ).reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        # exact: be at least as strict as whatever the driver hashes
        return a == b or (math.isnan(a) and math.isnan(b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    a, b = norm(spark_pdf), norm(duck_pdf)
    n_bad = 0
    first_bad = None
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not values_equal(x, y):
                n_bad += 1
                if first_bad is None:
                    first_bad = f"col {col} row {i}: spark={x!r} duck={y!r}"
                break  # one mismatch per column is enough to flag
    if n_bad:
        problems.append(f"{n_bad} mismatched column(s); first: {first_bad}")
    # dtype diagnostics (informational — driver checks schema too).
    # All-NULL columns are exempt: their pandas dtype is an artifact.
    for col in a.columns:
        if str(a[col].dtype) != str(b[col].dtype) and not (
            a[col].isna().all() and b[col].isna().all()
        ):
            problems.append(f"dtype {col}: spark={a[col].dtype} duck={b[col].dtype}")
    return problems


def main() -> int:
    only = set(sys.argv[1:])
    from keenwa_spark.queries import load_all

    registry = load_all()
    if os.environ.get("VANILLA"):
        # driver-condition mode: a bare session with none of session.py's
        # configs — results must STILL be oracle-exact
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        from keenwa_spark.session import get_spark

        spark = get_spark("check_correctness")
    if os.environ.get("REGIME_SEED"):
        import itertools
        import random

        grid = [
            {
                "spark.sql.adaptive.enabled": str(aqe).lower(),
                "spark.sql.cbo.enabled": str(cbo).lower(),
                "spark.sql.autoBroadcastJoinThreshold": bcast,
            }
            for aqe, cbo, bcast in itertools.product(
                (True, False), (True, False), ("-1", "10485760")
            )
        ]
        regime = random.Random(int(os.environ["REGIME_SEED"])).choice(grid)
        for k, v in regime.items():
            spark.conf.set(k, v)
        print(f"# regime (seed {os.environ['REGIME_SEED']}): {regime}")
    con = duck_con(SF_DIR)

    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, SF_DIR)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if spec.oracle is None:
            n_rows_only += 1
            print(f"rows  {name}: {len(spark_pdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            duck_pdf = con.execute(spec.oracle).fetchdf()
        except Exception as e:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: " + " | ".join(problems))
        else:
            n_pass += 1
            print(f"ok    {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")

    print(
        f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} FAILED"
        + (f": {' '.join(failures)}" if failures else "")
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
