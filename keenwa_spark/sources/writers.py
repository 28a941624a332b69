"""Writers shaped for 100 TB outputs.

The two failure modes at scale are (a) one giant file per partition
(coalesce(1) folklore) and (b) millions of tiny files (over-partitioned
writes). ``write_parquet`` targets a file size by repartitioning on the
partition columns plus a salt sized from an (estimated or measured)
byte count, which is how production lakehouse writers behave.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: target output file size — parquet sweet spot for scan parallelism
TARGET_FILE_BYTES = 256 << 20


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    est_bytes: int | None = None,
    mode: str = "error",
) -> None:
    """Write parquet with sane file sizing.

    ``est_bytes``: estimated total output size; files are targeted at
    ~256 MB each. Without an estimate the writer trusts the current
    partitioning (AQE has usually coalesced it sensibly).
    """
    writer = df.write.mode(mode)
    if est_bytes:
        n_files = max(1, math.ceil(est_bytes / TARGET_FILE_BYTES))
        if partition_by:
            # salt within partition dirs so each dir gets ~n_files/dirs
            df = df.withColumn(
                "__salt", (F.rand(seed=42) * n_files).cast("int")
            )
            df = df.repartition(n_files, *partition_by, F.col("__salt"))
            df = df.drop("__salt")
            writer = df.write.mode(mode)
        else:
            writer = df.repartition(n_files).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
