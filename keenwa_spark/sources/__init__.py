"""Source / sink layer.

keenwa has no I/O at all (optimizer-only; its 'tables' are catalog
declarations — reference src/catalog/mod.rs:65-93). This package is
therefore beyond-parity surface: the readers/writers an executing
engine needs, thin and declarative so Catalyst keeps pushdown/pruning.

- ``read_parquet / read_csv / read_json / read_orc`` — schema-aware
  readers returning plain DataFrames (scan stays pushdown-capable);
- ``write_parquet`` — partitioned, size-targeted writer (the 100 TB
  output shape: partition columns + target file size, never
  coalesce(1));
- nanosecond-timestamp normalization shared with the Catalog.
"""

from keenwa_spark.sources.readers import (
    read_binary_dir,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
)
from keenwa_spark.sources.writers import backfill_partitions, write_parquet

__all__ = [
    "backfill_partitions",
    "read_binary_dir",
    "read_csv",
    "read_json",
    "read_orc",
    "read_parquet",
    "write_parquet",
]
