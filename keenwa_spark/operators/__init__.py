"""Physical-strategy helpers beyond what Catalyst picks automatically.

Catalyst + AQE cover join selection, skew-join splitting, and partition
coalescing; these helpers exist for the cases where a pipeline author
knows something the optimizer can't see (extreme key skew beyond AQE
thresholds, incremental state joins).
"""

from keenwa_spark.operators.skew import salted_join
from keenwa_spark.operators.incremental import incremental_exact_dedup, incremental_minhash_dedup
from keenwa_spark.operators.anomaly import rolling_zscore_anomaly
from keenwa_spark.operators.asof import asof_join
from keenwa_spark.operators.cdc import changelog_compact, merge_upsert, snapshot_diff
from keenwa_spark.operators.hyperfunctions import (
    counter_delta,
    ohlc_bars,
    state_durations,
    time_weighted_avg,
)
from keenwa_spark.operators.islands import gaps_islands, interval_coalesce, scd2_compress
from keenwa_spark.operators.range_join import range_join
from keenwa_spark.operators.rollup import time_rollup
from keenwa_spark.operators.sequence import sequence_pattern_count
from keenwa_spark.operators.skyline import skyline_2d

__all__ = [
    "asof_join",
    "changelog_compact",
    "counter_delta",
    "gaps_islands",
    "incremental_exact_dedup",
    "incremental_minhash_dedup",
    "interval_coalesce",
    "merge_upsert",
    "ohlc_bars",
    "range_join",
    "rolling_zscore_anomaly",
    "salted_join",
    "scd2_compress",
    "sequence_pattern_count",
    "skyline_2d",
    "snapshot_diff",
    "state_durations",
    "time_rollup",
    "time_weighted_avg",
]
