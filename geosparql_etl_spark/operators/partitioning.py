"""Partition-layout helpers shared by the compute-dense operators.

A single small parquet file arrives as ONE scan partition; any operator
that multiplies work per input row (explode, cross join, per-row
folds) then runs its whole map stage on one core. ``spread`` fixes the
local/small case and is a no-op at real scale where the source already
has many splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition when the input has too few partitions.

    No-op when the source is already at least half the target wide, so
    well-partitioned 100 TB inputs never pay an extra shuffle; only
    degenerate narrow inputs (1-file local tables, post-coalesce tails)
    are spread.
    """
    t = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, t // 2):
        return df.repartition(t)
    return df
