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

    Width is estimated from the scan's file listing (``inputFiles`` —
    driver-side metadata, already cached by the read), NOT
    ``df.rdd.getNumPartitions()``: the RDD probe forces an
    RDD-conversion plan per call and bypasses AQE statistics. The file
    count undercounts split large files, which only errs toward
    spreading — and a table wide because its files are few-but-huge is
    exactly the case AQE rebalances anyway.
    """
    t = target or df.sparkSession.sparkContext.defaultParallelism
    try:
        width = len(df.inputFiles())
    except Exception:
        return df  # non-file source: assume the source chose its width
    if 0 < width < max(2, t // 2):
        return df.repartition(t)
    return df


def global_rank(
    df: DataFrame,
    order_cols,
    bucket,
    rank_name: str = "rank",
):
    """Scale-correct total ordering: dense global row numbers WITHOUT a
    single-partition global window (the local-mode shortcut that
    deadlocks a 1000-executor cluster on one task).

    ``bucket`` must be a deterministic expression that coarsens the
    sort order (every row in bucket i sorts before every row in bucket
    i+1). Three declarative steps:

      1. per-bucket counts — a tiny aggregate, #buckets rows;
      2. exclusive prefix-sum of counts over bucket id — a window over
         the #buckets-row aggregate (single partition of TINY data, by
         construction);
      3. broadcast the offsets back and row_number WITHIN each bucket.

    Every corpus-sized stage is parallel in #buckets; no collect(), no
    global sort. The same shape implements deterministic sharding and
    resumable pagination at 100 TB.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    b = df.withColumn("__bucket", bucket)
    counts = b.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    woff = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__bucket",
        F.coalesce(F.sum("__n").over(woff), F.lit(0)).alias("__offset"),
    )
    wb = Window.partitionBy("__bucket").orderBy(*order_cols)
    return (
        b.join(F.broadcast(offsets), "__bucket")
        .withColumn(rank_name, F.row_number().over(wb) + F.col("__offset"))
        .drop("__bucket", "__offset")
    )


def global_prefix_sum(
    df: DataFrame,
    order_cols,
    bucket,
    value_col: str,
    out: str = "offset",
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` in a GLOBAL order without
    a single-partition window — global_rank's generalization from
    counting rows to summing an arbitrary non-negative value (rank is
    the value=1 special case).

    Same three declarative steps: per-bucket sums (tiny aggregate),
    exclusive prefix over the #buckets-row aggregate, broadcast back
    and run the within-bucket exclusive running sum on top of the
    bucket offset. ``bucket`` must coarsen ``order_cols`` (bucket i
    wholly precedes bucket i+1). Every corpus-sized stage is parallel
    in #buckets.

    The canonical use is token-offset assignment: each document's
    global starting token position in a concatenated training stream
    (llm15) — the prerequisite for slicing fixed-size attention blocks
    deterministically in parallel.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    b = df.withColumn("__bucket", bucket)
    sums = b.groupBy("__bucket").agg(F.sum(value_col).alias("__s"))
    woff = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sums.select(
        "__bucket",
        F.coalesce(F.sum("__s").over(woff), F.lit(0)).alias("__boff"),
    )
    wb = (
        Window.partitionBy("__bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            out,
            F.col("__boff")
            + F.coalesce(F.sum(value_col).over(wb), F.lit(0)),
        )
        .drop("__bucket", "__boff")
    )
