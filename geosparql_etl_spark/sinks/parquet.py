"""Parquet table sinks: idempotent partitioned writes and small-file
compaction.

No reference counterpart file (the reference writes TTL documents);
these are the table-maintenance operations a 100 TB Spark deployment
needs around every batch pipeline:

- ``write_partitioned``: dynamic partition overwrite — re-running a
  backfill for one day/source replaces ONLY the partitions present in
  the incoming frame, leaving every other partition untouched. This is
  what makes daily jobs idempotent (the K3 versioned-rewrite semantics,
  applied at partition granularity instead of whole-snapshot).
- ``compact_partitions``: rewrite a table directory into
  bounded-row-count files. Streaming/frequent-batch sinks accrete small
  files; scan cost at 100 TB is dominated by file-open overhead when
  the file count explodes, so periodic compaction is part of the sink
  contract, not an afterthought.

Both are thin over Spark's native writer on purpose: the commit
protocol (write to _temporary, rename on success) provides atomicity,
and partition pruning on read comes from the directory layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    max_records_per_file: int | None = None,
) -> None:
    """Write/overwrite ``df`` into a hive-layout parquet table,
    replacing ONLY the partitions present in ``df`` (dynamic mode).

    Static overwrite (Spark's default) would TRUNCATE the whole table
    first — a re-run of one day's backfill deleting every other day is
    the classic data-loss footgun this function exists to prevent. The
    mode is set per-write and restored, so a shared session keeps its
    configured default.

    ``max_records_per_file`` bounds output file sizes at write time
    (the cheap way to avoid needing compact_partitions later when the
    writer itself is the small-file source).
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        w = df.write.mode("overwrite").partitionBy(*partition_cols)
        if max_records_per_file:
            w = w.option("maxRecordsPerFile", max_records_per_file)
        w.parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: Sequence[str],
    max_records_per_file: int,
) -> None:
    """Rewrite a partitioned parquet table into files of at most
    ``max_records_per_file`` rows, partition layout preserved.

    Read -> write to the same logical table via dynamic overwrite:
    every partition that exists is rewritten in place (its own commit),
    untouched partitions cannot be dropped because the read includes
    them all. The read and write are both cluster-parallel; no
    driver-side file listing or per-file loop. On a real deployment,
    run per-partition-predicate (filter the read) to bound the rewrite
    to recently-written partitions.
    """
    df = spark.read.parquet(path)
    # materialize before overwriting the source dir: localCheckpoint
    # severs lineage so the write doesn't read the files it replaces
    snap = df.localCheckpoint()
    write_partitioned(
        snap, path, partition_cols, max_records_per_file=max_records_per_file
    )


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int,
    compress: bool = True,
) -> DataFrame:
    """Export a corpus as bounded-size JSONL shards + a manifest — the
    hand-off format training jobs consume (one JSON object per line,
    shards small enough to stream, a manifest to schedule reads).

    The write is Spark's native JSON sink (cluster-parallel, atomic via
    the commit protocol) with per-file row bounds; the manifest is
    computed DISTRIBUTEDLY by reading the shards back AS TEXT — one
    line per record, file path and byte size from the file-metadata
    column (no driver-side listing loop, no JSON parse, and critically
    no schema-INFERENCE pass, which would decompress every shard a
    second time just to discover a schema the manifest never uses) —
    and returned as a DataFrame for the caller to persist next to the
    data.
    """
    w = df.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    )
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)

    from pyspark.sql import functions as F

    spark = df.sparkSession
    rows = (
        spark.read.text(path)
        .select(
            F.col("_metadata.file_path").alias("shard"),
            F.col("_metadata.file_size").alias("bytes"),
        )
        .groupBy("shard", "bytes")
        .agg(F.count(F.lit(1)).alias("n_records"))
    )
    return rows
