"""Streaming doc sink: foreachBatch + checkpointLocation.

The reference's mongo-etl loop streams a cursor, flushes a gzip TTL
file every 1000 marks, and appends completed ids to an fsync'd ledger
so a crash resumes where it left off (mongodb_to_rdf.py:515,540-580,
114-192). The Structured Streaming shape is strictly stronger:

  - micro-batch = cursor batch (maxFilesPerTrigger bounds it),
  - foreachBatch renders and writes the batch's documents,
  - checkpointLocation replaces the hand-rolled ledger — offsets commit
    only after the batch's sink completes, so restart is exactly-once
    per file (at-least-once per row inside a partially-failed batch,
    same as the reference's analysis-level replay).

Progress (marks/sec, the reference's :799-821 live metrics) comes from
``query.lastProgress`` / a StreamingQueryListener instead of manual
counters.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geosparql_etl_spark.operators.render import ordered_concat
from geosparql_etl_spark.sinks.ttl import write_documents


def stream_to_ttl_batches(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    batch_size: int = 1000,
    on_batch: Callable[[DataFrame, int], None] | None = None,
):
    """Start a streaming query that renders each micro-batch of events
    into per-(event_type, batch) gzip documents.

    Batching is per micro-batch (the streaming analog of W1): rows are
    ordered by (ts, event_id) within the batch, chunked ``batch_size``
    per document, rendered with the same deterministic ordered-concat
    the batch pipelines use, and written via the partitioned gzip sink.

    Returns the StreamingQuery; callers stop it or await termination.
    """

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if on_batch is not None:
            on_batch(batch_df, epoch_id)
        from pyspark.sql import Window

        w = Window.partitionBy("event_type").orderBy("ts", "event_id")
        batched = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .withColumn(
                "batch_id", F.floor((F.col("__rn") - 1) / batch_size).cast("int")
            )
            .withColumn(
                "__line",
                F.format_string(
                    "event %d user %d value %.4f",
                    F.col("event_id"),
                    F.col("user_id"),
                    F.col("value"),
                ),
            )
        )
        docs = batched.groupBy("event_type", "batch_id").agg(
            ordered_concat(F.col("event_id"), F.col("__line"), "\n").alias("body")
        )
        # epoch goes into the layout so replayed batches overwrite their
        # own output (idempotent re-run), never another epoch's.
        docs = docs.withColumn("epoch", F.lit(epoch_id))
        write_documents(
            docs,
            out_dir,
            partition_cols=["epoch", "event_type"],
            text_col="body",
            mode="append",
        )

    return (
        events.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_batched_doc_stream(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    batch_size: int = 1000,
    timeout_sec: int = 300,
) -> dict:
    """Run the TTL batch stream to completion (availableNow) and return
    {"batches": n, "rows": n} progress totals — the reference's final
    stats block (mongodb_to_rdf.py:829-845)."""
    seen = {"batches": 0, "rows": 0}

    def count_batch(df: DataFrame, _epoch: int) -> None:
        seen["batches"] += 1
        seen["rows"] += df.count()

    q = stream_to_ttl_batches(
        events, out_dir, checkpoint_dir, batch_size, on_batch=count_batch
    )
    q.awaitTermination(timeout_sec)
    return dict(seen)


def stream_upsert_parquet(
    events: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key_cols: tuple[str, ...] = ("event_id",),
    timeout_sec: int = 300,
    max_partitions_per_batch: int = 1000,
):
    """Streaming MERGE into a date-partitioned parquet table: each
    micro-batch upserts its rows, replacing ONLY the partitions it
    touches (dynamic overwrite) — the streaming-to-lakehouse pattern
    that keeps a queryable table exactly-once per merge key under
    replays.

    The merge key is (key_cols, event_date): the partition column is
    part of the key, exactly as lakehouse MERGEs require when the read
    side is partition-pruned. A key arriving later with a DIFFERENT
    event date is a new logical row (the old date's partition is
    untouched — deduping across dates would force reading the whole
    table per batch; a key-indexed layout, not a date layout, is the
    right design for that workload).

    Per batch: read back just the affected date partitions (the
    driver-side date list is bounded by the batch's distinct dates —
    that literal list is what makes the read partition-pruned), union
    with the batch, keep ONE row per merge key — batch beats table,
    ties inside the batch resolved by (ts DESC, then a content hash)
    so the winner is a deterministic function of the DATA, never of
    shuffle order — and dynamic-overwrite those partitions. A replayed
    epoch re-derives the identical merge, so the sink is idempotent;
    the commit protocol makes each partition swap atomic. Only a
    missing table directory is treated as first-batch; any other
    read-back failure propagates (silently treating a transient read
    error as "empty table" would overwrite merged partitions with
    batch-only data). Runs availableNow to completion.
    """
    import os

    from pyspark.sql import Window

    from geosparql_etl_spark.sinks.parquet import write_partitioned

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        b = batch_df.withColumn("event_date", F.to_date(F.col("ts"))).withColumn(
            "__prio", F.lit(0)
        )
        # Guard the driver-side date list BEFORE collecting it: it is
        # bounded by the batch's date domain (small by construction for
        # event streams), but a mis-partitioned replay/backfill batch
        # spanning thousands of dates would drag them all through the
        # driver and rewrite that many partitions in one commit. The
        # limit(cap+1) bounds the collect itself; failing loudly beats
        # an unbounded partition rewrite.
        dates = [
            r[0]
            for r in b.select("event_date")
            .distinct()
            .limit(max_partitions_per_batch + 1)
            .collect()
        ]
        if len(dates) > max_partitions_per_batch:
            raise ValueError(
                f"batch {epoch_id} spans > {max_partitions_per_batch} "
                f"event_date partitions; this sink's date-partitioned "
                f"MERGE is not the right layout for that batch shape — "
                f"split the backfill by date range or raise "
                f"max_partitions_per_batch deliberately"
            )
        if os.path.isdir(table_dir):
            cur = (
                spark.read.parquet(table_dir)
                .where(F.col("event_date").isin(dates))
                .select(*b.columns[:-1])
                .withColumn("__prio", F.lit(1))
            )
            unioned = b.unionByName(cur)
        else:
            unioned = b  # first batch: table does not exist yet
        data_cols = [c for c in unioned.columns if c != "__prio"]
        w = Window.partitionBy(*key_cols, "event_date").orderBy(
            "__prio", F.desc("ts"), F.xxhash64(*data_cols)
        )
        merged = (
            unioned.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__prio", "__rn")
        )
        # sever lineage before overwriting the partitions just read
        write_partitioned(merged.localCheckpoint(), table_dir, ["event_date"])

    q = (
        events.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q
