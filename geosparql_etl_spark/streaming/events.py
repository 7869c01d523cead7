"""Structured Streaming surface (SURVEY.md §2.9).

The reference's streaming-shaped behaviors — cursor micro-batching
(mongodb_to_rdf.py:515), incremental flush every 1000 marks (:540-546),
resumable checkpointing (:114-192) and live progress reporting
(:799-821) — map onto Structured Streaming: micro-batch triggers,
foreachBatch sinks, checkpointLocation, and query-progress listeners.
Watermarked event-time windows are the Spark-native extension the
reference never had.

Everything here is a *streaming* DataFrame chain; the same column
expressions run identically in batch mode (the tests assert
stream-vs-batch result equality via availableNow triggers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Schema of the driver's events table with the raw nano-precision
# timestamp read as long (Spark 4 rejects TIMESTAMP(NANOS) parquet
# natively; micros truncation matches DuckDB TIMESTAMP semantics).
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
    ]
)


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the `ts` column to session-TZ TIMESTAMP whatever the
    parquet encoding was: long nanos (TIMESTAMP(NANOS) under
    nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP. Session timezone is
    pinned UTC by callers, so NTZ->LTZ is the identity mapping and
    matches the DuckDB oracle's naive-UTC semantics."""
    dt = dict(df.dtypes)["ts"]
    if dt == "bigint":
        # integer div, NOT float /: nanos ~1.7e18 exceeds double precision
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt != "timestamp":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def events_file_stream(
    spark: SparkSession, source_dir: str, schema: StructType | None = None
) -> DataFrame:
    """File-source streaming read of events parquet files.

    New files appearing under ``source_dir`` become micro-batches — the
    streaming analog of the reference's cursor batches. maxFilesPerTrigger
    bounds per-batch work like the cursor's batch_size=5000.

    readStream needs the schema up-front; sniff it from the parquet
    footers with a batch read (driver-side metadata only, no scan) so
    the stream works for either `ts` encoding the driver generates.
    When the directory is empty at stream construction (the normal
    file-source bootstrap: start the stream, THEN land files) the sniff
    cannot infer anything — fall back to ``schema`` or
    EVENTS_RAW_SCHEMA so the stream still starts; files that later
    arrive with the long-nanos ts encoding are read as long and
    normalized the same way.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        try:
            schema = spark.read.parquet(source_dir).schema
        except Exception:
            schema = EVENTS_RAW_SCHEMA
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    return normalize_event_ts(raw)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type.

    The watermark bounds state: events later than ``watermark`` behind
    the max seen event time are dropped and their windows finalized —
    this is what lets the aggregation run forever on unbounded input.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


def json_props_metrics(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Schema-on-read JSON parsing INSIDE the stream: extract a typed
    field from the `props` JSON string with the native path expression
    (per micro-batch, whole-stage codegen — the streaming analog of
    the p14 batch query), then a watermarked tumbling aggregate of the
    extracted metric. The parse adds no state; only the windowed
    aggregate holds state, bounded by the watermark."""
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.withColumn("k", k)
        .where(F.col("k").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.avg("k"), 4).alias("avg_k"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "avg_k"
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked sliding-window event counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def stream_dedup(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming dedup: first arrival per key wins, duplicate arrivals
    within the watermark horizon are dropped, and key state is evicted
    once the watermark passes — so state is bounded by (keys active per
    horizon), not by stream length. This is the streaming half of the
    charter dedup family (d01's exact dedup for unbounded input).

    On a batch DataFrame the same call degrades to plain
    ``dropDuplicates(keys)`` semantics (which row survives is
    arbitrary in both modes — project the keys, or pre-aggregate, when
    determinism matters)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: each purchase is
    attributed to every click by the same user in the preceding
    ``horizon``. The event-time bound on both sides is what lets the
    join state expire — without it a stream-stream join buffers forever.
    Works identically on batch DataFrames (the time bound becomes a
    plain range predicate), which is how the driver oracle checks it
    (s05).

    ``how="right_outer"`` keeps UNATTRIBUTED purchases (click columns
    null) — the organic-conversion channel. In streaming, outer rows
    can only be emitted once the watermark proves no matching click
    can still arrive, so null-side results trail the inner results by
    up to ``watermark`` (batch emits them immediately; the
    stream-vs-batch test tolerates only ordering, not content,
    differences). s12 is the batch analog."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")
        ),
        how,
    ).select(
        "click_id",
        "purchase_id",
        F.coalesce(F.col("p_user"), F.col("c_user")).alias("user_id"),
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        "purchase_value",
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Native session windows per user (30-min inactivity gap) — the
    streaming counterpart of the batch lag/cumsum sessionization
    (s03 in the driver contract)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total",
        )
    )
