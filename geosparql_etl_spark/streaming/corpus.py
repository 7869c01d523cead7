"""Incremental corpus curation under Structured Streaming: the charter
batch operators (fingerprint dedup, language gate, quality gate, token
counting) composed into the pipeline a training-data team actually
runs — documents LAND continuously, and each micro-batch is cleaned,
deduplicated against everything already ingested, and appended to a
curated table exactly once.

Scale design:
  - the quality/lang/token columns are per-row native expressions
    (scan speed, zero shuffle — the llm10/llm01 argument);
  - cross-batch dedup is streaming dropDuplicates on the text
    fingerprint: Spark keeps the seen-fingerprint set in state-store
    (RocksDB on a cluster), so per-batch cost scales with the BATCH,
    not the corpus — the llm06 incremental-dedup property with the
    state managed by the engine instead of a corpus-side anti-join.
    Unbounded state is the documented trade: a production deployment
    bounds it with dropDuplicatesWithinWatermark when re-crawl dup
    latency has a horizon (see stream_dedup);
  - the sink is foreachBatch append with epoch-tagged output, so a
    replayed micro-batch (failure/restart) overwrites its own files
    idempotently rather than double-appending.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from geosparql_etl_spark.functions.textstats import (
    bpe_ish_token_count,
    lang_id,
    oracle_norm,
    quality_score,
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def docs_file_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of documents parquet drops (schema sniffed
    from footers when files already exist, DOCS_SCHEMA otherwise so
    the stream can start on an empty landing dir)."""
    try:
        schema = spark.read.parquet(source_dir).schema
    except Exception:
        schema = DOCS_SCHEMA
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )


def curate(docs: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """The per-row curation battery + cross-corpus fingerprint dedup.
    Works identically on batch frames (dropDuplicates degrades to the
    batch operator), which is how the equivalence test pins it."""
    scored = (
        docs.where(F.col("text").isNotNull())
        .withColumn("fp", F.md5(oracle_norm(F.col("text"))))
        .withColumn("detected_lang", lang_id(F.col("text")))
        .withColumn("quality", F.round(quality_score(F.col("text")), 6))
        .withColumn("n_tokens", bpe_ish_token_count(F.col("text")))
    )
    kept = scored.where(F.col("quality") >= min_quality)
    return kept.dropDuplicates(["fp"])


def run_incremental_curation(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    min_quality: float = 0.5,
):
    """Land-dir -> curated parquet table, exactly once per fingerprint.

    foreachBatch writes each epoch under out_dir/epoch=N: a replayed
    batch after failure rewrites ITS OWN directory (overwrite), so the
    curated table never double-counts — idempotence at the unit Spark
    actually replays. Returns the started StreamingQuery."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"epoch={epoch_id}")
            )
        )

    stream = curate(docs_file_stream(spark, source_dir), min_quality)
    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def route_by_quality(docs: DataFrame) -> DataFrame:
    """Gopher-rule router: every doc gets a destination —
    ``accept`` (passes all rules), ``review`` (fails exactly one:
    borderline, a human or a second model looks), ``reject`` (fails
    two or more). The dead-letter pattern for curation: nothing is
    silently dropped, every row is accounted for in exactly one
    destination, and the per-rule failure flags ride along so the
    review queue knows WHY. Works identically on batch frames (the
    s15 registry analog pins it against the oracle). Line-shape rules
    are omitted like llm10 (single-line corpus: constant columns)."""
    from geosparql_etl_spark.functions.textstats import gopher_metrics

    m = gopher_metrics(F.col("text"))
    fails = (
        (~m["n_words"].between(50, 100_000)).cast("int")
        + (~m["mean_word_len"].between(3.0, 10.0)).cast("int")
        + (m["symbol_ratio"] > 0.1).cast("int")
        + (m["alpha_frac"] < 0.8).cast("int")
        + (m["stop_hits"] < 2).cast("int")
    )
    return docs.withColumn("n_failed", fails).withColumn(
        "destination",
        F.when(F.col("n_failed") == 0, "accept")
        .when(F.col("n_failed") == 1, "review")
        .otherwise("reject"),
    )


def run_quality_router(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Land-dir -> three destination tables, exactly once per epoch.

    foreachBatch splits each micro-batch by destination and writes
    out_dir/<destination>/epoch=N — one streaming pass, three sinks,
    and a replayed epoch overwrites its own directories in all three
    destinations (idempotence at the replay unit, like
    run_incremental_curation). Returns the started StreamingQuery."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        routed = route_by_quality(batch_df).persist()
        try:
            for dest in ("accept", "review", "reject"):
                (
                    routed.where(F.col("destination") == dest)
                    .drop("destination")
                    .write.mode("overwrite")
                    .parquet(os.path.join(out_dir, dest, f"epoch={epoch_id}"))
                )
        finally:
            routed.unpersist()

    stream = docs_file_stream(spark, source_dir).where(
        F.col("text").isNotNull()
    )
    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
