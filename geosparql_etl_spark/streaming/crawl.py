"""Streaming web-crawl ingest: a GROWING directory of WARC archives →
parsed records → curated corpus, exactly once per archive file.

The batch WARC source (sources/warc.py) answers "query this crawl
dump"; this module answers the pipeline question — archives LAND
continuously (a fetcher drops one .warc per crawl shard) and each must
be parsed, quality-gated, deduplicated against everything already
ingested, and appended to the curated table exactly once.

Design (the 100 TB shape):
  - discovery/exactly-once rides Spark's FILE SOURCE (`readStream
    .format("binaryFile")`): the checkpoint tracks which archives have
    been consumed, so a restarted stream never re-ingests a file —
    engine-managed, no bespoke offset bookkeeping. One archive = one
    unsplittable unit, the same granularity as the batch reader's
    one-InputPartition-per-file.
  - record framing parses in Arrow-vectorized `mapInPandas` batches
    sharing `sources.warc.parse_warc_records` with the batch reader —
    one parser, two execution surfaces, byte-identical rows (pinned by
    the stream==batch parity test).
  - curation reuses `streaming.corpus.curate` verbatim: per-row native
    expressions + streaming dropDuplicates on the text fingerprint
    (state-store backed — per-batch cost scales with the batch).
  - the sink is the epoch-tagged foreachBatch append
    (`run_incremental_curation`'s idempotence discipline): a replayed
    micro-batch overwrites its own epoch directory.

Payload-size note: binaryFile loads one ARCHIVE per row, so archive
size must fit an executor's row budget (Spark caps binaryFile rows at
2 GiB). Crawl fetchers already roll WARC files at ~1 GiB for exactly
this reason; a lake of bigger archives would re-shard upstream.
"""

from __future__ import annotations

import gzip
import io
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geosparql_etl_spark.sources.warc import WARC_SCHEMA, parse_warc_records
from geosparql_etl_spark.streaming.corpus import curate


def parse_warc_bytes(raw: DataFrame) -> DataFrame:
    """(path, content) rows — whole WARC archives as bytes — to one
    row per WARC record (``WARC_SCHEMA``), in Arrow-vectorized
    batches. Gzip archives decompress in-stream by extension. Works
    identically on batch and streaming frames (mapInPandas is
    stateless per record batch)."""
    import pandas as pd

    cols = [
        "warc_type", "record_id", "target_uri", "warc_date",
        "content_type", "content_encoding", "content_length", "payload",
        "path", "record_offset",
    ]

    def gen(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content)
                if path.endswith(".gz"):
                    blob = gzip.decompress(blob)
                fh = io.BytesIO(blob)
                for headers, payload, pos in parse_warc_records(fh, path):
                    rows.append(
                        (
                            headers.get("warc-type"),
                            headers.get("warc-record-id"),
                            headers.get("warc-target-uri"),
                            headers.get("warc-date"),
                            headers.get("content-type"),
                            headers.get("content-encoding"),
                            len(payload),
                            payload,
                            path,
                            pos,
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return raw.select("path", "content").mapInPandas(gen, WARC_SCHEMA)


def warc_file_stream(spark: SparkSession, crawl_dir: str) -> DataFrame:
    """Stream of parsed WARC records from a growing crawl directory.
    ``pathGlobFilter`` admits .warc and .warc.gz; each new archive is
    consumed exactly once (file-source checkpointing)."""
    raw = (
        spark.readStream.format("binaryFile")
        # binaryFile's schema is FIXED by the format; streaming sources
        # still demand it spelled out (no inference pass on a stream)
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.warc*")
        .option("maxFilesPerTrigger", 4)
        .load(crawl_dir)
    )
    return parse_warc_bytes(raw)


def records_to_docs(records: DataFrame) -> DataFrame:
    """WARC response records -> the documents shape `curate` consumes:
    text decoded from the payload, source recovered from the target
    URI (the warc01 convention: http://crawl.example/<source>/<id>)."""
    return records.where(F.col("warc_type") == "response").select(
        F.regexp_extract(F.col("record_id"), r"(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.decode(F.col("payload"), "UTF-8").alias("text"),
        F.regexp_extract(
            F.col("content_type"), r"lang=([A-Za-z-]+)", 1
        ).alias("lang"),
        F.regexp_extract(
            F.col("target_uri"), r"^http://crawl\.example/([^/]+)/", 1
        ).alias("source"),
    )


def run_crawl_ingest(
    spark: SparkSession,
    crawl_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    min_quality: float = 0.5,
):
    """Crawl directory -> curated parquet table, exactly once per
    archive AND per fingerprint. Returns the started StreamingQuery
    (availableNow: drains everything currently landed, then stops —
    the batch-operable form of a continuous ingest)."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={epoch_id}")
        )

    stream = curate(
        records_to_docs(warc_file_stream(spark, crawl_dir)), min_quality
    )
    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
