"""Document-store (MongoDB) source adapter.

The reference's flagship pipeline reads ``db.analysis`` / ``db.mark``
live (mongo-etl/utils/mongo_client.py:1-80 connection management;
mongodb_to_rdf.py:687-695 analysis listing with projection
{_id, analysis.execution_id, image.imageid}; :500-515 per-analysis mark
cursor with query {provenance.analysis.execution_id, provenance.image.
imageid[, provenance.image.slide]} riding the indexes from
build_indexes.sh:21-34). This module is the engine's equivalent: build
the analysis/mark DataFrames from a live deployment when configured,
else from parquet/JSON stand-ins with the same document schemas.

Connector path (``cfg.uri`` set) — uses the public MongoDB Spark
Connector v10 (``spark.read.format("mongodb")``), which must be on the
cluster's classpath (``--packages org.mongodb.spark:mongo-spark-
connector_2.13``). Pushdown mapping vs the reference:

  - projection: Spark column pruning reaches the connector, which sends
    a $project — the moral equivalent of the reference's explicit
    projection doc (mongodb_to_rdf.py:693-695). Select only what the
    pipeline reads and only those fields cross the wire.
  - filters: Catalyst predicates on top-level and dotted fields become
    $match stages; the reference's per-analysis mark query
    (mongodb_to_rdf.py:503-509) is instead ONE equi-join in the engine
    (pipelines/mongo_etl.py J1) — the cluster-parallel shape. The same
    compound-index coverage (build_indexes.sh) still serves the
    connector's initial collection scan.
  - partitioning: the connector's SamplePartitioner splits each
    collection into ~``partition_size_mb`` chunks so executors read in
    parallel — the scale analog of the reference's 24-worker fan-out
    over analyses (mongodb_to_rdf.py:660-662). One MongoClient is
    cached per executor by the connector's DefaultMongoClientFactory
    (the per-task connection the reference manages by hand in
    utils/mongo_client.py).

The connector path cannot run in this sandbox (no Mongo deployment, no
connector jar) and is exercised only by its option-construction unit
test; the fallback path is the contract-tested one.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from geosparql_etl_spark.config import MongoSourceConfig
from geosparql_etl_spark.schemas import ANALYSIS_DOC, MARK_DOC


def connector_options(cfg: MongoSourceConfig, collection: str) -> dict[str, str]:
    """Option map for ``spark.read.format("mongodb")`` — split out so
    the sandbox can unit-test option construction without a deployment."""
    return {
        "connection.uri": cfg.uri or "",
        "database": cfg.db_name,
        "collection": collection,
        "partitioner": (
            "com.mongodb.spark.sql.connector.read.partitioner.SamplePartitioner"
        ),
        "partitioner.options.partition.size": f"{cfg.partition_size_mb}MB",
    }


def _read_live(spark: SparkSession, cfg: MongoSourceConfig, collection: str, schema):
    reader = spark.read.format("mongodb").schema(schema)
    for k, v in connector_options(cfg, collection).items():
        reader = reader.option(k, v)
    return reader.load()


def _read_fallback(
    spark: SparkSession, cfg: MongoSourceConfig, collection: str, schema
) -> DataFrame:
    """Parquet/JSON stand-ins: <fallback_dir>/<collection>.parquet (dir
    or file) or .json(l). Explicit schema — no inference — so the frame
    is identical in shape to the connector path."""
    if not cfg.fallback_dir:
        raise ValueError(
            "MongoSourceConfig: neither uri (live) nor fallback_dir "
            "(parquet/JSON stand-ins) is set"
        )
    pq = os.path.join(cfg.fallback_dir, f"{collection}.parquet")
    js = os.path.join(cfg.fallback_dir, f"{collection}.json")
    if os.path.exists(pq):
        return spark.read.schema(schema).parquet(pq)
    if os.path.exists(js):
        return spark.read.schema(schema).json(js)
    raise FileNotFoundError(
        f"no stand-in for collection {collection!r} under {cfg.fallback_dir}"
    )


def read_collection(
    spark: SparkSession, cfg: MongoSourceConfig, collection: str, schema
) -> DataFrame:
    """One collection as a DataFrame: live when ``cfg.uri`` is set,
    stand-ins otherwise. Same schema either way, so every downstream
    operator is path-agnostic."""
    if cfg.uri:
        return _read_live(spark, cfg, collection, schema)
    return _read_fallback(spark, cfg, collection, schema)


def read_analyses(spark: SparkSession, cfg: MongoSourceConfig) -> DataFrame:
    """``db.analysis`` with the pipeline's schema (ANALYSIS_DOC). Column
    pruning downstream becomes the connector's $project — matching the
    reference's projection at mongodb_to_rdf.py:693-695."""
    return read_collection(spark, cfg, cfg.analysis_collection, ANALYSIS_DOC)


def read_marks(spark: SparkSession, cfg: MongoSourceConfig) -> DataFrame:
    """``db.mark`` (MARK_DOC schema). The reference issues one indexed
    find() per analysis (mongodb_to_rdf.py:503-515); the engine reads
    the collection once and lets the J1 equi-join distribute it."""
    return read_collection(spark, cfg, cfg.mark_collection, MARK_DOC)
