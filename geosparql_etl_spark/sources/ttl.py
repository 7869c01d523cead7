"""S8/S9: TTL(.gz) document reads and JSON sidecar loads.

Gzip text decompresses transparently in Spark's text source; wholetext
gives document-at-a-time rows for the rewrite pipelines
(sha256-hash/update_hashes.py:116-117, update_ttl_gz_from_json.py:56-57).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geosparql_etl_spark.schemas import SLIDE_HASHES


def read_ttl_documents(spark: SparkSession, path: str) -> DataFrame:
    """One row per TTL document: (path, text). Handles .ttl and .ttl.gz.

    NOTE: must be the ``text(..., wholetext=True)`` keyword form —
    PySpark's ``DataFrameReader.text`` passes its own ``wholetext``
    parameter (default False) to the source, silently overriding a
    previously set ``.option("wholetext", ...)``; the option form
    returns LINES while claiming documents."""
    return spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("path"),
        F.col("value").alias("text"),
    )


def read_ttl_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented TTL read (for line filters like P12)."""
    return spark.read.text(path).select(
        F.input_file_name().alias("path"), F.col("value").alias("line")
    )


def read_slide_hashes(spark: SparkSession, path: str) -> DataFrame:
    """slide_hashes.json sidecar -> broadcastable (slide, hash) table
    (sha256-hash/update_ttl_gz_from_json.py:25-40)."""
    return spark.read.schema(SLIDE_HASHES).option("multiLine", "true").json(path)
